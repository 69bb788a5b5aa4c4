package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.chunk.Chunker
import graft.core.FileRecord
import graft.graph.Kg

/** Extended KG schema fidelity — the reference's node/rel tables beyond
  * the code graph (`core/knowledge_graph.py:354-888`): Document/
  * DocSection/Topic with CONTAINS_SECTION/FOLLOWS/LINKS_TO/REFERENCES/
  * HAS_TOPIC, ProgrammingLanguage/ProgrammingFramework with WRITTEN_IN/
  * USES_FRAMEWORK/FRAMEWORK_FOR, and the git graph rooted in
  * Branch/Repository (AUTHORED/MODIFIES/MODIFIED/COMMITTED_TO/
  * BELONGS_TO).
  */
class KgSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def rec(path: String, lang: String, content: String) =
    FileRecord(path, lang, Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)

  private val readme =
    """# Overview
      |The indexer uses `build_index()` to create the partition schema.
      |See [the guide](docs/guide.md) for details.
      |
      |## Setup
      |Install dependencies and run the cluster bootstrap.
      |
      |## Usage
      |Call `search()` with a query string.
      |""".stripMargin

  private val pyCode =
    """import numpy
      |import flask
      |
      |def build_index():
      |    return 1
      |
      |def search():
      |    return 2
      |""".stripMargin

  private def chunksDf() = {
    val md = Chunker.chunkFile(rec("docs/README.md", "markdown", readme))
    val py = Chunker.chunkFile(rec("src/app.py", "python", pyCode))
    (md ++ py).toDF()
  }

  test("docGraph: sections, FOLLOWS order, links, code refs, topics") {
    val chunks = chunksDf()
    val code = Kg.fromChunks(chunks)
    val kg = Kg.docGraph(chunks, code.vertices)

    val labels = kg.vertices.select("label").distinct().as[String].collect().toSet
    assert(Set("document", "doc_section", "topic").subsetOf(labels))

    val byType = kg.edges.groupBy("rel_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("CONTAINS_SECTION") == 3)
    // three sections in one doc → two FOLLOWS edges
    assert(byType("FOLLOWS") == 2)
    assert(byType("LINKS_TO") == 1)
    assert(byType.getOrElse("HAS_TOPIC", 0L) > 0)
    // `build_index()` and `search()` resolve to the python entities;
    // the h1 section spans the whole doc so it carries both refs
    assert(byType("REFERENCES") == 3)
    val refDsts = kg.edges.filter(col("rel_type") === "REFERENCES")
      .select("dst").as[String].collect().toSet
    assert(refDsts == Set("src/app.py::build_index", "src/app.py::search"))

    val link = kg.edges.filter(col("rel_type") === "LINKS_TO")
      .select("dst").as[String].collect().head
    assert(link == "doc:docs/guide.md")
  }

  test("langGraph: WRITTEN_IN, framework detection from imports") {
    val kg = Kg.langGraph(chunksDf())
    val labels = kg.vertices.select("label").distinct().as[String].collect().toSet
    assert(Set("language", "framework").subsetOf(labels))

    val written = kg.edges.filter(col("rel_type") === "WRITTEN_IN")
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(written.contains(("src/app.py", "lang:python")))
    assert(written.contains(("docs/README.md", "lang:markdown")))

    val fw = kg.edges.filter(col("rel_type") === "USES_FRAMEWORK")
      .select("dst").as[String].collect().toSet
    assert(fw == Set("framework:numpy", "framework:flask"))
    val fwFor = kg.edges.filter(col("rel_type") === "FRAMEWORK_FOR")
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(fwFor == Set(
      ("framework:numpy", "lang:python"), ("framework:flask", "lang:python")))
  }

  test("authorshipGraph with repo/branch: full git schema") {
    val changes = Seq(
      ("c1", "alice", "src/a.py", Timestamp.valueOf("2024-01-01 10:00:00")),
      ("c1", "alice", "src/b.py", Timestamp.valueOf("2024-01-01 10:00:00")),
      ("c2", "bob", "src/a.py", Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("commit_hash", "author", "file_path", "ts")
    val kg = Kg.authorshipGraph(changes, "graft", "main")

    val labels = kg.vertices.select("label").distinct().as[String].collect().toSet
    assert(labels == Set("person", "commit", "file", "branch", "repository"))

    val byType = kg.edges.groupBy("rel_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType("AUTHORED") == 2)
    assert(byType("MODIFIES") == 3) // (c1,a) (c1,b) (c2,a)
    assert(byType("MODIFIED") == 3) // (alice,a) (alice,b) (bob,a)
    assert(byType("COMMITTED_TO") == 2)
    assert(byType("BELONGS_TO") == 1)

    val belongs = kg.edges.filter(col("rel_type") === "BELONGS_TO")
      .select("src", "dst").as[(String, String)].collect().head
    assert(belongs == (("branch:graft/main", "repo:graft")))
  }
}
