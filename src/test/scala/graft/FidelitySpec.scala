package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analyze.Analytics
import graft.chunk.Chunker
import graft.core.FileRecord
import graft.graph.Kg
import graft.ingest.GitLog
import graft.search.SearchEngine

/** Late-fidelity items: frontmatter tags + HAS_TAG AND-filter, moved
  * events, contributor stats, function extraction.
  */
class FidelitySpec extends SparkSpec {
  import spark.implicits._

  private def md(path: String, content: String) =
    FileRecord(path, "markdown", Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)

  test("frontmatter block becomes a chunk; tags become HAS_TAG edges") {
    val doc = md("/docs/a.md",
      "---\ntitle: Guide\ntags: [spark, search]\n---\n# Top\n\nbody\n")
    val doc2 = md("/docs/b.md",
      "---\ntags: [spark]\n---\n# Other\n\nbody\n")
    val chunks = Seq(doc, doc2).flatMap(Chunker.chunkFile).toDF()
    assert(chunks.filter(col("name") === "<frontmatter>").count() == 2)
    val kg = Kg.fromChunks(chunks)
    val tags = kg.vertices.filter(col("label") === "tag")
      .select("name").as[String].collect().toSet
    assert(tags == Set("spark", "search"))
    // AND filter: both tags → only a.md; single tag → both
    val both = Kg.tagFilterAnd(kg.edges, Seq("spark", "search"))
      .as[String].collect().toSet
    assert(both == Set("/docs/a.md"))
    val one = Kg.tagFilterAnd(kg.edges, Seq("spark")).as[String].collect().toSet
    assert(one == Set("/docs/a.md", "/docs/b.md"))
  }

  test("moved event rewrites paths without re-embedding") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-move")
    val repo = dir.resolve("repo"); Files.createDirectories(repo)
    Files.writeString(repo.resolve("x.py"), "def xf():\n    return 1\n")
    val chunksPath = dir.resolve("chunks").toString
    val vectorsPath = dir.resolve("vectors").toString
    new SearchEngine(spark).indexRepo(repo.toString, chunksPath, vectorsPath)
    val idBefore = spark.read.parquet(chunksPath)
      .select("chunk_id").as[String].head()

    Files.move(repo.resolve("x.py"), repo.resolve("y.py"))
    val batch = Seq(graft.streaming.WatchStream.FileEvent(
      repo.resolve("x.py").toString, "moved", new Timestamp(1L),
      repo.resolve("y.py").toString)).toDF()
    graft.streaming.WatchStream.applyBatch(spark, batch, chunksPath, vectorsPath)

    val after = spark.read.parquet(chunksPath).collect()
    assert(after.length == 1)
    assert(after.head.getAs[String]("file_path").endsWith("y.py"))
    assert(after.head.getAs[String]("chunk_id") == idBefore) // not re-embedded
  }

  test("contributor stats aggregate per author") {
    val commits = Seq(
      GitLog.Commit("a", "alice", new Timestamp(1000L), 2, 10L, 1L),
      GitLog.Commit("b", "alice", new Timestamp(2000L), 1, 5L, 0L),
      GitLog.Commit("c", "bob", new Timestamp(1500L), 3, 7L, 7L)).toDF()
    val stats = Analytics.contributorStats(commits).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("alice" -> 2L, "bob" -> 1L))
  }

  test("function extraction pulls one def block") {
    val engine = new SearchEngine(spark)
    val src = "import os\n\ndef alpha():\n    a = 1\n    return a\n\ndef beta():\n    return 2\n"
    val f = engine.extractFunction(src, "alpha")
    assert(f.isDefined)
    assert(f.get.contains("return a") && !f.get.contains("beta"))
    assert(engine.extractFunction(src, "nope").isEmpty)
  }

  // J11 DOCUMENTS scoring (kg_builder.py:2663-2744 semantics)
  test("documents edges: README-for-directory + title/mention scoring") {
    import graft.graph.DocLinks
    val sections = Seq(
      // README in same dir as parse_tree's file: 0.3 + title 0.4 → ≥ 0.5
      ("s1", "the parse_tree helper", "parse_tree builds the tree", "src/core/README.md"),
      // plain doc, two mentions + title: 0.4 + 0.2 = 0.6
      ("s2", "about parse_tree", "parse_tree here and parse_tree there", "docs/guide.md"),
      // one mention only, no title/readme: 0.1 → below threshold
      ("s3", "unrelated title", "parse_tree once", "docs/other.md"))
      .toDF("section_id", "name", "content", "file_path")
    val entities = Seq(
      ("e1", "parse_tree", "function", "src/core/tree.py"),
      ("e2", "data", "function", "src/core/data.py"), // generic → filtered
      ("e3", "_hidden", "function", "src/core/h.py")) // underscore → filtered
      .toDF("entity_id", "name", "entity_type", "file_path")
    val edges = DocLinks.documentsEdges(sections, entities).collect()
    assert(edges.forall(_.getString(1) == "e1"))
    val bysec = edges.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(bysec.keySet == Set("s1", "s2"))
    assert(bysec("s1") >= 0.7) // title 0.4 + mention 0.1 + readme 0.3 (>= keyword-agnostic floor)
    assert(bysec("s2") >= 0.6)
  }

  test("documents edges: README in parent directory of code still counts") {
    import graft.graph.DocLinks
    import org.apache.spark.sql.functions.{col, lit}
    val hit = DocLinks.isReadmeFor(lit("src/README.md"), lit("src/core/tree.py"))
    val same = DocLinks.isReadmeFor(lit("src/core/README.md"), lit("src/core/tree.py"))
    val miss = DocLinks.isReadmeFor(lit("docs/README.md"), lit("src/core/tree.py"))
    val notReadme = DocLinks.isReadmeFor(lit("src/core/guide.md"), lit("src/core/tree.py"))
    val row = spark.range(1).select(hit.as("h"), same.as("s"), miss.as("m"), notReadme.as("n")).head()
    assert(row.getBoolean(0) && row.getBoolean(1) && !row.getBoolean(2) && !row.getBoolean(3))
  }

  test("every LANGUAGE_MAPPINGS extension of the reference is indexable") {
    // config/defaults.py:114-210, keyed without the dot (.R folds into
    // .r — discovery lowercases); language NAMES may differ where the
    // chunker dispatches on this engine's spelling (csharp, shell)
    val referenceExts = Seq(
      "py", "pyw", "pyi", "js", "jsx", "mjs", "cjs", "ts", "tsx", "mts",
      "cts", "html", "htm", "css", "scss", "sass", "less", "json", "yaml",
      "yml", "toml", "xml", "md", "markdown", "rst", "txt", "sh", "bash",
      "zsh", "fish", "java", "kt", "scala", "groovy", "c", "cpp", "cc",
      "cxx", "h", "hpp", "hxx", "cs", "go", "rs", "rb", "rake", "gemspec",
      "php", "phtml", "swift", "dart", "arb", "r", "sql", "lua", "pl",
      "pm", "ex", "exs", "clj", "cljs", "cljc", "hs", "ml", "mli", "vim",
      "el")
    val missing = referenceExts.filterNot(
      graft.ingest.FileDiscovery.LanguageByExtension.contains)
    assert(missing.isEmpty, s"unmapped reference extensions: $missing")
    // spot-check family assignments
    val m = graft.ingest.FileDiscovery.LanguageByExtension
    assert(m("pyi") == "python" && m("cjs") == "javascript" &&
      m("mts") == "typescript" && m("cc") == "cpp" && m("zsh") == "shell" &&
      m("arb") == "json" && m("cljc") == "clojure" && m("mli") == "ocaml")
  }
}
