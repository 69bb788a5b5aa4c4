package graft

import java.nio.file.Files

import graft.ingest.GitBlame

/** S11 git-blame: porcelain parsing (reference `core/git_blame.py`
  * format), chunk-range enrichment (most recent wins), live `git blame`
  * end-to-end, and the authorship/temporal KG builders.
  */
class GitBlameSpec extends SparkSpec {
  import spark.implicits._

  private val hashA = "a" * 40
  private val hashB = "b" * 40

  // two commits: hashA lines 1,3 (t=100), hashB line 2 (t=200); porcelain
  // emits author metadata only at a commit's first occurrence
  private val porcelain =
    s"""$hashA 1 1 2
       |author Alice
       |author-mail <alice@x>
       |author-time 100
       |summary first
       |filename f.py
       |\tline one
       |$hashB 2 2 1
       |author Bob
       |author-time 200
       |summary second
       |filename f.py
       |\tline two
       |$hashA 3 3
       |\tline three
       |""".stripMargin

  test("porcelain parse: every line resolves, repeat commits included") {
    val lines = GitBlame.parsePorcelain("f.py", porcelain)
    assert(lines.map(l => (l.line, l.author, l.author_time)).sorted ==
      Seq((1, "Alice", 100L), (2, "Bob", 200L), (3, "Alice", 100L)))
    assert(lines.forall(_.file_path == "f.py"))
    assert(lines.find(_.line == 2).get.commit_hash == hashB)
  }

  test("enrichChunks: most recent blame in range wins; no blame → nulls") {
    val blame = GitBlame.parsePorcelain("f.py", porcelain).toDS().toDF()
    val chunks = Seq(
      ("c1", "f.py", 1, 3),   // covers t=100 and t=200 → Bob
      ("c2", "f.py", 3, 3),   // only line 3 → Alice
      ("c3", "g.py", 1, 9)    // no blame rows
    ).toDF("chunk_id", "file_path", "start_line", "end_line")
    val out = GitBlame.enrichChunks(chunks, blame)
      .select("chunk_id", "last_author", "last_commit")
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    assert(out("c1") == ("Bob", hashB))
    assert(out("c2") == ("Alice", hashA))
    assert(out("c3") == (null, null))
  }

  test("live git blame end-to-end on a throwaway repo") {
    import scala.sys.process._
    val dir = Files.createTempDirectory("graft-blame").toFile
    def git(args: String*): Unit = {
      val env = Seq(
        "GIT_AUTHOR_NAME" -> "Alice", "GIT_AUTHOR_EMAIL" -> "a@x",
        "GIT_COMMITTER_NAME" -> "Alice", "GIT_COMMITTER_EMAIL" -> "a@x",
        "GIT_AUTHOR_DATE" -> "2024-01-01T00:00:00Z",
        "GIT_COMMITTER_DATE" -> "2024-01-01T00:00:00Z")
      assert(Process(Seq("git") ++ args, dir, env: _*).! == 0)
    }
    git("init", "-q")
    Files.writeString(dir.toPath.resolve("a.txt"), "one\ntwo\nthree\n")
    git("add", "a.txt")
    git("commit", "-q", "-m", "init")
    val blame = GitBlame.blameFiles(spark, dir.toString, Seq("a.txt"))
    val rows = blame.collect()
    assert(rows.length == 3)
    assert(rows.forall(_.author == "Alice"))
    assert(rows.map(_.line).sorted.toSeq == Seq(1, 2, 3))
    assert(rows.forall(_.author_time == 1704067200L))
  }

  test("authorship graph: vertices and typed edges") {
    val changes = Seq(
      ("c1", "alice", "a.py", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("c1", "alice", "b.py", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      ("c2", "bob", "a.py", java.sql.Timestamp.valueOf("2024-01-02 10:00:00")))
      .toDF("commit_hash", "author", "file_path", "ts")
    val kg = graft.graph.Kg.authorshipGraph(changes)
    val labels = kg.vertices.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels == Map("person" -> 2, "commit" -> 2, "file" -> 2))
    val rels = kg.edges.groupBy("rel_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rels == Map("AUTHORED" -> 2, "MODIFIES" -> 3, "MODIFIED" -> 3))
  }

  test("temporal co-change: window + seed-author 2-hop") {
    import org.apache.spark.sql.functions.lit
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val changes = Seq(
      ("c1", "alice", "seed.py", ts("2024-01-10 00:00:00")),
      ("c2", "alice", "x.py", ts("2024-01-11 00:00:00")),
      ("c3", "alice", "x.py", ts("2024-02-09 00:00:00")), // outside window
      ("c4", "bob", "y.py", ts("2024-01-12 00:00:00"))    // not a seed author
    ).toDF("commit_hash", "author", "file_path", "ts")
    val out = graft.graph.Kg.coChangedFiles(changes, "seed.py",
        lit("2024-01-01 00:00:00").cast("timestamp"),
        lit("2024-02-01 00:00:00").cast("timestamp"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "alice" && out.head.getString(1) == "x.py")
    assert(out.head.getLong(2) == 1L)
  }
}
