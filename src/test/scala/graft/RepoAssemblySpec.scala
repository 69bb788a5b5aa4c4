package graft

import org.apache.spark.sql.functions._

import graft.text.RepoAssembly

class RepoAssemblySpec extends SparkSpec {
  import spark.implicits._

  private val files = Seq(
    ("r1", "src/b.py", 2L, "bbb"),
    ("r1", "src/a.py", 1L, "aaa"),
    ("r2", "main.go", 3L, "go code"),
    ("r1", "src/c.py", 4L, ""))
    .toDF("repo", "path", "id", "body")

  test("files concatenate in (path, id) order with headers") {
    val out = RepoAssembly.concatRepos(files, "repo", "path", "id", "body")
      .collect().map(r => r.getAs[String]("repo") -> r).toMap
    assert(out("r1").getAs[Int]("n_files") == 3)
    assert(out("r1").getAs[String]("doc") ==
      "<file: src/a.py>\naaa\n\n<file: src/b.py>\nbbb\n\n<file: src/c.py>\n")
    assert(out("r2").getAs[String]("doc") == "<file: main.go>\ngo code")
    assert(out("r1").getAs[Int]("n_chars") ==
      out("r1").getAs[String]("doc").length)
  }

  test("order is content-addressed, not arrival-ordered") {
    val a = RepoAssembly
      .concatRepos(files, "repo", "path", "id", "body")
      .select("repo", "doc_sha").as[(String, String)].collect().toMap
    val b = RepoAssembly
      .concatRepos(files.orderBy(col("id").desc).repartition(7),
        "repo", "path", "id", "body")
      .select("repo", "doc_sha").as[(String, String)].collect().toMap
    assert(a == b)
  }
}
