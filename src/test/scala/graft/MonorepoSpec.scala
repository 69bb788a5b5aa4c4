package graft

import org.apache.spark.sql.functions._

import graft.ingest.Monorepo

/** Monorepo detection fidelity (`utils/monorepo.py`): marker-based root
  * discovery with exclusions and depth cap, package.json "name" field
  * naming, deepest-root file assignment, and the chunk-schema columns.
  */
class MonorepoSpec extends SparkSpec {
  import spark.implicits._

  test("package.json name field wins over the directory basename") {
    val files = Seq(
      ("apps/web/package.json", """{"name": "web-frontend", "version": "1.0"}"""),
      ("libs/core/pyproject.toml", "[project]\nname = \"core\""),
      ("apps/web/src/index.ts", "export {}")).toDF("file_path", "content")
    val sps = Monorepo.subprojects(files)
      .as[(String, String)].collect().toMap
    assert(sps == Map(
      "web-frontend" -> "apps/web",
      "core" -> "libs/core"))
  }

  test("root marker, excluded dirs, and too-deep markers are skipped") {
    val files = Seq(
      "package.json",                        // repo root — not a subproject
      "tests/fixture/package.json",          // excluded dir
      "node_modules/x/package.json",         // excluded dir
      "a/b/c/d/package.json",                // 5 parts — beyond depth cap
      "svc/auth/go.mod").toDF("file_path")
    val sps = Monorepo.subprojects(files).as[(String, String)].collect().toSet
    assert(sps == Set(("auth", "svc/auth")))
  }

  test("files get the deepest containing subproject; outsiders get null") {
    val roots = Seq(("web", "apps/web"), ("deep", "apps/web/deep"))
      .toDF("name", "path")
    val chunks = Seq(
      ("apps/web/src/a.ts", "c1"),
      ("apps/web/deep/b.ts", "c2"),
      ("other/c.ts", "c3")).toDF("file_path", "chunk_id")
    val out = Monorepo.withSubproject(chunks, roots)
      .select("chunk_id", "subproject_name", "subproject_path")
      .as[(String, String, String)].collect().toSet
    assert(out == Set(
      ("c1", "web", "apps/web"),
      ("c2", "deep", "apps/web/deep"),
      ("c3", null, null)))
  }

  test("rollup counts files and chunks per subproject") {
    val roots = Seq(("web", "apps/web")).toDF("name", "path")
    val chunks = Seq(
      ("apps/web/a.ts", "c1"), ("apps/web/a.ts", "c2"),
      ("apps/web/b.ts", "c3"), ("other/c.ts", "c4"))
      .toDF("file_path", "chunk_id")
    val out = Monorepo.rollup(Monorepo.withSubproject(chunks, roots))
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("web", "apps/web", 2L, 3L),
      ("(none)", "", 1L, 1L)))
  }
}
