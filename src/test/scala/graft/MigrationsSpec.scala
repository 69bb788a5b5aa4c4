package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.index.Migrations
import graft.index.Migrations.{Migration, Result}

/** Versioned migration chain semantics (reference `migrations/runner.py`,
  * `registry.py`): semver ordering, skip-already-run, skip-older-than-
  * last, failure halts the chain, parquet registry persistence, and the
  * real subproject-columns migration over a legacy chunks table.
  */
class MigrationsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_mig").toString

  private class Probe(val id: String, val version: String,
      needed: Boolean = true, fail: Boolean = false) extends Migration {
    val name = s"probe $id"
    var applied = 0
    def checkNeeded(s: SparkSession, p: String): Boolean = needed
    def apply(s: SparkSession, p: String): String = {
      applied += 1
      if (fail) throw new RuntimeException(s"boom $id")
      s"ok $id"
    }
  }

  test("semver orders numerically: 0.10.0 after 0.9.1") {
    assert(Migrations.versionKey("0.10.0") == Seq(0, 10, 0))
    val dir = tmp()
    val a = new Probe("m9", "0.9.1")
    val b = new Probe("m10", "0.10.0")
    val ran = Migrations.run(spark, dir, Seq(b, a))
    assert(ran.map(_.migration_id) == Seq("m9", "m10"))
    assert(ran.forall(_.status == "success"))
  }

  test("already-run and older-than-last migrations are skipped") {
    val dir = tmp()
    val v1 = new Probe("v1", "0.1.0")
    assert(Migrations.run(spark, dir, Seq(v1)).map(_.status) == Seq("success"))
    // re-register the same migration plus an OLDER one: both skipped
    val v05 = new Probe("v05", "0.0.5")
    assert(Migrations.pending(spark, dir, Seq(v1, v05)).isEmpty)
    assert(v1.applied == 1)
    // a newer one still runs
    val v2 = new Probe("v2", "0.2.0")
    assert(Migrations.run(spark, dir, Seq(v1, v05, v2))
      .map(_.migration_id) == Seq("v2"))
  }

  test("checkNeeded=false drops a migration from the pending set") {
    val dir = tmp()
    val skip = new Probe("s", "0.1.0", needed = false)
    assert(Migrations.run(spark, dir, Seq(skip)).isEmpty)
    assert(skip.applied == 0)
  }

  test("a failure records FAILED and halts the chain; retry resumes") {
    val dir = tmp()
    val ok = new Probe("ok", "0.1.0")
    val bad = new Probe("bad", "0.2.0", fail = true)
    val after = new Probe("after", "0.3.0")
    val ran = Migrations.run(spark, dir, Seq(after, bad, ok))
    assert(ran.map(r => (r.migration_id, r.status)) ==
      Seq(("ok", "success"), ("bad", "failed")))
    assert(after.applied == 0)
    // failed migration is NOT marked run; a fixed version retries it.
    // last successful version is 0.1.0, so 0.2.0+ are still eligible.
    val fixed = new Probe("bad", "0.2.0")
    val retry = Migrations.run(spark, dir, Seq(after, fixed, ok))
    assert(retry.map(r => (r.migration_id, r.status)) ==
      Seq(("bad", "success"), ("after", "success")))
    // registry keeps full history in execution order
    val hist = Migrations.executed(spark, dir)
    assert(hist.map(_.status) == Seq("success", "failed", "success", "success"))
  }

  test("AddSubprojectColumns evolves a legacy chunks table idempotently") {
    val dir = tmp()
    Seq(("c1", "src/a.py"), ("c2", "apps/web/b.py"))
      .toDF("chunk_id", "file_path")
      .write.parquet(s"$dir/chunks")
    val m = new Migrations.AddSubprojectColumns()
    assert(m.checkNeeded(spark, dir))
    val ran = Migrations.run(spark, dir, Seq(m))
    assert(ran.map(_.status) == Seq("success"))
    val evolved = spark.read.parquet(s"$dir/chunks")
    assert(evolved.columns.toSet ==
      Set("chunk_id", "file_path", "subproject_name", "subproject_path"))
    assert(evolved.count() == 2)
    assert(evolved.filter("subproject_name IS NOT NULL").count() == 0)
    // idempotent: second pass has nothing to do
    assert(!m.checkNeeded(spark, dir))
    assert(Migrations.pending(spark, dir, Seq(m)).isEmpty)
  }
}
