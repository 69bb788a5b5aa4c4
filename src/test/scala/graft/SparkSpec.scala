package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per JVM, REBUILT if a prior suite's context died.
  *
  * r11 post-mortem (VERDICT r11 #2): a host-starvation heartbeat kill
  * stopped the shared SparkContext mid-suite, and because every suite
  * held a suite-lazy reference to the dead session, one environmental
  * event cascaded into failures in every subsequent suite in the JVM
  * (`GraftFunctions.ensure` → `SparkSession.active` → "No active or
  * default Spark session"). `spark` is therefore a def that re-checks
  * liveness on every access, and the heartbeat/network timeouts are
  * raised well past the 10 s defaults — the sandbox host shows 6-20 %
  * hypervisor-steal bursts lasting minutes, and a missed heartbeat in
  * local mode kills the only executor there is.
  *
  * `spark` stays a suite-lazy val (a stable identifier — every spec
  * does `import spark.implicits._`, which a def cannot support), so a
  * context killed MID-suite still fails that suite's remaining tests;
  * but every suite initialized after the kill gets a fresh session from
  * the liveness-checked factory instead of the r11 cascade.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** The fixture is read from the source tree, not the classpath copy —
    * the copy lives under target/, which discovery rightly ignores.
    */
  def sampleRepo: String =
    new java.io.File("src/test/resources/sample_repo").getAbsolutePath
}

object SparkSpec {
  @volatile private var cached: SparkSession = _

  def session: SparkSession = synchronized {
    if (cached == null || cached.sparkContext.isStopped) {
      // a stopped context leaves cleared/stale active+default references
      // behind; clear them so getOrCreate builds fresh instead of
      // resurrecting a zombie
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      cached = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executor.heartbeatInterval", "60s")
        .config("spark.network.timeout", "600s")
        .getOrCreate()
    }
    cached
  }
}
