package graft

import org.apache.spark.sql.SparkSession

/** Measurement tooling (optimization rounds): dump
  * `.explain("formatted")` for named gate queries to files, so plan
  * claims in OPTIMIZATION_r*.md are verifiable without running Spark.
  *
  * Usage: runMain graft.PlanDump <outDir> <queryName> [queryName...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  * Writes <outDir>/<queryName>.txt. AQE left ON (the bench runs with
  * AQE), so plans show the initial AdaptiveSparkPlan shape.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <query> [query...]")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(outDir.resolve(s"$name.txt"),
            plan.getBytes("UTF-8"))
          println(s"[plandump] wrote $name (${plan.length} chars)")
        case None =>
          System.err.println(s"[plandump] UNKNOWN QUERY: $name")
      }
    }
    spark.stop()
  }
}
