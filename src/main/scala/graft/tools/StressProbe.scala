package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for stress families (not part of the driver
  * contract; SPARK_GRAFT_PROBE selects a family).
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val n = args.headOption.map(_.toLong).getOrElse(150000L)
    val docs = graft.Stress.synthDocs(spark, n)
    t("materialize docs")(docs.count())
    val sh = graft.dedup.Dedup.docShingles(docs, "text", "doc_id", 3).cache()
    t("shingles+cache")(sh.count())
    val sigs = graft.dedup.Dedup.minhashSignatures(sh, 64)
    t("signatures")(sigs.count())
    val bands = graft.dedup.Dedup.lshBands(sigs, 8)
    t("bands")(bands.count())
    val bc = bands.cache(); t("bands cache")(bc.count())
    val hist = bc.groupBy("band", "band_val").count()
      .groupBy("count").agg(count(lit(1)).as("n_buckets"))
      .orderBy(col("count").desc).limit(10).collect()
    println("[probe] bucket-size histogram (top): " + hist.mkString(" "))
    val cands = graft.dedup.Dedup.lshCandidates(bc)
    t("candidates")(println("[probe] n_cands=" + cands.count()))
    val jac = graft.dedup.Dedup.jaccardOfPairs(cands, sh)
    t("jaccard verify")(jac.count())
    spark.stop()
  }
}
