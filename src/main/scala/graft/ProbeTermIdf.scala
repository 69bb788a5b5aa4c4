package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe (r12, committed as evidence): the VERDICT r11 #4
  * "single-pass" termIdf restructure — df HISTOGRAM for the epsilon
  * floor + broadcast (df → idf) map behind an explicit
  * repartition-on-term materialization point — A/B'd against the
  * shipped two-pass shape on the x100 stress fixture, interleaved in
  * one JVM so host drift cancels. MEASURED OUTCOME (this sandbox,
  * local[32], 500k docs / 5.2M-term vocab): the histogram shape is
  * SLOWER (warm 7.0–11.2 s vs 5.3–5.8 s) with bit-identical sums,
  * because AQE does not reuse exchange stages nested inside
  * broadcast-stage subtrees (AQE-final plan: ReusedQueryStage=0,
  * 8 ShuffleQueryStages) — the "shared" dfreq pipeline re-derives once
  * per broadcast subtree, three full passes instead of two. Kept so the
  * negative result is reproducible: `runMain graft.ProbeTermIdf [nDocs]`.
  */
object ProbeTermIdf {
  /** The refuted single-pass candidate (see object Scaladoc). */
  def histTermIdf(postings: DataFrame, corpus: DataFrame): DataFrame = {
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartition(col("term"))
    val hist = dfreq.groupBy(col("df")).agg(count(lit(1)).as("n_terms"))
    val histRaw = hist.crossJoin(broadcast(corpus))
      .withColumn("idf_raw",
        log(col("n") - col("df") + 0.5) - log(col("df") + 0.5))
    val avg = histRaw.agg(
      (sum(col("idf_raw") * col("n_terms")) / sum(col("n_terms")))
        .as("avg_idf"))
    val dfToIdf = histRaw.crossJoin(broadcast(avg))
      .withColumn("idf",
        when(col("idf_raw") < 0, lit(graft.search.Bm25.Epsilon) * col("avg_idf"))
          .otherwise(col("idf_raw")))
      .select(col("df"), col("idf"))
    dfreq.join(broadcast(dfToIdf), Seq("df"))
      .select(col("term"), col("idf"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("probe-termidf")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val post = graft.search.Bm25.postings(
      Stress.synthDocs(spark, n), "doc_id", split(col("text"), " ")).cache()
    post.count()
    val corpus = graft.search.Bm25.corpusStats(graft.search.Bm25.docStats(post))
    def time(tag: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val c = df.agg(coalesce(sum(col("idf")), lit(0.0))).head().getDouble(0)
      println(f"[probe] $tag sum=$c%.4f sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    time("warm_shipped")(graft.search.Bm25.termIdf(post, corpus))
    time("warm_hist")(histTermIdf(post, corpus))
    (1 to 3).foreach { i =>
      time(s"shipped_$i")(graft.search.Bm25.termIdf(post, corpus))
      time(s"hist_$i")(histTermIdf(post, corpus))
    }
    // does the AQE-final plan of the histogram shape reuse the dfreq
    // exchange? (it does not — that is the refutation)
    val q = histTermIdf(post, corpus)
    val qe = q.queryExecution
    qe.executedPlan.execute().count()
    val fin = qe.executedPlan.toString
    println("[probe] hist AQE-final plan: ReusedQueryStage=" +
      "ReusedQueryStage".r.findAllIn(fin).size +
      " ReusedExchange=" + "ReusedExchange".r.findAllIn(fin).size +
      " ShuffleQueryStage=" + "ShuffleQueryStage".r.findAllIn(fin).size)
    spark.stop()
  }
}
