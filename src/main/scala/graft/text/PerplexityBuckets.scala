package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style perplexity partition (Wenzek et al. 2020, "CCNet:
  * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
  * rank every document by language-model perplexity and split the
  * corpus into head / middle / tail thirds — the standard quality
  * stratification applied before sampling web data into a training mix
  * (head = fluent text, tail = boilerplate/noise candidates).
  *
  * Determinism: the per-doc score is the INTEGER micro-nat sum from
  * [[UnigramLm]] (engine-exact), scaled per token with integer
  * division on the positivized value (Spark `div` truncates toward
  * zero, DuckDB `//` floors — they agree only for non-negative
  * operands, so the negative log-prob is negated first). Thresholds
  * are exact percentiles (Catalyst `percentile` ≡ DuckDB
  * `quantile_cont`, R-7 interpolation — the pf1-proven parity), and
  * bucket assignment compares the integer score against the double
  * threshold identically in both engines.
  *
  * Scale shape: scoring is the un1 pipeline (one explode + one
  * vocabulary join); the two thresholds are ONE exact-percentile
  * aggregate (sorts per group — swap in `percentile_approx` via
  * `approxAccuracy` for the 100 TB path, where a bounded-error sketch
  * is the right trade) broadcast back as a 1-row relation. No window,
  * no global sort.
  */
object PerplexityBuckets {

  /** Per-doc positive perplexity proxy: micro-nats per 1000 tokens,
    * qpd = (-sum_micro_nats * 1000) div n_tokens ≥ 0.
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    UnigramLm.scoreDocs(docs, idCol, textCol)
      .select(col("doc_id"),
        expr("cast((-sum_micro_nats * 1000) div n_tokens as bigint)")
          .as("qpd"))

  /** Assign head/middle/tail by the (pLow, pHigh) percentile
    * thresholds of the qpd distribution (CCNet uses thirds). Output:
    * (doc_id, qpd, bucket). `approxAccuracy > 0` switches the
    * threshold computation to the mergeable percentile_approx sketch.
    */
  def partition(scored: DataFrame, pLow: Double = 0.33,
      pHigh: Double = 0.66, approxAccuracy: Int = 0): DataFrame = {
    val th =
      if (approxAccuracy > 0)
        scored.agg(
          percentile_approx(col("qpd"), lit(pLow), lit(approxAccuracy))
            .cast("double").as("t_low"),
          percentile_approx(col("qpd"), lit(pHigh), lit(approxAccuracy))
            .cast("double").as("t_high"))
      else
        scored.agg(
          expr(s"percentile(qpd, ${pLow}d)").as("t_low"),
          expr(s"percentile(qpd, ${pHigh}d)").as("t_high"))
    scored.crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("qpd") <= col("t_low"), "head")
          .when(col("qpd") <= col("t_high"), "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("qpd"), col("bucket"))
  }
}
