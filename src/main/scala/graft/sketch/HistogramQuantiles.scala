package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable equi-width histogram sketch for distribution profiling and
  * approximate quantiles.
  *
  * The corpus profiler (`pf1`, `graft.text.Profiling`) computes EXACT
  * percentiles with a two-pass prefix-sum — the right answer when one
  * job owns the whole relation. At 100 TB the standard alternative is a
  * MERGEABLE summary: each shard aggregates a fixed-width histogram
  * (constant size, one map-side combine), histograms union by integer
  * addition across shards/days/sources, and quantiles interpolate from
  * the merged counts. That union-by-addition is what t-digest/KLL give
  * approximately — the equi-width histogram gives it EXACTLY and
  * deterministically (integer bucket math, no sampling), at the cost of
  * a fixed value range [lo, hi).
  *
  * Scale shape: one groupBy over ≤ `buckets` keys (constant-size
  * aggregate relation); the quantile read-out runs entirely on that
  * bucket table — running counts via the shared two-pass prefix sum
  * (`graft.text.Sampling.globalRunningSum`, no single-partition
  * window), the ≤9-row quantile probe and 1-row total broadcast.
  */
object HistogramQuantiles {

  /** Per-bucket integer counts of `valueCol` (a plain column name, used
    * in integer `div` arithmetic) over [lo, hi); values outside clamp
    * into the edge buckets so totals always match row counts. Output:
    * (bucket, lo_edge, hi_edge, n) for every non-empty bucket.
    */
  def histogram(df: DataFrame, valueCol: String, lo: Long, hi: Long,
      buckets: Int): DataFrame = {
    val width = (hi - lo).toDouble / buckets
    val b = least(greatest(
      expr(s"(($valueCol - $lo) * $buckets) div ${hi - lo}").cast("int"),
      lit(0)), lit(buckets - 1))
    df.select(b.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))
      .select(col("bucket"),
        round(lit(lo) + col("bucket") * width, 6).as("lo_edge"),
        round(lit(lo) + (col("bucket") + 1) * width, 6).as("hi_edge"),
        col("n"))
  }

  /** Merge per-group histograms (e.g. per shard/day) by integer
    * addition — the mergeability property that makes the sketch
    * cluster-shaped. Input must carry (bucket, n).
    */
  def merge(histograms: DataFrame): DataFrame =
    histograms.groupBy(col("bucket"))
      .agg(sum(col("n")).cast("long").as("n"))

  /** Approximate quantiles from a (merged) histogram: for each
    * requested q in per-mille, the lower edge of the first bucket whose
    * running count reaches q·total/1000 — integer rank math, the
    * conservative "at or below" estimate. Output: (q_permille, est,
    * bucket, total).
    */
  def quantiles(hist: DataFrame, lo: Long, hi: Long, buckets: Int,
      qPermille: Seq[Int]): DataFrame = {
    val spark = hist.sparkSession
    import spark.implicits._
    val width = (hi - lo).toDouble / buckets
    val cum = graft.text.Sampling.globalRunningSum(
      hist.select(col("bucket"), col("n")), Seq(col("bucket").asc), "n")
    val total = cum.agg(max(col("cum")).cast("long").as("total"))
    val qs = qPermille.toDF("q_permille")
    cum.crossJoin(broadcast(total)).crossJoin(broadcast(qs))
      .filter(col("cum") * 1000 >= col("q_permille") * col("total"))
      .groupBy(col("q_permille"))
      .agg(min(col("bucket")).as("qb"),
        first(col("total")).cast("long").as("total"))
      .select(col("q_permille"),
        round(lit(lo) + col("qb") * width, 6).as("est"),
        col("qb").cast("int").as("bucket"),
        col("total"))
  }
}
