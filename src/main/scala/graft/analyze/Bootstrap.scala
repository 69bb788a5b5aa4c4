package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Poisson bootstrap — the distributed-friendly bootstrap (Chamandy et
  * al., "Estimating uncertainty for massive data streams", Google
  * 2012): instead of resampling n rows with replacement (which needs
  * global coordination), each row receives an independent Poisson(1)
  * weight per replicate, preserving the bootstrap distribution while
  * staying embarrassingly parallel — the standard way to put a
  * confidence interval on a corpus metric at 100 TB.
  *
  * Determinism: the per-(replicate, row) weight derives from
  * [[PortableHash.hash60]] via the inverse Poisson(1) CDF — thresholds
  * are plan-time double literals, the uniform is an exact integer hash
  * over 2⁶⁰ — so every replicate is bit-reproducible in any engine
  * (production swaps the seed per run; mechanism and calibration
  * unchanged). Weighted sums are exact integer math.
  *
  * Scale shape: one ×B row expansion (the bootstrap's intrinsic cost)
  * collapsed by a map-side-combinable groupBy on the replicate id —
  * B partial rows per partition cross the shuffle, nothing else. The
  * B-row mean table then sorts IN-ROW (array ops, no unpartitioned
  * window) to read off the percentile endpoints.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF thresholds for k = 0..6 (weights above
    * 7 have probability < 1e-5 and clamp).
    */
  val PoissonCdf: Seq[Double] = {
    val e = math.exp(-1.0)
    val pmf = (0 to 6).map(k => e / (1 to k).product.max(1))
    pmf.scanLeft(0.0)(_ + _).tail
  }

  /** Inverse-CDF Poisson(1) weight from a uniform in [0,1). */
  def poissonWeight(u: Column): Column =
    PoissonCdf.zipWithIndex
      .foldLeft(None: Option[Column]) { case (acc, (t, k)) =>
        Some(acc.fold(when(u < lit(t), k))(_.when(u < lit(t), k)))
      }.get.otherwise(lit(7)).cast("long")

  /** Replicate means + percentile CI for the mean of `valueCol` (an
    * integral column). Output: one row per replicate (b, n_eff,
    * mean_q) with the full-sample `point` and the rank-2 / rank-(B-1)
    * replicate means as `ci_lo` / `ci_hi` on every row.
    */
  def poissonMeanCi(df: DataFrame, idCol: String, valueCol: String,
      b: Int = 20): DataFrame = {
    require(b >= 4, "need at least 4 replicates for rank-based endpoints")
    val reps = df
      .select(col(idCol).cast("string").as("id"),
        col(valueCol).cast("long").as("x"),
        explode(lit((1 to b).toArray)).as("b"))
      .withColumn("u",
        PortableHash.hash60(col("b"), col("id")).cast("double") /
          lit(1152921504606846976L))
      .withColumn("wt", poissonWeight(col("u")))
      .groupBy(col("b"))
      .agg(sum(col("wt")).as("n_eff"), sum(col("wt") * col("x")).as("wsum"))
      .select(col("b"), col("n_eff"),
        round(col("wsum").cast("double") / col("n_eff"), 6).as("mean_q"))
    val ci = reps.agg(sort_array(collect_list(col("mean_q"))).as("arr"))
      .select(round(element_at(col("arr"), 2), 6).as("ci_lo"),
        round(element_at(col("arr"), b - 1), 6).as("ci_hi"))
    val point = df.agg(
      round(sum(col(valueCol).cast("long")).cast("double") /
        count(lit(1)), 6).as("point"))
    reps.crossJoin(broadcast(point)).crossJoin(broadcast(ci))
  }
}
