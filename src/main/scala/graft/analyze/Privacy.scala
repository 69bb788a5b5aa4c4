package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Privacy guardrails for corpus/statistics release: k-anonymity
  * suppression over quasi-identifier columns and ε-differentially-
  * private noisy counts with threshold suppression — what a data team
  * runs before publishing corpus composition tables or per-cohort
  * statistics derived from user-adjacent data.
  *
  * The Laplace noise is DERIVED from the portable hash of the group key
  * (inverse-CDF over a hash-uniform), not drawn from an RNG: the
  * release is reproducible and oracle-checkable. A production release
  * wanting fresh randomness per publication swaps the seed — the
  * mechanism and the calibration (scale = Δf/ε = 1/ε for counts) are
  * exactly the Laplace mechanism's.
  *
  * 100 TB: both ops are one hash aggregate (map-side combinable) plus a
  * codegen projection; suppression needs no second pass because the
  * group count rides the aggregate.
  */
object Privacy {

  /** Per-group release decision under k-anonymity: groups of
    * quasi-identifier combinations with fewer than k members are
    * suppressed. Returns (qi..., n, released).
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("released", (col("n") >= k).cast("int"))

  /** Seeded Laplace noise with scale `b` for a group key column:
    * u = (hash60(seed,key)+0.5)/2^60 ∈ (0,1), then the Laplace
    * inverse CDF −b·sign(u−½)·ln(1−2|u−½|).
    */
  def seededLaplace(key: Column, seed: String, b: Double): Column = {
    val u = (PortableHash.hash60(lit(seed), key) + 0.5) /
      (PortableHash.Mask60 + 1).toDouble
    val d = u - 0.5
    val s = when(d < 0, -1.0).otherwise(1.0)
    lit(-b) * s * log(lit(1.0) - lit(2.0) * abs(d))
  }

  /** ε-DP noisy group counts (Laplace mechanism, sensitivity 1) with
    * τ-threshold suppression: only groups whose NOISY count clears τ
    * are released. Returns (groupCols..., noisy_n) — the true count is
    * deliberately absent from the release.
    */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      tau: Double, seed: String = "dp"): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val key = concat_ws("|", groupCols.map(col): _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_true_n"))
      .withColumn("noisy_n",
        round(col("_true_n") + seededLaplace(key, seed, 1.0 / epsilon), 4))
      .filter(col("noisy_n") >= tau)
      .drop("_true_n")
  }
}
