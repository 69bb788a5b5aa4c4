package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Weighted corpus resampling by SYSTEMATIC PPS (probability-
  * proportional-to-size) sampling — Madow's method: lay every
  * document's positive integer weight end to end along a line in the
  * deterministic shuffle order, then pick the documents whose weight
  * interval contains one of the k equally-spaced sampling points
  * (random start, step = W/k). A document's MULTIPLICITY (points in
  * its interval — heavy docs can be drawn more than once) is exactly
  * its epoch count in the resampled training mix; this is the
  * "resampling" half of DSIR (arXiv:2302.03169 §2), downstream of the
  * importance weights [[Dsir]] computes.
  *
  * Everything is 64-bit integer arithmetic — weights, prefix sums,
  * the step, the hash-derived start offset, and the two floor
  * divisions — so the sample is bit-reproducible across runs, engines,
  * and partitionings (no ln/exp in the selection path, unlike
  * Efraimidis–Spirakis keys, whose last-ulp log differences an engine
  * pair cannot be trusted to agree on).
  *
  * Scale: one [[Sampling.globalRunningSum]] prefix sum (two-pass range
  * partition — no global window), one scalar broadcast; selection is a
  * stateless per-row projection.
  */
object Resample {

  /** `docs` + `cum` (inclusive running weight in shuffle order) +
    * `multiplicity` (sampling points inside this doc's weight
    * interval; 0 = dropped). Requires `weightCol` > 0 on every row.
    * `k` is the target draw count: Σ multiplicity ∈ {k, k+1} by
    * construction (exactly the points that fit in [off, W)).
    */
  def ppsMultiplicity(docs: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: String = "pps"): DataFrame = {
    val withCum = Sampling.globalRunningSum(
      docs.withColumn("shuffle_key",
        pmod(col(idCol) * Mixing.Mult + Mixing.Add, lit(Mixing.Modulus))),
      Seq(col("shuffle_key").asc, col(idCol).asc), weightCol)
    val totals = withCum.agg(max(col("cum")).as("w_total"))
      .withColumn("step", greatest(expr(s"w_total div ${k}L"), lit(1L)))
      .withColumn("off",
        pmod(lit(PortableHash.hash60Local(seed, "start")), col("step")))
    // points in (cum - w, cum]: floor((cum - 1 - off)/step) minus
    // floor((cum - w - 1 - off)/step). Both numerators are shifted by
    // +step so they stay non-negative (off < step, cum >= 1): Spark's
    // `div` truncates toward zero while DuckDB's `//` floors, and the
    // two only agree on non-negative operands.
    withCum.crossJoin(broadcast(totals))
      .withColumn("multiplicity",
        (expr(s"(cum - 1 - off + step) div step") -
          expr(s"(cum - $weightCol - 1 - off + step) div step")).cast("int"))
      .drop("w_total", "step", "off")
  }
}
