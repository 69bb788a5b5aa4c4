package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash-LSH parameter planner — the (bands, rows) optimizer every
  * LSH deployment runs before indexing (datasketch's `_optimal_param`;
  * the knob behind `minhashNearDupPairs`' RowsPerBand). For a hash
  * budget H and a target Jaccard threshold τ, each factorization
  * H = b·r has detection curve p(s) = 1 − (1 − s^r)^b; the planner
  * scores every candidate by the curve's error mass against the step
  * function at τ (false-positive mass below τ plus false-negative mass
  * above, on a fixed probe grid) and flags the argmin.
  *
  * Determinism: the whole S-curve evaluates in integer micro-units —
  * powers are iterated `(acc·x) div 10^6` folds (values ≤ 10^12, exact
  * in the double `floor` Spark needs for integral division; DuckDB
  * mirrors with `//` over the same fold) — so the gate hash-matches
  * bit-for-bit with no libm `pow` in either engine.
  *
  * Scale: the grid is (budgets × τ × divisors) rows — metadata-scale —
  * but expressed as one codegen'd plan, so planning for a thousand
  * corpora is the same single pass.
  */
object LshPlan {

  val Micro = 1000000L

  /** Probe grid: s = 0.05, 0.10, …, 0.95 in micro units. */
  val Probes: Seq[Long] = (1 to 19).map(_ * 50000L)

  /** x^n in micro units via the iterated fold (x ≤ 10^6, n ≥ 1). */
  private def powMicro(x: Column, n: Column): Column =
    aggregate(
      array_repeat(x, (n - 1).cast("int")),
      x,
      (acc, e) => floor(acc * e / lit(Micro)).cast("long"))

  /** All (b, r) plans per (max_hashes, tau_micro) input row, with the
    * error mass and the chosen flag (rank 1 by cost, then fewer bands,
    * then fewer rows — fewer bands = smaller index).
    * Input: a DataFrame with `max_hashes`; `taus` are micro thresholds.
    * Output: (max_hashes, tau_micro, b, r, cost_micro, chosen).
    */
  def plans(budgets: DataFrame, taus: Seq[Long], maxRows: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = col("max_hashes").cast("int")
    // divisor factorizations b·r = H with r bounded (huge r is useless:
    // the curve collapses toward 0 everywhere below s≈1)
    val grid = budgets.select(h.as("max_hashes"))
      .withColumn("r", explode(filter(sequence(lit(1), least(h, lit(maxRows))),
        r => h % r === 0)))
      .withColumn("b", (h / col("r")).cast("int"))
      .withColumn("tau_micro", explode(
        array(taus.map(t => lit(t)): _*)))
    // p(s) = 1 − (1 − s^r)^b at every probe, folded into the cost
    val cost = Probes.map { s =>
      val sr = powMicro(lit(s), col("r"))
      val p = lit(Micro) - powMicro(lit(Micro) - sr, col("b"))
      when(lit(s) < col("tau_micro"), p).otherwise(lit(Micro) - p)
    }.reduce(_ + _)
    val w = Window.partitionBy(col("max_hashes"), col("tau_micro"))
      .orderBy(col("cost_micro"), col("b"), col("r"))
    grid.withColumn("cost_micro", cost)
      .withColumn("chosen", (row_number().over(w) === 1).cast("int"))
      .select(col("max_hashes"), col("tau_micro"), col("b"), col("r"),
        col("cost_micro"), col("chosen"))
  }
}
