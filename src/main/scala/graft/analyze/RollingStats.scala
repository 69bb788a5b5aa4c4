package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-window anomaly scoring over per-key time series: each
  * observation's z-score against its own trailing window — the standard
  * ingest-monitoring signal (did this source's daily volume jump?) that
  * a corpus pipeline runs beside the constraint guardrails
  * (`DataQuality`): rc1 checks absolute invariants, this flags
  * *relative* drift without fixed thresholds.
  *
  * Determinism: the trailing mean/variance are derived from ROLLING
  * INTEGER SUMS (Σx, Σx², n over a ROWS frame) — exact in any engine —
  * and the z-score is formed from those integers in double in one
  * expression: z = (n·x − Σx) / sqrt((n·Σx² − (Σx)²) · n/(n−1)),
  * rounded to 4. No engine-side stddev aggregate (whose accumulation
  * order is not a portable contract) is involved. The variance
  * numerator×n product stays in the LONG domain until the final cast
  * (mirrored byte-for-byte by `streaming.AnomalyStream.score`), so the
  * exactness bound is varNum·n < 2^63 — |value| up to ~2^15 with
  * window ≤ 64 stays exact; larger magnitudes overflow identically on
  * both paths rather than drifting by an ulp between them.
  *
  * Scale shape: one window PARTITIONED BY KEY with a bounded ROWS
  * frame; no global state. Compose with [[graft.util.GapFill]] first
  * when "no rows that day" must count as an observed zero.
  */
object RollingStats {

  /** Attach trailing-window stats to (keyCol, orderCol, valueCol) rows:
    * win_n (observations in frame), mean (round 6), z (round 4; 0.0
    * when the frame has <2 rows or zero variance).
    *
    * `tieCol` makes the frame ordering TOTAL when (key, orderCol) can
    * repeat (the repo-wide unique-tiebreak rule — a ROWS frame over a
    * partial order would make z depend on physical row order).
    */
  def rollingZ(series: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, window: Int, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
      .rowsBetween(-(window - 1), 0)
    val x = col(valueCol)
    val withSums = series
      .withColumn("_s1", sum(x).over(w))
      .withColumn("_s2", sum(x * x).over(w))
      .withColumn("win_n", count(x).over(w))
    val c = col("win_n")
    val varNum = c * col("_s2") - col("_s1") * col("_s1")
    withSums
      .withColumn("mean",
        round(col("_s1").cast("double") / c, 6))
      .withColumn("z",
        when(c >= 2 && varNum > 0,
          round((x * c - col("_s1")).cast("double") /
            sqrt((varNum * c).cast("double") / (c - 1)), 4))
          .otherwise(lit(0.0)))
      .drop("_s1", "_s2")
  }
}
