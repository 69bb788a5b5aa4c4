package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact exponentially-weighted moving average (α = 1/2) over
  * per-key ordered series — the smoothed-trend signal beside
  * [[RollingStats]]'s windowed z-score: rolling stats answer "is today
  * an outlier vs the recent window", the EWMA answers "what is the
  * current level, with old history decayed geometrically" (ingestion
  * volume trending, quality-score drift per source, queue depth).
  *
  * Recurrence in micro-units: s₁ = x₁·1e6, sₜ = (xₜ·1e6 + sₜ₋₁) >> 1
  * — a right-shift IS the α=1/2 EWMA in integer arithmetic (values are
  * non-negative by contract), so the sequence is exactly reproducible
  * in any engine: the oracle replays it as a recursive CTE with `//2`,
  * bit for bit. No float accumulation, no tolerance.
  *
  * Scale shape: series live PER KEY and are bounded (days × keys is
  * metadata-scale next to the event corpus that produced the daily
  * counts), so each key's fold runs inside one aggregate over its
  * collected, sorted array — one shuffle by key, no windows, no
  * driver-side state. The corpus-sized work (raw events → daily
  * counts) happens upstream in a partial-aggregated groupBy.
  */
object Ewma {

  val EwmaUnit = 1000000L

  /** Per-key EWMA series. Input: one row per (key, ord) with a
    * non-negative long `valueCol`. Output: (key, ord, value,
    * ewma_micro, ewma) — one row per input row, ewma = micro/1e6
    * rounded to 6.
    */
  def ewmaHalf(series: DataFrame, keyCol: String, ordCol: String,
      valueCol: String): DataFrame = {
    val arr = sort_array(collect_list(struct(col("o"), col("x"))))
    val zero = struct(
      lit(Array.empty[Long]).cast("array<bigint>").as("acc"),
      lit(-1L).as("prev"))
    val folded = aggregate(arr, zero,
      (st, e) => {
        val s = when(st("prev") < 0, e("x") * EwmaUnit)
          .otherwise(shiftright(e("x") * EwmaUnit + st("prev"), 1))
        struct(concat(st("acc"), array(s)).as("acc"), s.as("prev"))
      })
    series
      .select(col(keyCol).as("key"), col(ordCol).as("o"),
        col(valueCol).cast("long").as("x"))
      .groupBy(col("key"))
      .agg(arr.as("a"), folded("acc").as("s"))
      .select(col("key"), explode(arrays_zip(col("a"), col("s"))).as("z"))
      .select(col("key"), col("z.a.o").as("ord"), col("z.a.x").as("value"),
        col("z.s").as("ewma_micro"),
        round(col("z.s").cast("double") / EwmaUnit, 6).as("ewma"))
  }
}
