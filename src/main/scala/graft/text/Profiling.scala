package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus distribution profiling: per-group percentiles of a numeric
  * column (document lengths, token counts) — the reporting surface a
  * quality-filter threshold is tuned against.
  *
  * Two paths with one signature:
  *  - `percentiles` — EXACT (Catalyst `percentile`, R-7 linear
  *    interpolation, the same definition as DuckDB `quantile_cont`, so
  *    the gate hash-matches). Exact percentile sorts per group; right
  *    for gate-scale groups and for final reporting over pre-aggregated
  *    data.
  *  - `percentilesApprox` — the 100 TB scale path: single-pass
  *    mergeable sketch (`percentile_approx`), error bounded by
  *    `accuracy`; ProfilingSpec asserts the sketch lands within the
  *    exact neighborhood on skewed data.
  */
object Profiling {

  private def pname(p: Double): String =
    "p" + BigDecimal(p * 100).bigDecimal.stripTrailingZeros.toPlainString
      .replace(".", "_")

  def percentiles(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      ps.map(p => round(
        expr(s"percentile($valueCol, ${p}d)"), 6).as(pname(p))): _*)

  def percentilesApprox(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      ps.map(p => percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .cast("double").as(pname(p))): _*)
}
