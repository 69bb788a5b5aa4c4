package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill: densify a per-key daily series onto a complete
  * date spine, zero-filling counts and carrying state forward (LOCF —
  * last observation carried forward).
  *
  * The temporal analytics (rt1 retention, fn1 funnel, a15 debt trends)
  * all consume per-period series; gap fill is the preparation step that
  * makes "no data that day" explicit instead of silently absent — the
  * difference between a missing row and an observed zero, which any
  * downstream trend/window computation otherwise conflates.
  *
  * Scale shape: the spine is generated per key from its own [first,
  * last] span (`sequence` + explode — rows bounded by key-count ×
  * span, never a global calendar cross join); the observation join is
  * hash-partitioned on (key, day); LOCF is one window PARTITIONED BY
  * KEY. No global windows, no collects.
  */
object GapFill {

  /** Densify `daily` (one row per key & observed day) to the full daily
    * spine between each key's first and last day. `countCol` zero-fills
    * on gap days; `stateCol` carries forward; `observed` marks real
    * rows.
    */
  def fillDaily(daily: DataFrame, keyCol: String, dateCol: String,
      countCol: String, stateCol: String): DataFrame = {
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("_d0"), max(col(dateCol)).as("_d1"))
      .select(col(keyCol),
        explode(expr("sequence(_d0, _d1, interval 1 day)")).as(dateCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    spine.join(daily, Seq(keyCol, dateCol), "left")
      .withColumn(countCol, coalesce(col(countCol), lit(0L)))
      .withColumn("observed", col(stateCol).isNotNull)
      .withColumn(stateCol, last(col(stateCol), ignoreNulls = true).over(w))
  }
}
