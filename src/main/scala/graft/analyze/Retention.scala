package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention: users grouped by the week of their first
  * cohort-defining event, counted as retained in every later week they
  * show ANY activity. All week math is integer division over epoch
  * micros — exact and engine-portable.
  *
  * Scale shape: per-user (user, week) activity is made DISTINCT before
  * the cohort join (the join input is bounded by users×weeks, not by
  * raw event volume), and the final countDistinct groups by
  * (cohort_week, offset) — both shuffles are on bounded keys.
  */
object Retention {

  val WeekUs: Long = 7L * 86400 * 1000 * 1000

  /** One row per (cohort_week, week_offset ≥ 0) with the distinct
    * retained-user count.
    */
  def weeklyCohorts(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, cohortType: String): DataFrame = {
    val cohorts = events.filter(col(typeCol) === cohortType)
      .groupBy(col(userCol)).agg(min(col(tsUsCol)).as("_t0"))
      .select(col(userCol), expr(s"_t0 div $WeekUs").as("cohort_week"))
    val active = events
      .select(col(userCol), expr(s"`$tsUsCol` div $WeekUs").as("week"))
      .distinct()
    cohorts.join(active, Seq(userCol))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .filter(col("week_offset") >= 0)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
