package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse a change
  * log into versioned rows with [valid_from, valid_to) intervals.
  *
  * Complements the temporal surfaces already built on the index store
  * (J4 change detection, g7/g8 entities-at-commit ancestry, au2 drift):
  * SCD2 is the warehouse-native way to persist "what did this entity
  * look like at time T" so a training-data snapshot can join
  * point-in-time metadata without replaying the log ([[AsOfJoin]] is
  * the query-side dual of this write-side build).
  *
  * Scale shape: one window partitioned BY THE ENTITY KEY (never global)
  * ordered by (event time, unique tiebreak) computes the run boundaries
  * (gaps-and-islands via lag-change flags + running sum), one
  * aggregation per run, one lead() for the closing timestamp. Three
  * stages over the same key partitioning — a single shuffle at scale.
  *
  * Determinism: the tiebreak column makes every window ordering total;
  * run ids are integer sums; `valid_to` closes with the sentinel
  * 9999-12-31 on the open run (classic convention, and hash-stable).
  */
object Scd {

  /** Build SCD2 history from a change log.
    *
    * @param changes  change events (one row per observation)
    * @param keyCol   entity key
    * @param timeCol  observation time (date or timestamp)
    * @param tieCol   unique per-key tiebreak making orderings total
    * @param attrCol  the tracked attribute (a new version starts when it
    *                 changes)
    * @return (keyCol, attrCol, version, valid_from, valid_to, n_events)
    */
  def scd2(changes: DataFrame, keyCol: String, timeCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col(tieCol))
    val flagged = changes
      .select(col(keyCol), col(timeCol), col(tieCol), col(attrCol))
      .withColumn("chg",
        when(lag(col(attrCol), 1).over(byKey).isNull ||
          lag(col(attrCol), 1).over(byKey) =!= col(attrCol), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("chg")).over(
        Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = flagged
      .groupBy(col(keyCol), col("run_id"))
      .agg(
        first(col(attrCol)).as(attrCol),
        min(col(timeCol)).as("valid_from"),
        count(lit(1)).cast("long").as("n_events"))
    val nextFrom = Window.partitionBy(col(keyCol)).orderBy(col("run_id"))
    runs
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(nextFrom),
          lit("9999-12-31").cast(runs.schema("valid_from").dataType)))
      .select(col(keyCol), col(attrCol),
        col("run_id").cast("int").as("version"),
        col("valid_from"), col("valid_to"), col("n_events"))
  }
}
