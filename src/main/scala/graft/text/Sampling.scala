package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sampling for training mixes: keep the best documents by
  * a quality key until a global token budget is exhausted — i.e. the
  * prefix of the (quality desc, id asc) order whose running token sum
  * stays within budget.
  *
  * The global running sum is computed WITHOUT a single-partition window
  * (the naive `Window.orderBy(...)` — banned by this repo's scale rules
  * — serializes the corpus through one task): range-repartition on the
  * sort key gives a distributed total order, each partition computes
  * its LOCAL prefix sums via a window PARTITIONED by partition id, the
  * per-partition totals (one row per partition — metadata scale) are
  * collected and prefix-summed on the driver, and the offsets are
  * broadcast back as a map lookup. Two linear passes, no corpus-sized
  * shuffle beyond the range partition itself.
  */
object Sampling {

  /** `docs` plus a `cum` column: the global running sum of `tokCol` in
    * `sortCols` total order, computed with the two-pass prefix sum
    * described above (no single-partition window).
    */
  def globalRunningSum(docs: DataFrame, sortCols: Seq[Column],
      tokCol: String, partitions: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val p =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    // materialize the range partitioning once so the totals job and the
    // final plan see the SAME row→partition assignment (the range
    // sampler is not guaranteed stable across separate executions)
    val sorted = docs
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
    val local = sorted.withColumn("_lcum",
      sum(col(tokCol).cast("long")).over(w))
    val totals = local.groupBy(col("_pid"))
      .agg(max(col("_lcum")).as("t"))
      .collect().map(r => (r.getAs[Int]("_pid"), r.getAs[Long]("t")))
      .sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toMap
    val offMap = typedlit(offsets)
    local
      .withColumn("cum",
        col("_lcum") + coalesce(element_at(offMap, col("_pid")), lit(0L)))
      .drop("_pid", "_lcum")
  }

  /** Rows of `docs` selected under `budget` total `tokCol`, in
    * (qCol desc, idCol asc) priority order, with the global running
    * total as `cum`. Deterministic: ties break on the id.
    */
  def takeByTokenBudget(docs: DataFrame, qCol: String, tokCol: String,
      idCol: String, budget: Long, partitions: Int = 0): DataFrame =
    globalRunningSum(docs, Seq(col(qCol).desc, col(idCol).asc),
        tokCol, partitions)
      .filter(col("cum") <= budget)
}
