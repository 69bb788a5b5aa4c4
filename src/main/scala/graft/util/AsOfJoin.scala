package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, attach the LATEST right
  * row with the same key and `right.ts <= left.ts` (left-join
  * semantics — unmatched left rows survive with nulls).
  *
  * Implementation is the union-scan shape, not a join: tag both sides,
  * union them, and run ONE window PARTITIONED BY the key ordered by
  * (ts, side, unique id), propagating the right side's carried columns
  * with `last(..., ignoreNulls)`. Right rows sort before left rows at
  * equal timestamps, which is exactly the `<=` semantics.
  *
  * Why not a range join: `left JOIN right ON key AND r.ts <= l.ts` then
  * max-per-left explodes quadratically per key (every purchase pairs
  * with EVERY prior click before the dedup). The union-window shape is
  * one shuffle of left+right on the key, linear per partition, and
  * AQE-salvageable on skewed keys. Ties are impossible by
  * construction — the ordering ends on a unique id per side — so the
  * result is deterministic row for row.
  */
object AsOfJoin {

  /** @param leftId  unique-id column of `left` (ordering tiebreak)
    * @param rightId unique-id column of `right`
    * @param key     equi-join key present on both sides
    * @param ts      event-time column present on both sides
    * @param carry   `right` columns to attach (returned as prefix+name)
    */
  def asOf(left: DataFrame, leftId: String, right: DataFrame,
      rightId: String, key: String, ts: String, carry: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val right2 = right.select(
      Seq(col(key), col(ts), col(rightId).as("_ord"), lit(0).as("_side")) ++
        carry.map(c => col(c).as(prefix + c)): _*)
    val left2 = left
      .withColumn("_side", lit(1))
      .withColumn("_ord", col(leftId))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carry.foldLeft(
        left2.unionByName(right2, allowMissingColumns = true)) {
        (df, c) =>
          df.withColumn(prefix + c, last(col(prefix + c), true).over(w))
      }
      .filter(col("_side") === 1)
      .drop("_side", "_ord")
  }
}
