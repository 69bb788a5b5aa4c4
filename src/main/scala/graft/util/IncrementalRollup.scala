package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance — the warehouse dual of the b2 BM25
  * merge: a persisted per-key aggregate table absorbs a new batch by
  * merging PARTIALS (sums add, counts add, mins/maxes fold) instead of
  * re-aggregating the full fact history. At 100 TB the fact scan is
  * the cost; the rollup table is key-cardinality-sized, so maintenance
  * cost tracks the DELTA. Works because sum/count/min/max are
  * commutative monoids — the same algebraic fact that licenses Spark's
  * own partial aggregation, applied across batches.
  *
  * Contract (gate-proven): merge(rollup(base), rollup(delta)) is
  * bit-identical to rollup(base ∪ delta). Integer measures keep the
  * proof exact; averages et al. derive from (sum, count) at read time
  * — never stored (a stored avg cannot merge).
  */
object IncrementalRollup {

  /** Aggregate a fact batch to the rollup shape: keys + n_rows +
    * sum/min/max per measure column.
    *
    * Fails fast on non-integral measure columns: the merge ≡ rebuild
    * contract is only exact for integer measures (a silent long cast of
    * a double measure would truncate per-partial and quietly void the
    * bit-exact guarantee the scaladoc promises).
    */
  def rollup(facts: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType)
    val bad = measures.filterNot(m => integral.contains(facts.schema(m).dataType))
    require(bad.isEmpty,
      s"IncrementalRollup measures must be integral (byte/short/int/long); " +
        s"non-integral: ${bad.map(m => s"$m:${facts.schema(m).dataType.simpleString}").mkString(", ")}. " +
        "Scale doubles to integer units (micro-money, micro-nats) upstream.")
    val aggs = count(lit(1)).cast("long").as("n_rows") +:
      measures.flatMap(m => Seq(
        sum(col(m)).cast("long").as(s"sum_$m"),
        min(col(m)).cast("long").as(s"min_$m"),
        max(col(m)).cast("long").as(s"max_$m")))
    facts.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two rollup tables of the same shape: one union + one
    * re-aggregation over key-cardinality rows (never the facts).
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs = sum(col("n_rows")).cast("long").as("n_rows") +:
      measures.flatMap(m => Seq(
        sum(col(s"sum_$m")).cast("long").as(s"sum_$m"),
        min(col(s"min_$m")).cast("long").as(s"min_$m"),
        max(col(s"max_$m")).cast("long").as(s"max_$m")))
    a.unionByName(b)
      .groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
