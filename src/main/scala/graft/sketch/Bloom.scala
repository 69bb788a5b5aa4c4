package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Portable Bloom filter over a key column — the shuffle-free
  * membership pre-filter a 100 TB ingest pipeline runs BEFORE the
  * expensive dedup join: a new batch probes the corpus filter and only
  * the (tiny) maybe-present slice pays the real equi-join; the
  * definitely-absent bulk streams straight through with zero shuffle
  * of the corpus.
  *
  * The filter is the relation of SET bit positions (distinct
  * hash_i(k) mod m over the d seed rows) — at most m rows, constant in
  * corpus size, broadcast to probes. A key is maybe-present iff ALL d
  * of its positions are set; false positives are possible (rate ≈
  * (1-e^(-dn/m))^d), false negatives are not. [[PortableHash]] bits
  * make the filter — including its false positives — bit-reproducible
  * in the DuckDB oracle.
  *
  * Spark's own BloomFilterAggregate expression serves the same role
  * natively (xxhash64-based); this relation-shaped build exists so the
  * semantics stay engine-portable and oracle-checkable.
  */
object Bloom {

  private def positions(key: Column, d: Int, m: Int): Column =
    array((0 until d).map(i =>
      pmod(PortableHash.hash60(key, i), lit(m)).cast("int")): _*)

  /** Build: one row per SET bit — (bit). At most m rows. */
  def build(keys: DataFrame, keyCol: String, d: Int, m: Int): DataFrame =
    keys.select(explode(positions(col(keyCol), d, m)).as("bit")).distinct()

  /** Probe: adds `maybe_present` to the batch — true iff all d bit
    * positions of the key are set. The filter side is broadcast; the
    * batch side never shuffles (the join key is the bit, the aggregate
    * is keyed by the batch's own id column, both map-side local after
    * broadcast).
    */
  def probe(batch: DataFrame, keyCol: String, filter: DataFrame,
      d: Int, m: Int): DataFrame = {
    val exploded = batch
      .withColumn("_bit", explode(positions(col(keyCol), d, m)))
    val f = filter.select(col("bit").as("_bit"), lit(1).as("_set"))
    exploded.join(broadcast(f), Seq("_bit"), "left_outer")
      .groupBy(batch.columns.map(col): _*)
      .agg((sum(coalesce(col("_set"), lit(0))) === d).as("maybe_present"))
  }
}
