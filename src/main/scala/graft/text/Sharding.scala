package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-balanced output sharding: the last step before a corpus ships
  * to trainers — documents in the deterministic shuffle order
  * ([[Mixing.shuffleRanks]]' LCG key), cut into shards of ~`shardTokens`
  * tokens each by the document's global token START offset, so every
  * shard except the last holds ≥ `shardTokens` tokens minus one doc's
  * overhang and training jobs stream equal-sized files. Assignment is
  * pure arithmetic over the distributed prefix sum — reproducible
  * across runs, engines, and partitionings.
  *
  * Scale: the prefix sum is [[Sampling.globalRunningSum]]'s two-pass
  * range-partition scheme (no single-partition window anywhere); the
  * write is then `partitionBy(shard_id)` — each shard a contiguous
  * token range, trivially parallel at any corpus size.
  */
object Sharding {

  /** `docs` + `shuffle_key`, `cum` (running token total in shuffle
    * order, inclusive), `shard_id` (0-based). A document belongs to the
    * shard its FIRST token falls in: `(cum - n_tokens) div shardTokens`.
    */
  def assignShards(docs: DataFrame, idCol: String, tokCol: String,
      shardTokens: Long): DataFrame =
    Sampling.globalRunningSum(
        docs.withColumn("shuffle_key",
          pmod(col(idCol) * Mixing.Mult + Mixing.Add, lit(Mixing.Modulus))),
        Seq(col("shuffle_key").asc, col(idCol).asc), tokCol)
      // `div` = exact integer division on longs (a double `/` would be
      // exact only below 2^53 — true today, but why carry the caveat)
      .withColumn("shard_id",
        expr(s"(cum - $tokCol) div ${shardTokens}L").cast("int"))

  /** Per-shard manifest: doc count, token total, and the id range —
    * what a loader reads to plan epoch streaming.
    */
  def manifest(assigned: DataFrame, idCol: String, tokCol: String)
      : DataFrame =
    assigned.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokCol).cast("long")).as("shard_tokens"),
        min(col(idCol)).as("min_id"), max(col(idCol)).as("max_id"))
}
