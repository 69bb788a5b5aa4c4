package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: concatenate the corpus in a
  * deterministic global order and chop it into fixed-size context
  * blocks (the standard GPT-style "concat then chunk" packing). Each
  * document maps to the block range it spans; a document crossing a
  * block boundary contributes one segment row per block.
  *
  * The global token offsets come from `Sampling.globalRunningSum` —
  * the distributed two-pass prefix sum — so no single-partition
  * window appears anywhere. Block ids are derived arithmetically from
  * the offsets (no join against a block table), and the per-doc
  * explode factor is ceil(n_tokens/ctx)+1 at most.
  */
object Packing {

  /** One row per (document, context block) segment: `doc_id`-like id
    * column, the token count, the document's global `tok_offset`, the
    * `block_id` it lands in, and `seg_tokens` — how many of the doc's
    * tokens fall inside that block. sum(seg_tokens) per doc equals the
    * doc's token count; sum per block equals `ctx` for every block but
    * the last. Zero-token docs are excluded (they occupy no space).
    */
  def packIntoBlocks(docs: DataFrame, idCol: String, tokCol: String,
      ctx: Long, partitions: Int = 0): DataFrame = {
    require(ctx > 0, s"ctx must be positive, got $ctx")
    val cum = Sampling.globalRunningSum(
      docs.filter(col(tokCol) > 0), Seq(col(idCol).asc), tokCol, partitions)
    cum
      .withColumn("tok_offset", col("cum") - col(tokCol).cast("long"))
      .withColumn("_first", expr(s"tok_offset div $ctx"))
      .withColumn("_last",
        expr(s"(tok_offset + cast(`$tokCol` as bigint) - 1) div $ctx"))
      .withColumn("block_id",
        explode(sequence(col("_first"), col("_last"))))
      .withColumn("seg_tokens",
        least(col("tok_offset") + col(tokCol), (col("block_id") + 1) * ctx) -
          greatest(col("tok_offset"), col("block_id") * ctx))
      .select(col(idCol), col(tokCol), col("tok_offset"), col("block_id"),
        col("seg_tokens").cast("long").as("seg_tokens"))
  }
}
