package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding token-window chunking: cut each document into max-length
  * token windows with a fixed stride (overlap = winLen − stride) — the
  * standard preparation for a fixed-context trainer when documents
  * exceed the context length, and the long-document dual of
  * [[Packing]] (which concatenates SHORT documents up to the context
  * length). The reference chunks long source files the same way before
  * embedding (`mcp_vector_search/core/chunking.py` window/overlap
  * logic); here it is the corpus-side op.
  *
  * Scale shape: `sequence` + explode per row (output rows bounded by
  * tokens/stride), window extraction is an array slice — a pure
  * projection, no shuffle, no UDF; runs at scan speed inside
  * WholeStageCodegen.
  */
object Windowing {

  /** One row per (doc, window): window_id, start (0-based token
    * offset), n_tokens in the window (short tail windows keep their
    * real length), and the window text.
    */
  def tokenWindows(docs: DataFrame, idCol: String, textCol: String,
      winLen: Int, stride: Int): DataFrame = {
    require(stride > 0 && winLen >= stride,
      "need stride > 0 and winLen >= stride")
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride)))
          .as("start"))
      .select(
        col("doc_id"),
        (col("start") / stride).cast("int").as("window_id"),
        col("start"),
        slice(col("toks"), col("start") + 1, lit(winLen)).as("w"))
      .select(col("doc_id"), col("window_id"), col("start"),
        size(col("w")).as("n_tokens"),
        concat_ws(" ", col("w")).as("window_text"))
  }
}
