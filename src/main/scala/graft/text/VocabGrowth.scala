package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.tokens

/** Heaps-law vocabulary-growth curve: for each document (in id order),
  * the cumulative token count and cumulative number of DISTINCT types
  * seen so far. The standard corpus diagnostic for "is more data still
  * adding vocabulary" — a flattening curve signals saturation/duplicate
  * content; tokenizer teams read V(n) ≈ K·n^β off it.
  *
  * Distributed shape: a type's first occurrence is `min(doc_id)` per
  * token (one hash-partitioned aggregate with map-side partial min —
  * the only corpus-scale shuffle), new-type counts collapse to ONE row
  * per document (metadata scale), and both running totals come from the
  * shared two-pass prefix-sum primitive ([[Sampling.globalRunningSum]])
  * — never a single-partition global window.
  */
object VocabGrowth {

  /** (doc_id, n_toks, new_types, cum_toks, cum_vocab) in id order. */
  def curve(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("_toks"))
    val perDoc = base.select(col("doc_id"),
      size(col("_toks")).cast("long").as("n_toks"))
    val firstOcc = base
      .select(col("doc_id"), explode(col("_toks")).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
    val newTypes = firstOcc.groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("new_types"))
    val joined = perDoc.join(newTypes, Seq("doc_id"), "left")
      .na.fill(0L, Seq("new_types"))
    val cumT = Sampling
      .globalRunningSum(joined, Seq(col("doc_id").asc), "n_toks")
      .withColumnRenamed("cum", "cum_toks")
    Sampling
      .globalRunningSum(cumT, Seq(col("doc_id").asc), "new_types")
      .withColumnRenamed("cum", "cum_vocab")
      .select(col("doc_id"), col("n_toks"), col("new_types"),
        col("cum_toks"), col("cum_vocab"))
  }
}
