package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.TextFunctions.tokens

/** Content-defined chunking (CDC) dedup: split each document at
  * positions where the hash of the local k-gram satisfies
  * `h % divisor == 0` (the FastCDC/rsync boundary rule, word-level),
  * then find segments repeated across documents. Because boundaries
  * depend only on LOCAL content, an insertion shifts segment ids but
  * not downstream boundaries — so shared content still collapses, the
  * property fixed-width shingling (sa1) and whole-paragraph hashing
  * (pd1) both lack.
  *
  * Distributed shape: one codegen projection per token (gram hash +
  * boundary flag), segment ids via a running boundary count under a
  * doc-partitioned window, segment texts rebuilt order-safely with
  * sort_array over (pos, token) structs (collect_list order is not a
  * contract), and the cross-doc repeat scan is one hash aggregate on
  * the segment content — never a pairwise comparison.
  */
object Cdc {

  /** Per-token rows with CDC segment ids:
    * (doc_id, pos, tok, seg). Boundary BEFORE token t when the k-gram
    * starting at t hashes to 0 mod `divisor` (pos 0 always starts
    * segment 0; tail positions with no full gram never open one).
    */
  def segments(docs: DataFrame, textCol: String, idCol: String,
      k: Int, divisor: Int): DataFrame = {
    require(divisor > 0, "divisor must be positive")
    // (tok, gram-starting-here-or-null) zipped BEFORE the explode so
    // each row is constant-size (no token array riding every row)
    val items = transform(sequence(lit(0), size(col("toks")) - 1),
      i => struct(
        element_at(col("toks"), (i + 1).cast("int")).as("tok"),
        when(i <= size(col("toks")) - k,
          array_join(slice(col("toks"), i + 1, lit(k)), " "))
          .as("gram")))
    val rows = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("doc_id"), posexplode(items))
      .select(col("doc_id"), col("pos"),
        col("col").getField("tok").as("tok"),
        col("col").getField("gram").as("gram"))
    val isBoundary = col("pos") > 0 && col("gram").isNotNull &&
      PortableHash.hash60(lit("cdc"), col("gram")) % divisor === 0
    val running = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("seg",
        sum(isBoundary.cast("long")).over(running))
      .select(col("doc_id"), col("pos"), col("tok"), col("seg"))
  }

  /** Cross-document repeated CDC segments:
    * (seg_text, n_docs, n_occurrences, min_doc) for segments appearing
    * in more than one document.
    */
  def repeatedSegments(docs: DataFrame, textCol: String, idCol: String,
      k: Int, divisor: Int): DataFrame =
    segments(docs, textCol, idCol, k, divisor)
      .select(col("doc_id"), col("seg"),
        struct(col("pos"), col("tok")).as("pt"))
      .groupBy(col("doc_id"), col("seg"))
      .agg(array_join(transform(sort_array(collect_list(col("pt"))),
        x => x.getField("tok")), " ").as("seg_text"))
      .groupBy(col("seg_text"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("min_doc"))
      .filter(col("n_docs") > 1)
}
