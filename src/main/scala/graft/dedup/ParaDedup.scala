package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide paragraph-level exact dedup (C4/Dolma lineage): split
  * each document on newlines, keep only the globally FIRST occurrence
  * of every paragraph (first = smallest (doc_id, position)), and
  * rebuild each document from its surviving paragraphs. Catches the
  * boilerplate that document-level dedup can't: shared headers,
  * footers, navigation blocks, license banners.
  *
  * Scale notes: the first-occurrence pass is a window PARTITIONED by
  * paragraph text — dedup-standard, shuffle keyed on content. Empty
  * paragraphs are exempted BEFORE the window (always kept): the empty
  * string is by far the heaviest key in real corpora (every blank
  * separator line in 100 TB would land in one task), and deleting
  * blank separators is not dedup's job. Rebuild is a groupBy on
  * doc_id with an array_sort on (position, text) — deterministic, no
  * single-partition stage anywhere.
  */
object ParaDedup {

  /** One row per input document: `doc_id`, `n_paras` (before), `n_kept`
    * (after), `kept_text` (the surviving paragraphs re-joined with
    * newlines in original order; empty when everything was dropped).
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val paras = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("para_idx", "para")))
    val cand = paras.filter(col("para") =!= "")
    val blank = paras.filter(col("para") === "")
    val w = Window.partitionBy(col("para"))
      .orderBy(col("doc_id"), col("para_idx"))
    val first = cand.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val rebuilt = first.unionByName(blank)
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("para_idx"), col("para")))),
            x => x.getField("para")),
          "\n").as("kept_text"),
        count(lit(1)).cast("int").as("n_kept"))
    docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), "\n")).as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
