package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide frequent-line (boilerplate) removal, C4 lineage: a line
  * that occurs in at least `minDocs` DISTINCT documents is treated as
  * site boilerplate (navigation, cookie banners, license footers) and
  * removed from EVERY document — including its first occurrence, which
  * is what distinguishes this from [[ParaDedup]]'s keep-first-occurrence
  * semantics. The two compose: boilerplate removal strips what is
  * template, paragraph dedup keeps one copy of what is content.
  *
  * Scale shape (100 TB): document frequency is one groupBy keyed on
  * line content with a two-phase distinct count (map-side partial
  * aggregation collapses repeats before the shuffle). The boilerplate
  * set is then broadcast for the anti-join — bounded by
  * total_lines / minDocs distinct values, and in real corpora tiny
  * (boilerplate is by definition the small set of lines repeated
  * everywhere); the corpus side streams. Blank lines are exempt
  * before the count (same reasoning as ParaDedup: the empty string
  * would be the heaviest key in the corpus and separator stripping is
  * not this operator's job) and can never enter the boilerplate set,
  * so one anti-join handles all lines. Rebuild is a groupBy per doc
  * with an array_sort on (position, line) — no single-partition stage.
  */
object FrequentLines {

  /** Document frequency of every non-blank line: (line, df). */
  def lineDf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(col("line") =!= "")
      .groupBy(col("line"))
      .agg(countDistinct(col("doc_id")).as("df"))

  /** One row per input document: `doc_id`, `n_lines` (before), `n_kept`
    * (after), `kept_text` (surviving lines re-joined with newlines in
    * original order; empty when everything was boilerplate).
    */
  def removeFrequentLines(docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    val lines = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
    val boiler = broadcast(
      lineDf(docs, idCol, textCol).filter(col("df") >= minDocs).select("line"))
    // blanks are never in `boiler`, so they survive the anti-join
    val kept = lines.join(boiler, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_idx"), col("line")))),
            x => x.getField("line")),
          "\n").as("kept_text"),
        count(lit(1)).cast("int").as("n_kept"))
    docs.select(col(idCol).as("doc_id"),
        size(split(col(textCol), "\n")).as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
