package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line/page cleaning (Raffel et al. 2020, arXiv:1910.10683
  * §2.2 — the "Colossal Clean Crawled Corpus" heuristics): the OTHER
  * canonical rule family beside Gopher's document-level bounds
  * ([[GopherRules]]). C4 cleans at LINE granularity first, then drops
  * whole pages:
  *
  *  - keep only lines that end in a terminal punctuation mark
  *    (`.` `!` `?` `"`),
  *  - keep only lines with ≥ `minLineWords` words,
  *  - drop any line containing the word "javascript" (cookie/JS
  *    boilerplate),
  *  - drop pages containing "lorem ipsum" or a curly brace `{`
  *    (placeholder text / code markup),
  *  - drop pages with fewer than `minKeptLines` surviving lines.
  *
  * Scale shape: identical to GopherRules — every rule is a Column
  * higher-order function over the line array (split / filter /
  * array_join), the whole operator is ONE narrow projection inside
  * WholeStageCodegen: no explode, no shuffle, no join, no UDF. At
  * 100 TB this runs at scan speed. Per-page counters (`n_lines`,
  * `n_kept_lines`, rule booleans) ride along for drop-reason ablation.
  *
  * Determinism: pure string/integer ops, mirrored verbatim in SQL.
  */
object C4Rules {

  val TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"")

  /** True iff the trimmed line survives the C4 line rules. */
  private def lineKeep(l: Column, minLineWords: Int): Column = {
    val t = trim(l)
    val lastChar = t.substr(length(t), lit(1))
    val words = filter(split(t, " "), w => w =!= "")
    lastChar.isin(TerminalPunct: _*) &&
      size(words) >= minLineWords &&
      !contains(lower(t), lit("javascript"))
  }

  /** Per-page cleaning verdict + cleaned text. Input pages hold
    * newline-separated lines in `textCol`. Output: (doc_id, n_lines,
    * n_kept_lines, has_lorem, has_brace, page_keep, cleaned_text) where
    * cleaned_text is the kept lines re-joined (empty when the page is
    * dropped).
    */
  def c4Filter(pages: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    pages
      .select(
        col(idCol).as("doc_id"),
        lines.as("lines"),
        contains(lower(col(textCol)), lit("lorem ipsum")).as("has_lorem"),
        contains(col(textCol), lit("{")).as("has_brace"))
      .select(
        col("doc_id"),
        size(col("lines")).as("n_lines"),
        filter(col("lines"), l => lineKeep(l, minLineWords)).as("kept"),
        col("has_lorem"), col("has_brace"))
      .select(
        col("doc_id"), col("n_lines"),
        size(col("kept")).as("n_kept_lines"),
        col("has_lorem"), col("has_brace"),
        (size(col("kept")) >= minKeptLines && !col("has_lorem") &&
          !col("has_brace")).as("page_keep"),
        when(size(col("kept")) >= minKeptLines && !col("has_lorem") &&
            !col("has_brace"),
          array_join(transform(col("kept"), l => trim(l)), "\n"))
          .otherwise(lit("")).as("cleaned_text"))
  }
}
