package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Main-content extraction from HTML pages — the web-pipeline stage
  * between the raw crawl and the document-level filters ([[C4Rules]],
  * [[GopherRules]] assume extraction already happened). The heuristic
  * is the jusText/Boilerpipe family's core signal: split the page into
  * BLOCKS at closing block-tag boundaries, then keep blocks with
  * enough visible words and LOW LINK DENSITY (anchor-text chars over
  * visible chars) — navigation, menus, and footers are mostly links,
  * body prose is mostly not.
  *
  * Scale shape: the whole operator is ONE narrow projection of array
  * higher-order functions over the block split (regex split /
  * per-block transform / filter / fold) inside WholeStageCodegen — no
  * explode, no shuffle, no join, no UDF. At 100 TB this runs at scan
  * speed next to the parquet reader.
  *
  * Determinism: pure regex/string/integer ops (lowercase tag grammar;
  * the lazy-quantifier anchor pattern behaves identically in Java and
  * RE2 regex engines), mirrored verbatim in the DuckDB oracle. The
  * density division is double on both sides and only ever compared,
  * never emitted.
  */
object HtmlExtract {

  /** Closing tags that end a content block (lowercase grammar). */
  val BlockCloseRe = "</(?:p|div|li|h[1-6]|td|section|article)>"

  /** Anchor inner text (group 1), non-greedy within one block. */
  val AnchorRe = "<a[^>]*>(.*?)</a>"

  /** Per-page extraction. Output: (doc_id, n_blocks, n_kept,
    * n_words_kept, main_text) where main_text joins kept blocks'
    * visible text with newlines in document order. Blocks with no
    * visible text at all are not counted.
    */
  def extract(pages: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5, maxLinkDensity: Double = 0.33): DataFrame = {
    def visibleOf(b: Column): Column =
      trim(regexp_replace(
        regexp_replace(b, lit("<[^>]*>"), lit(" ")), lit(" +"), lit(" ")))
    def anchorCharsOf(b: Column): Column =
      aggregate(
        transform(regexp_extract_all(b, lit(AnchorRe), lit(1)),
          s => length(s)),
        lit(0), (a, x) => a + x)
    val per = transform(split(col(htmlCol), BlockCloseRe), b =>
      struct(visibleOf(b).as("v"),
        anchorCharsOf(b).as("ac")))
    pages
      .select(col(idCol).as("doc_id"), per.as("bl0"))
      .select(col("doc_id"),
        filter(col("bl0"), x => x("v") =!= "").as("bl"))
      .select(col("doc_id"),
        size(col("bl")).cast("int").as("n_blocks"),
        filter(col("bl"), x =>
          size(split(x("v"), " ")) >= minWords &&
            x("ac").cast("double") / greatest(length(x("v")), lit(1))
              <= maxLinkDensity).as("kept"))
      .select(col("doc_id"), col("n_blocks"),
        size(col("kept")).cast("int").as("n_kept"),
        aggregate(transform(col("kept"), x => size(split(x("v"), " "))),
          lit(0), (a, x) => a + x).cast("int").as("n_words_kept"),
        array_join(transform(col("kept"), x => x("v")), "\n")
          .as("main_text"))
  }
}
