package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing and repetition signals — the two remaining standard
  * hygiene passes of large-corpus pipelines (C4/Gopher/Dolma lineage):
  * detect/redact personal identifiers, and score pathological
  * repetition (boilerplate, scraped templates) for quality filtering.
  *
  * Everything is a codegen'd column expression over a regex/arithmetic
  * subset both Java regex and RE2 interpret identically (no lookaround,
  * no backrefs), so the DuckDB oracle shares the literal patterns.
  */
object Scrub {

  /** (kind, pattern, replacement) in REDACTION ORDER — order matters for
    * overlapping matches (SSN before phone: a bare phone pattern would
    * eat SSN digit runs), and the oracle applies the same chain.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\+[0-9][0-9 -]{7,14}[0-9]", "<PHONE>"))

  /** Per-kind match counts as columns named `n_<kind>`. */
  def piiCountCols(text: Column): Seq[Column] =
    PiiPatterns.map { case (kind, rx, _) =>
      size(regexp_extract_all(text, lit(rx), lit(0))).as(s"n_$kind")
    }

  /** The redaction chain, applied in `PiiPatterns` order. */
  def redact(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (_, rx, repl)) =>
      regexp_replace(acc, rx, repl)
    }

  /** Repetition signals per document:
    *  - dup_line_frac: fraction of non-unique lines (template/boilerplate
    *    indicator), 0 when the doc has ≤ 1 line;
    *  - top_bigram_frac: share of all word bigrams taken by the most
    *    frequent one (scraped-repetition indicator), 0 when < 1 bigram.
    * Exact integer ratios — portable to the oracle bit-for-bit.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val lines = split(col(textCol), "\n")
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("n_lines", size(lines))
      .withColumn("n_distinct_lines", size(array_distinct(lines)))
      .withColumn("dup_line_frac",
        when(col("n_lines") > 1,
          (col("n_lines") - col("n_distinct_lines")).cast("double") /
            col("n_lines"))
          .otherwise(0.0))
    val toks = TextFunctions.tokens(col("text"))
    val bigrams = base.select(col("doc_id"),
      explode(array_compact(zip_with(toks,
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b)))).as("bg"))
    val top = bigrams.groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("total_c"))
      .withColumn("top_bigram_frac",
        col("top_c").cast("double") / col("total_c"))
    base.join(top.select(col("doc_id"), col("top_bigram_frac")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"), col("n_distinct_lines"),
        round(col("dup_line_frac"), 6).as("dup_line_frac"),
        round(coalesce(col("top_bigram_frac"), lit(0.0)), 6)
          .as("top_bigram_frac"))
  }
}
