package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-hygiene screening: control characters, U+FFFD replacement
  * characters (the scar tissue of a bad decode), and the non-ASCII
  * ratio — the mojibake/binary-spill detector that runs before any
  * language-level quality rule can be trusted (a page full of
  * replacement characters happily passes length and stopword checks).
  *
  * Counting idiom: `length(s) - length(translate(s, chars, ''))` —
  * translate-removal is a plain string op available verbatim in both
  * engines, so no regex-dialect risk for the character-class counts;
  * only the non-ASCII count needs a (portable, hex-escaped) regex.
  *
  * Unit contract: every count is in Unicode CODE POINTS in both engines
  * — Spark `length` counts UTF8String chars and Java regex removes a
  * supplementary character as one code point, matching DuckDB's
  * code-point `length`/RE2 exactly (EncodingQcSpec's emoji cases pin
  * this; the gar1 fixture's %7==2 class gates it against DuckDB).
  *
  * Scale shape: one narrow codegen projection; no explode, no shuffle.
  */
object EncodingQc {

  /** Control characters screened (C0 set minus \t \n \r; NUL excluded
    * so the oracle's SQL literal never carries a 0 byte).
    */
  val CtrlChars: String =
    (0x01 to 0x1f).filterNot(Seq(0x09, 0x0a, 0x0d).contains)
      .map(_.toChar).mkString

  val ReplacementChar = "�"

  private def removedCount(s: Column, chars: String): Column =
    (length(s) - length(translate(s, chars, ""))).cast("int")

  /** Per-doc hygiene verdict: (doc_id, n_chars, n_ctrl, n_repl,
    * n_nonascii, nonascii_ratio, verdict) — `flag` when any ctrl or
    * replacement char is present or non-ASCII exceeds `tauNonAscii`.
    */
  def screen(docs: DataFrame, idCol: String, textCol: String,
      tauNonAscii: Double = 0.3): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol).as("doc_id"),
        length(t).cast("int").as("n_chars"),
        removedCount(t, CtrlChars).as("n_ctrl"),
        removedCount(t, ReplacementChar).as("n_repl"),
        (length(t) - length(regexp_replace(t, "[^\\x00-\\x7f]", "")))
          .cast("int").as("n_nonascii"))
      .withColumn("nonascii_ratio",
        round(col("n_nonascii").cast("double") /
          greatest(col("n_chars"), lit(1)), 6))
      .withColumn("verdict",
        when(col("n_ctrl") > 0 || col("n_repl") > 0 ||
          col("nonascii_ratio") > tauNonAscii, "flag").otherwise("keep"))
  }
}
