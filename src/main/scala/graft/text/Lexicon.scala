package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Severity-weighted lexicon scoring — the wordlist content filter every
  * web-scale training pipeline runs beside the statistical ones (C4 drops
  * pages on a banned-word list outright, arXiv:1910.10683 §2.2; later
  * pipelines keep a weighted score so borderline pages can be routed to a
  * classifier instead of dropped). Complements [[C4Rules]] (structural)
  * and [[GopherRules]] (statistical): this is the *content-policy* rule.
  *
  * Semantics per document:
  *   - each lexicon entry is a (term, severity) pair; a term is a single
  *     token or a space-joined n-gram phrase matched over the normalized
  *     token sequence (token hits and phrase hits count independently —
  *     the standard lexicon convention, where "slow" and "slow scan" are
  *     separate policy entries),
  *   - `hits` / `weighted` = plain and severity-weighted occurrence
  *     totals; `top_sev` = highest severity with ≥1 hit (0 when clean),
  *   - `score` = weighted hits per token,
  *   - verdict: any hit at severity ≥ `blockSev` blocks outright (the
  *     single-slur rule), else `score ≥ tauBlock` blocks,
  *     `score ≥ tauFlag` flags for classifier review, else allow.
  *
  * Scale shape: the lexicon is inlined into the plan as literal CASE
  * arms, so the whole operator is ONE narrow projection of array
  * higher-order functions inside WholeStageCodegen — no explode, no
  * join, no shuffle, no UDF. At 100 TB this runs at scan speed and the
  * lexicon (10^2..10^4 entries in practice) costs zero memory beyond
  * the generated code; a lexicon too large to inline would switch to a
  * broadcast map join without changing the contract.
  *
  * Determinism: exact integer counts; the only division is the final
  * `round(weighted / n_toks, 6)`, mirrored verbatim in DuckDB.
  */
object Lexicon {

  /** Default policy lexicon (terms drawn from the synthetic corpus
    * vocabulary so fixtures exercise every severity; "crash" is absent
    * from the corpus and proves the zero-hit path).
    */
  val Default: Seq[(String, Int)] = Seq(
    "dup" -> 3, "crash" -> 3, "slow scan" -> 2, "slow" -> 1, "big" -> 1)

  /** Occurrence count of one lexicon term over a normalized token array:
    * single tokens via filter-count, n-gram phrases via a sliding window
    * of element-wise equality (positions are in bounds by construction,
    * so ANSI `element_at` cannot throw).
    */
  def termCount(toks: Column, term: String): Column = {
    val ws = term.split(' ')
    if (ws.length == 1) size(filter(toks, t => t === ws(0)))
    else when(size(toks) >= ws.length,
      size(filter(
        sequence(lit(1), size(toks) - (ws.length - 1)),
        i => ws.zipWithIndex.map { case (w, j) =>
          element_at(toks, (i + j).cast("int")) === w
        }.reduce(_ && _)))).otherwise(lit(0))
  }

  /** Per-document lexicon verdicts. Output: (doc_id, n_toks, hits,
    * weighted, top_sev, score, verdict) ordered by nothing (callers
    * order); one row per input row with ≥1 token.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      lexicon: Seq[(String, Int)] = Default,
      tauFlag: Double = 0.06, tauBlock: Double = 0.12,
      blockSev: Int = 3): DataFrame = {
    val counted = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id") +: size(col("toks")).cast("int").as("n_toks") +:
        lexicon.zipWithIndex.map { case ((term, _), i) =>
          termCount(col("toks"), term).cast("int").as(s"c$i")
        }: _*)
    val hits = lexicon.indices.map(i => col(s"c$i")).reduce(_ + _)
    val weighted = lexicon.zipWithIndex
      .map { case ((_, sev), i) => col(s"c$i") * sev }.reduce(_ + _)
    val topSev = greatest(lexicon.zipWithIndex.map { case ((_, sev), i) =>
      when(col(s"c$i") > 0, sev).otherwise(0)
    }: _*)
    val blockHits = lexicon.zipWithIndex
      .collect { case ((_, sev), i) if sev >= blockSev => col(s"c$i") }
      .reduceOption(_ + _).getOrElse(lit(0))
    counted
      .select(col("doc_id"), col("n_toks"),
        hits.as("hits"), weighted.as("weighted"), topSev.as("top_sev"),
        round(weighted.cast("double") / col("n_toks"), 6).as("score"),
        blockHits.as("bh"))
      .withColumn("verdict",
        when(col("bh") > 0 || col("score") >= tauBlock, "block")
          .when(col("score") >= tauFlag, "flag")
          .otherwise("allow"))
      .drop("bh")
  }

  /** DuckDB mirror of [[termCount]] over a token-list expression. */
  def termCountSql(toksExpr: String, term: String): String = {
    val ws = term.split(' ')
    if (ws.length == 1)
      s"len(list_filter($toksExpr, t -> t = '${ws(0)}'))"
    else {
      val conds = ws.zipWithIndex
        .map { case (w, j) => s"$toksExpr[i + $j] = '$w'" }.mkString(" AND ")
      s"CASE WHEN len($toksExpr) >= ${ws.length} THEN " +
        s"len(list_filter(range(1, len($toksExpr) - ${ws.length - 2}), " +
        s"i -> $conds)) ELSE 0 END"
    }
  }
}
