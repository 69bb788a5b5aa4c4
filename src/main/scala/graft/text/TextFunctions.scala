package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Text-analysis primitives for the training-data pipeline: normalization,
  * tokenization, shingling, quality features, language-ID scoring, and
  * document fingerprints. Everything is a Column expression (codegen'd,
  * distributed); every function has a DuckDB SQL mirror so results are
  * oracle-checkable.
  *
  * Reference semantics: tokenizer/quality heuristics generalize
  * mcp-vector-search's BM25 tokenizer (`core/bm25_backend.py:297-375`) and
  * result-quality scoring (`core/models.py:470-506`); fingerprints
  * generalize its sha256 chunk ids (`core/models.py:292-303`).
  */
object TextFunctions {

  /** Language marker lexicons for the n-gram/stopword language-ID heuristic.
    * Order is the deterministic tie-break (first wins).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("a", "the", "and", "fast", "slow", "small", "key", "value"),
    "de" -> Seq("der", "die", "das", "und", "schnell"),
    "fr" -> Seq("le", "la", "les", "et", "vite"),
    "es" -> Seq("el", "los", "las", "y", "rapido"),
    "zh" -> Seq("de", "shi", "he"))

  /** lower → strip non-alphanumerics → collapse runs of spaces → trim,
    * as the native fused [[graft.functions.AsciiNormalize]] expression
    * (one byte walk; the previous two-regexp_replace chain measured
    * ~6 s/pass over the stress x30 corpus and fronted most text
    * operators). `AsciiNormalizeSpec` pins bit-equality against the
    * regex chain; DuckDB mirrors keep the regex form.
    */
  def normalize(text: Column): Column = {
    graft.functions.GraftFunctions.ensure("graft_normalize",
      exprs => graft.functions.AsciiNormalize(exprs.head))
    call_function("graft_normalize", text)
  }

  /** The regex-chain reference implementation of [[normalize]] (kept
    * for parity testing — must stay semantically identical).
    */
  def normalizeRegex(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  def normalizeSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower($e), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  def tokensSql(e: String): String = s"string_split(${normalizeSql(e)}, ' ')"

  /** Distinct word k-shingles (space-joined k-grams of tokens), via the
    * fused native [[graft.functions.TokenKGrams]] pass (the HOF chain —
    * transform + slice + concat_ws + array_distinct — runs interpreted
    * per element; see AsciiNormalizeSpec for the pinned parity).
    * Arrays shorter than k yield an empty array.
    */
  def shingles(toks: Column, k: Int): Column = {
    graft.functions.GraftFunctions.ensure(s"graft_kgrams_$k",
      exprs => graft.functions.TokenKGrams(exprs.head, k))
    call_function(s"graft_kgrams_$k", toks)
  }

  /** The HOF reference implementation of [[shingles]] (parity tests
    * only). Callers must pre-filter docs with fewer than k tokens
    * (Spark's `sequence` would otherwise generate a descending range).
    */
  def shinglesHof(toks: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), size(toks) - (k - 1)),
      i => concat_ws(" ", slice(toks, i, lit(k)))))

  def shinglesSql(toksExpr: String, k: Int): String =
    s"list_distinct(list_transform(range(1, len($toksExpr) - ${k - 2}), " +
      s"i -> array_to_string($toksExpr[i:i+${k - 1}], ' ')))"

  /** Marker-hit count for one language over a token array. */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => lit(m)): _*)))

  def markerHitsSql(toksExpr: String, markers: Seq[String]): String = {
    val inList = markers.map(m => s"'$m'").mkString(", ")
    s"len(list_filter($toksExpr, t -> t IN ($inList)))"
  }

  /** Predicted language: argmax marker hits, ties broken by LangMarkers
    * order, 'und' (undetermined) when no marker matches at all.
    */
  def langId(toks: Column): Column = {
    // Bind the token array, then the 5-element score vector, as lambda
    // variables of nested single-element transforms — each is computed
    // exactly ONCE per row and every downstream reference is a variable
    // read. (A naive when/greatest chain inlines the tokenize+filter
    // subtree ~30× per row; that was a 23 s/5k-row query.)
    val langs = array(LangMarkers.map { case (l, _) => lit(l) }: _*)
    element_at(transform(array(toks), ts => {
      val scores = array(LangMarkers.map { case (_, ms) => markerHits(ts, ms) }: _*)
      element_at(transform(array(scores), sc =>
        when(array_max(sc) <= 0, lit("und"))
          .otherwise(element_at(langs,
            // array_position returns the FIRST index of the max, so ties
            // break by LangMarkers order — same as the SQL mirror's CASE.
            array_position(sc, array_max(sc)).cast("int")))), lit(1))
    }), lit(1))
  }

  def langIdSql(toksExpr: String): String = {
    val scores = LangMarkers.map { case (lang, ms) => lang -> markerHitsSql(toksExpr, ms) }
    val best = "greatest(" + scores.map(_._2).mkString(", ") + ")"
    val cases = scores.map { case (lang, sc) =>
      s"WHEN ($sc) = ($best) AND ($best) > 0 THEN '$lang'"
    }.mkString(" ")
    s"(CASE $cases ELSE 'und' END)"
  }

  /** sha256 hex fingerprint of the normalized text (exact-dup key). */
  def fingerprintSha(text: Column): Column = sha2(normalize(text), 256)

  def fingerprintShaSql(e: String): String = s"sha256(${normalizeSql(e)})"

  /** 60-bit rolling-hash-style fingerprint (portable across engines). */
  def fingerprint60(text: Column): Column =
    PortableHash.hash60(normalize(text), seed = 0)

  def fingerprint60Sql(e: String): String =
    PortableHash.hash60Sql("0", normalizeSql(e))
}
