package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NLP enrichment fields of CodeChunk (`core/nlp_extractor.py:22+`,
  * `core/models.py:250-253`): keywords, backtick code references,
  * technical terms. The reference uses YAKE; here a RAKE-style
  * frequency heuristic over Column expressions — deterministic,
  * codegen'd, model-free (SURVEY §2.8: "keywords via RAKE-style
  * frequency, no model").
  */
object NlpExtract {

  val Stopwords: Seq[String] = Seq(
    "a", "an", "the", "and", "or", "not", "of", "in", "on", "to", "for",
    "with", "is", "are", "was", "be", "this", "that", "it", "as", "by",
    "at", "from", "if", "else", "return", "def", "class", "import",
    "self", "none", "true", "false", "new", "var", "val", "let", "const")

  val TechnicalTerms: Seq[String] = Seq(
    "api", "sql", "http", "https", "json", "xml", "yaml", "regex",
    "cache", "thread", "async", "socket", "index", "schema", "shard",
    "partition", "vector", "embedding", "database", "queue", "hash",
    "token", "parser", "compiler", "kernel", "cluster", "graph")

  /** Backtick-quoted code references: `foo.bar()` → foo.bar(). */
  def codeRefs(text: Column): Column =
    array_distinct(transform(
      regexp_extract_all(text, lit("`([^`]+)`"), lit(1)),
      x => trim(x)))

  /** Technical-term hits (dictionary intersection, order-preserving). */
  def technicalTerms(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    array_distinct(filter(toks, t => t.isin(TechnicalTerms.map(lit(_)): _*)))
  }

  /** Top-k keywords by term frequency, stopwords and short tokens
    * dropped; ties broken alphabetically for determinism.
    */
  def keywords(text: Column, k: Int = 8): Column = {
    val toks = filter(TextFunctions.tokens(text),
      t => !t.isin(Stopwords.map(lit(_)): _*) && length(t) >= 3)
    // frequency map → (count, token) pairs → sort desc-count, asc-token
    val freq = aggregate(
      toks,
      map().cast("map<string,int>"),
      (m, t) => map_concat(
        map_filter(m, (key, _) => key =!= t),
        map(t, coalesce(element_at(m, t), lit(0)) + 1)))
    val pairs = transform(map_entries(freq),
      e => struct((-e.getField("value")).as("neg"), e.getField("key").as("tok")))
    slice(transform(array_sort(pairs), p => p.getField("tok")), 1, k)
  }
}
