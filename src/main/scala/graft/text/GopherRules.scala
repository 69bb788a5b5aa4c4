package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style rule-based quality filtering (Rae et al. 2021,
  * arXiv:2112.11446 Table A1; the Dolma/FineWeb lineage) — the cheap
  * heuristic gate a pipeline runs BEFORE any model-based scoring:
  * document length bounds, mean word length bounds, lexical diversity
  * (distinct-token fraction, the repetition rule), and minimum stopword
  * evidence (the "is this prose at all" rule).
  *
  * Scale shape: every signal is a Column higher-order function over the
  * token array — size / aggregate / array_distinct / filter — so the
  * whole operator is ONE narrow map inside WholeStageCodegen: no
  * explode, no shuffle, no join. At 100 TB this runs at scan speed; the
  * per-rule booleans ride along so a pipeline can report WHY documents
  * were dropped (rule ablation is a standard curation diagnostic).
  *
  * Determinism: counts and lengths are integers; the two ratios are
  * single double divisions rounded to 6, mirrored verbatim in SQL.
  */
object GopherRules {

  def gopherFilter(docs: DataFrame, idCol: String, textCol: String,
      stopwords: Seq[String],
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minDistinctFrac: Double = 0.4, minStopwords: Int = 2): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val stopArr = typedlit(stopwords)
    def r6(c: Column): Column = round(c, 6)
    docs
      .select(col(idCol).as("doc_id"),
        filter(toks, t => t =!= "").as("toks"))
      .filter(size(col("toks")) > 0)
      .select(
        col("doc_id"),
        size(col("toks")).as("n_words"),
        r6(aggregate(transform(col("toks"), t => length(t)), lit(0),
          (acc, x) => acc + x).cast("double") / size(col("toks")))
          .as("mean_word_len"),
        r6(size(array_distinct(col("toks"))).cast("double") /
          size(col("toks"))).as("distinct_frac"),
        size(filter(col("toks"), t => array_contains(stopArr, t)))
          .as("n_stopwords"))
      .select(
        col("doc_id"), col("n_words"), col("mean_word_len"),
        col("distinct_frac"), col("n_stopwords"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("ok_length"),
        (col("mean_word_len") >= minMeanLen &&
          col("mean_word_len") <= maxMeanLen).as("ok_word_len"),
        (col("distinct_frac") >= minDistinctFrac).as("ok_diversity"),
        (col("n_stopwords") >= minStopwords).as("ok_stopwords"))
      .withColumn("keep",
        col("ok_length") && col("ok_word_len") && col("ok_diversity") &&
          col("ok_stopwords"))
  }
}
