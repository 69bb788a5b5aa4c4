package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Q10 cross-encoder rerank stage (`core/reranker.py:22-173`, applied in
  * `core/search.py:1230-1299`).
  *
  * The reference scores (query, document) pairs jointly with a small
  * cross-encoder model, sigmoids the raw logit into [0,1], REPLACES the
  * similarity score, and keeps limit×3 candidates for MMR. The model is
  * pluggable (`model_name` constructor arg); here the plug point is
  * `PairScorer`, and the default is a deterministic fixed-weight linear
  * model over query-document interaction features — the same features a
  * lexical cross-encoder attends to (term coverage, phrase and bigram
  * hits, match position, length prior). No model weights ship in this
  * environment; ordering quality of the default scorer is asserted
  * against a labeled fixture in RerankSpec.
  *
  * Everything is column algebra: the per-pair scoring is codegen'd and
  * runs where the candidates live; no driver loop, no UDF.
  */
trait PairScorer {
  /** Raw relevance logit for (query, document-content column). */
  def logit(query: String, doc: Column): Column
}

object FeatureScorer extends PairScorer {

  def logit(query: String, doc: Column): Column = {
    val qToks = Tokenizer.tokenize(QueryProcessor.preprocess(query)).distinct
    if (qToks.isEmpty) return lit(0.0)
    val content = lower(doc)

    // term coverage: fraction of query terms present (substring match —
    // identifier queries like build_index must also hit build/index
    // subwords and vice versa, the way a subword-tokenizing model does)
    val hits = qToks.map(t => when(instr(content, t) > 0, 1).otherwise(0))
      .reduce(_ + _)
    val coverage = hits.cast("double") / qToks.length

    // exact phrase and adjacent-bigram hits (order sensitivity — the main
    // thing a cross-encoder adds over bag-of-words similarity)
    val phrase =
      if (qToks.length >= 2)
        when(content.contains(qToks.mkString(" ")), 1.0).otherwise(0.0)
      else lit(0.0)
    val bigrams = qToks.sliding(2).filter(_.length == 2).toSeq
    val bigramCov =
      if (bigrams.isEmpty) lit(0.0)
      else bigrams.map(b => when(content.contains(b.mkString(" ")), 1.0)
        .otherwise(0.0)).reduce(_ + _) / bigrams.length

    // positional prior: average per-term position decay — a definition
    // leads with the identifier, a passing mention buries it. Missing
    // terms contribute 0.
    val early = qToks.map { t =>
      val pos = instr(content, t)
      when(pos > 0, lit(1.0) / (lit(1.0) + pos.cast("double") / 100.0))
        .otherwise(lit(0.0))
    }.reduce(_ + _) / qToks.length

    // mild short-document prior (focused chunks over walls of text)
    val lenPrior = lit(1.0) / (lit(1.0) + length(content).cast("double") / 2000.0)

    lit(-3.0) + coverage * 4.0 + phrase * 1.5 + bigramCov * 1.5 +
      early * 0.8 + lenPrior * 0.4
  }
}

object Rerank {

  /** Apply the rerank stage: sigmoid(logit) REPLACES the ranking score
    * (reference semantics), candidates cut to keepN (= limit×3 upstream)
    * with a scale-safe top-k.
    */
  def apply(results: DataFrame, query: String, keepN: Int,
      scorer: PairScorer = FeatureScorer): DataFrame = {
    val scored = results.withColumn("rerank_score",
      lit(1.0) / (lit(1.0) + exp(-scorer.logit(query, col("content")))))
    Fusion.ranked(scored, "chunk_id", "rerank_score", keepN)
  }
}
