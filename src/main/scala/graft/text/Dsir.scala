package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): score every document by how much more likely its
  * hashed n-gram features are under a TARGET distribution (the
  * high-quality slice you want more of) than under the raw corpus —
  * `w(doc) = Σ_f [ln p_t(bucket(f)) − ln p_s(bucket(f))]` over unigram
  * + bigram features hashed into a fixed bucket table, with add-one
  * smoothing. Pipelines resample by this weight to tilt a 100 TB crawl
  * toward the target domain without training a classifier.
  *
  * Determinism: the per-bucket log-ratio is quantized to micro-nats
  * (`floor((ln p_t − ln p_s)·1e6)` as a long, the [[UnigramLm]]
  * contract) so the per-document aggregate is an order-free integer
  * sum that hash-matches DuckDB exactly.
  *
  * Scale: the feature explode is one linear pass; the bucket table has
  * a FIXED size (`buckets` rows, corpus-independent) so it broadcasts —
  * scoring is a map-side join, no shuffle beyond the per-doc groupBy.
  * Only the two scalar totals cross-join in.
  */
object Dsir {

  val MicroNats = 1e6

  /** Unigram+bigram feature strings of a token-array column
    * (element_at pairs, not slice+concat_ws — no per-element array
    * allocation in the hot explode).
    */
  private def features(toks: Column): Column = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2))))
      .otherwise(typedlit(Seq.empty[String]))
    concat(toks, bigrams)
  }

  /** One row per doc with ≥1 feature: `doc_id`, `is_target`,
    * `n_feats`, `sum_micro_nats` (integer sum of quantized per-feature
    * log ratios), `avg_logratio` (nats, rounded to 6).
    *
    * The md5-chain portable hash runs over the DISTINCT-feature
    * relation only (vocabulary-scale), never per occurrence: feature
    * counts aggregate on the raw strings first (the [[UnigramLm]] join
    * shape), buckets and log-ratios attach to that table, and scoring
    * rejoins occurrences on the string key. Hashing each occurrence
    * was measured 6× slower at bench scale — same results, same
    * oracle, wrong place to spend the hash.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    val occ = docs.select(col(idCol).as("doc_id"),
        isTarget.as("is_target"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("is_target"),
        explode(features(col("toks"))).as("f"))
    // ONE pass over the occurrence explode: roll up to per-(doc,
    // feature) counts first — the relation every later step reads.
    // Materialized eagerly because BOTH the vocabulary rollup and the
    // final scoring join consume it; left lazy, the corpus-wide explode
    // would run twice (this is the LM-table artifact a pipeline
    // persists anyway at corpus scale).
    val docFeat = occ
      .groupBy(col("doc_id"), col("is_target"), col("f"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    // vocabulary-scale: per-feature counts, then the hash ONCE per
    // distinct feature; bucket table rolls up from it. Checkpointed —
    // it feeds both the bucket rollup and the per-feature score map.
    val featCounts = docFeat.groupBy(col("f"))
      .agg(sum(col("n")).as("fcs"),
        sum(when(col("is_target"), col("n")).otherwise(0L)).as("fct"))
      .withColumn("b",
        pmod(PortableHash.hash60(lit("dsir"), col("f")), lit(buckets.toLong)))
      .localCheckpoint(true)
    val table = featCounts.groupBy(col("b"))
      .agg(sum(col("fcs")).as("cs"), sum(col("fct")).as("ct"))
    val totals = table.agg(sum(col("cs")).as("ts"), sum(col("ct")).as("tt"))
    val rates = table.crossJoin(broadcast(totals))
      .withColumn("qlr",
        floor((log((col("ct") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("cs") + 1).cast("double") / (col("ts") + buckets)))
          * MicroNats).cast("long"))
      .select(col("b"), col("qlr"))
    // feature -> bucket log-ratio (vocabulary-scale; rates is a fixed
    // `buckets`-row table so ITS join broadcasts), then one string
    // equi-join scores the occurrences
    val featRates = featCounts.select(col("f"), col("b"))
      .join(broadcast(rates), Seq("b"))
      .select(col("f"), col("qlr"))
    docFeat.join(featRates, Seq("f"))
      .groupBy(col("doc_id"), col("is_target"))
      .agg(sum(col("n")).cast("int").as("n_feats"),
        sum(col("qlr") * col("n")).as("sum_micro_nats"))
      .withColumn("avg_logratio",
        round(col("sum_micro_nats").cast("double") / col("n_feats")
          / MicroNats, 6))
  }
}
