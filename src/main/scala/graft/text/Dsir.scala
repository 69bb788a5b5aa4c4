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

  /** Hashed unigram+bigram bucket ids of a token-array column. */
  private def featureBuckets(toks: Column, buckets: Int): Column = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", slice(toks, i, lit(2)))))
      .otherwise(typedlit(Seq.empty[String]))
    transform(concat(toks, bigrams),
      f => pmod(PortableHash.hash60(lit("dsir"), f), lit(buckets.toLong)))
  }

  /** One row per doc with ≥1 feature: `doc_id`, `is_target`,
    * `n_feats`, `sum_micro_nats` (integer sum of quantized per-feature
    * log ratios), `avg_logratio` (nats, rounded to 6).
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    val occ = docs.select(col(idCol).as("doc_id"),
        isTarget.as("is_target"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("is_target"),
        explode(featureBuckets(col("toks"), buckets)).as("b"))
    val table = occ.groupBy(col("b"))
      .agg(count(lit(1)).as("cs"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("ct"))
    val totals = table.agg(sum(col("cs")).as("ts"), sum(col("ct")).as("tt"))
    val rates = table.crossJoin(broadcast(totals))
      .withColumn("qlr",
        floor((log((col("ct") + 1).cast("double") / (col("tt") + buckets)) -
          log((col("cs") + 1).cast("double") / (col("ts") + buckets)))
          * MicroNats).cast("long"))
      .select(col("b"), col("qlr"))
    occ.join(broadcast(rates), Seq("b"))
      .groupBy(col("doc_id"), col("is_target"))
      .agg(count(lit(1)).cast("int").as("n_feats"),
        sum(col("qlr")).as("sum_micro_nats"))
      .withColumn("avg_logratio",
        round(col("sum_micro_nats").cast("double") / col("n_feats")
          / MicroNats, 6))
  }
}
