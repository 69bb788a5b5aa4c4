package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Linear quality classifier over hashed n-gram features — the
  * fasttext-shaped (Joulin et al. 2016) "model-based quality filter"
  * stage of a training-data pipeline (CCNet/GPT-3 lineage: a linear
  * model over hashed unigrams+bigrams scores each document against a
  * high-quality target domain, and the pipeline keeps docs above a
  * probability threshold).
  *
  * The MODEL is input data, not code: a (bucket, w_micro) weight
  * relation — trained offline, loaded like any table, broadcast at
  * scoring time (2^b rows, constant in corpus size). Scoring is the
  * [[Dsir]] feature shape: hashed unigram+bigram buckets, the
  * occurrence-scale explode aggregates per doc FIRST on raw feature
  * strings (vocabulary-scale hashing, never per occurrence), then the
  * mean-pooled logit goes through the sigmoid.
  *
  * Determinism contract: weights are integer micro-units and the
  * per-doc sum is an exact integer; the only float steps are the final
  * mean, sigmoid, and round(6) — single IEEE-double ops both engines
  * agree on.
  */
object QualityClassifier {

  /** Unigram+bigram feature strings (the Dsir construction). */
  private def features(toks: Column): Column = {
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit(" "),
          element_at(toks, i + 2))))
      .otherwise(typedlit(Seq.empty[String]))
    concat(toks, bigrams)
  }

  /** A deterministic stand-in for a trained weight table: w_micro(b) =
    * (hash60("qw", b) mod 2001) − 1000 ∈ [−1000, 1000] micro-units.
    * Real deployments load trained weights from a table; the hash
    * derivation exists so gates/oracles can rebuild the identical
    * "model" from nothing.
    */
  def hashWeights(spark: org.apache.spark.sql.SparkSession,
      buckets: Int): DataFrame =
    spark.range(buckets).select(col("id").cast("long").as("b"),
      (pmod(PortableHash.hash60(lit("qw"), col("id").cast("long")),
        lit(2001L)) - 1000L).as("w_micro"))

  /** Score docs against a weight relation: (doc_id, n_features,
    * logit_micro, score, keep). logit = bias + mean(feature weights);
    * keep = score ≥ threshold.
    *
    * CALIBRATION: `score` is FAST-SIGMOID-squashed — 1/2 + z/(2(1+|z|))
    * — not a logistic probability. The two agree in ordering and at the
    * 0.5 decision point exactly, but differ elsewhere (logit 1 scores
    * 0.75 here vs 0.731 logistic), so a `threshold` other than 0.5 is
    * NOT comparable to a logistic-calibrated cutoff (or to any score
    * produced before this squashing was adopted) — recalibrate
    * thresholds against this scale.
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, buckets: Int, biasMicro: Long = 0L,
      threshold: Double = 0.5): DataFrame = {
    val occ = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(features(col("toks"))).as("f"))
    // per-feature doc counts on the raw strings first; the md5-chain
    // hash runs once per DISTINCT feature (vocabulary-scale), not per
    // (doc, feature) row — buckets rejoin on the string key
    val perDocFeat = occ.groupBy(col("doc_id"), col("f"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds the feature vocabulary AND scoring
    val featBuckets = perDocFeat.select(col("f")).distinct()
      .withColumn("b",
        pmod(PortableHash.hash60(lit("qf"), col("f")), lit(buckets.toLong)))
    val scored = perDocFeat
      .join(featBuckets, Seq("f"))
      .join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).cast("long").as("n_features"),
        sum(col("n") * col("w_micro")).cast("long").as("w_sum_micro"))
    val logit = (lit(biasMicro) + col("w_sum_micro") / col("n_features"))
      .cast("double") / 1000000.0
    // fast-sigmoid squashing 1/2 + z/(2(1+|z|)) — monotone, symmetric,
    // 0.5 at zero logit, and PURE IEEE arithmetic: exp's last-ulp
    // behavior is not an engine-portable contract (the LogisticTrain
    // rule applied to inference), so the oracle mirrors bit-for-bit
    val score =
      lit(0.5) + logit / (lit(2.0) * (lit(1.0) + abs(logit)))
    scored
      .withColumn("score", round(score, 6))
      .withColumn("keep", col("score") >= threshold)
      .select(col("doc_id"), col("n_features"), col("w_sum_micro"),
        col("score"), col("keep"))
  }
}
