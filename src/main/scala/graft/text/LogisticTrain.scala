package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Distributed, EXACTLY-deterministic logistic-regression training over
  * hashed text features — the trainable half of model-based quality
  * filtering ([[QualityClassifier]] scores a given weight table; this
  * is where a weight table comes from when labels exist).
  *
  * Classic logistic SGD is float-ordered and engine-divergent; this
  * trainer is full-batch gradient descent in INTEGER micro-unit
  * arithmetic end to end, so every epoch — not just the final scores —
  * hash-matches a SQL mirror:
  *
  *  - the sigmoid is the fast rational approximation
  *    σ̂(m) = 1/2 + m / (2·(1+|m|)) (Elliott 1993's tanh-family
  *    squashing function), computed as
  *    `500000 + sign(m)·((|m|·500000) div (10^6 + |m|))` — pure 64-bit
  *    integer ops, no exp, no last-ulp risk;
  *  - gradients are integer products (p_micro − y·10^6)·x summed
  *    order-free per bucket;
  *  - the update step divides through non-negative `div` with an
  *    explicit sign, so Spark's truncating `div` and DuckDB's flooring
  *    `//` agree.
  *
  * Scale shape: features explode once and roll up to a per-(doc,
  * bucket) count relation (materialized — every epoch reads it); each
  * epoch is two hash joins + two aggregations; the weight table
  * (`buckets` rows, corpus-independent) broadcasts. Epochs are a
  * driver loop over metadata-scale state, the [[graft.graph.PageRank]]
  * pattern applied to learning.
  */
object LogisticTrain {

  val Micro = 1000000L

  /** Hashed unigram count features (doc_id, b, x); the md5-chain hash
    * runs once per DISTINCT token (the Dsir shape). Materialized:
    * every training epoch reads it twice.
    */
  def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int, presence: Boolean = false,
      withBias: Boolean = false): DataFrame = {
    val occ = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
    val perDocTok = occ.groupBy(col("doc_id"), col("t"))
      .agg(count(lit(1)).as("n"))
    val tokB = perDocTok.select(col("t")).distinct()
      .withColumn("b",
        pmod(PortableHash.hash60(lit("lr"), col("t")), lit(buckets.toLong)))
    // presence features (x = #distinct tokens in the bucket) make every
    // corpus-wide token a pure bias shift — identical contribution to
    // every doc — so batch GD isn't swamped by shared-vocabulary mass
    // the way raw counts swamp it (measured: the count model needs
    // ~100 epochs where the presence model converges in 8)
    val xAgg = if (presence) count(lit(1)) else sum(col("n"))
    val base = perDocTok.join(tokB, Seq("t"))
      .groupBy(col("doc_id"), col("b")).agg(xAgg.cast("long").as("x"))
    // the bias term as feature #buckets (always-on x=1): without an
    // intercept an imbalanced class prior has to be absorbed by content
    // weights, which swamps the signal buckets (measured: all-majority
    // predictions); callers using it size the weight table buckets+1
    val withB =
      if (!withBias) base
      else base.unionByName(
        perDocTok.select(col("doc_id")).distinct()
          .select(col("doc_id"), lit(buckets.toLong).as("b"),
            lit(1L).as("x")))
    withB.localCheckpoint(true)
  }

  /** Margins and fast-sigmoid probabilities under a weight relation. */
  def predictMargins(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("x") * col("w_micro")).as("margin_micro"))
      .withColumn("p_micro",
        lit(500000L) + signum(col("margin_micro")).cast("long") *
          expr("(abs(margin_micro) * 500000) div (1000000 + abs(margin_micro))"))

  /** `epochs` rounds of full-batch GD; returns (b, w_micro). Step size
    * is etaNum/(n·etaDen) in micro units — integer throughout (the
    * division is sign-split so Spark's truncating `div` equals DuckDB's
    * flooring `//` on the non-negative magnitude).
    */
  def train(feats: DataFrame, labels: DataFrame, buckets: Int,
      epochs: Int, etaNum: Long = 1L, etaDen: Long = 1L): DataFrame = {
    val spark = feats.sparkSession
    val n = labels.count() // one metadata-scale scalar
    var w = spark.range(buckets)
      .select(col("id").as("b"), lit(0L).as("w_micro"))
      .localCheckpoint(true)
    var e = 0
    while (e < epochs) {
      val preds = predictMargins(feats, w)
      val g = feats
        .join(preds.select(col("doc_id"), col("p_micro")), Seq("doc_id"))
        .join(labels, Seq("doc_id"))
        .withColumn("gc", (col("p_micro") - col("y") * Micro) * col("x"))
        .groupBy(col("b")).agg(sum(col("gc")).as("g"))
      w = w.join(g, Seq("b"), "left")
        .na.fill(0L, Seq("g"))
        .select(col("b"),
          (col("w_micro") - signum(col("g")).cast("long") *
            expr(s"(abs(g) * $etaNum) div ${n * etaDen}")).as("w_micro"))
        .localCheckpoint(true) // `buckets` rows — metadata-scale
      e += 1
    }
    w
  }
}
