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
    // r12 static-relation discipline (see graft.graph.WalkLayout):
    // every epoch aggregates feats by doc_id and joins it back on
    // doc_id, so past the size gate the materialized relation gets the
    // hash(doc_id) checkpointed layout and both per-epoch corpus-scale
    // exchanges disappear (guide §2.4); below the gate (every sf gate:
    // 5k docs × ≤65 buckets) the layout is the plain materialization
    // the eager checkpoint produced, in the same one job.
    val (m, nRows) = graft.graph.WalkLayout.materializeCounted(withB)
    if (nRows >= graft.graph.WalkLayout.minRows(docs))
      graft.graph.WalkLayout.partitionedCheckpoint(m, "doc_id")
    else m
  }

  /** The fast-sigmoid probability expression over an integer margin —
    * shared by the weight-relation scorer and the training loop so the
    * two can never drift.
    */
  private[text] def pMicro(margin: Column): Column =
    lit(500000L) + signum(margin).cast("long") *
      call_function("div",
        abs(margin) * 500000L, lit(1000000L) + abs(margin))

  /** Margins and fast-sigmoid probabilities under a weight relation. */
  def predictMargins(feats: DataFrame, weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("x") * col("w_micro")).as("margin_micro"))
      .withColumn("p_micro", pMicro(col("margin_micro")))

  /** `epochs` rounds of full-batch GD; returns (b, w_micro). Step size
    * is etaNum/(n·etaDen) in micro units — integer throughout (the
    * division is sign-split so Spark's truncating `div` equals DuckDB's
    * flooring `//` on the non-negative magnitude).
    *
    * r12 (guide §1.2 job count, §5 driver state): the weight table is
    * `buckets` longs — metadata-scale BY CONTRACT — so it lives on the
    * driver. Per epoch the cluster runs ONE gradient pipeline with the
    * current weights embedded as a literal (b → w_micro) map (zero
    * broadcast-exchange build, zero weight join, zero per-epoch weight
    * checkpoint) and the driver collects `buckets` gradient rows and
    * applies the update step in integer arithmetic IDENTICAL to the
    * SQL expression it replaces (`Long.signum` = SQL sign CASE;
    * truncating `/` on the non-negative magnitude = SQL `div` = DuckDB
    * `//`). The r11 shape scheduled ~9 jobs per epoch (AQE stage jobs
    * of two aggregations + the broadcast build + the weight-relation
    * checkpoint); measured at sf0.1 the gate drops 111 → 49 warm jobs
    * and the per-epoch margin values, weights, and the lr1 oracle hash
    * are unchanged (LogisticTrainSpec's driver-side exact mirror).
    */
  def train(feats: DataFrame, labels: DataFrame, buckets: Int,
      epochs: Int, etaNum: Long = 1L, etaDen: Long = 1L): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val n = labels.count() // one metadata-scale scalar
    val w = Array.fill(buckets)(0L)
    var e = 0
    while (e < epochs) {
      val wCol = typedlit(
        w.zipWithIndex.map { case (v, i) => i.toLong -> v }.toMap)
      // margins under the literal weight map — the same Σ x·w(b) the
      // broadcast-join form computed (w covers every b by construction,
      // so the old inner join never filtered)
      val preds = feats
        .withColumn("w_micro", element_at(wCol, col("b")))
        .groupBy(col("doc_id"))
        .agg(sum(col("x") * col("w_micro")).as("margin_micro"))
        .withColumn("p_micro", pMicro(col("margin_micro")))
      val gFrame = feats
        .join(preds.select(col("doc_id"), col("p_micro")), Seq("doc_id"))
        .join(labels, Seq("doc_id"))
        .withColumn("gc", (col("p_micro") - col("y") * Micro) * col("x"))
        .groupBy(col("b")).agg(sum(col("gc")).as("g"))
      // loop-body plan evidence, same hook as the graph walks
      if (e == 0) graft.PlanDump.probe(gFrame, "lrTrain_epoch1_gradient")
      val g = gFrame.collect() // `buckets` rows — metadata-scale
      g.foreach { r =>
        val b = r.getLong(0).toInt
        val gv = r.getLong(1)
        w(b) = w(b) -
          java.lang.Long.signum(gv) * (math.abs(gv) * etaNum / (n * etaDen))
      }
      e += 1
    }
    w.zipWithIndex.map { case (v, b) => (b.toLong, v) }.toSeq
      .toDF("b", "w_micro")
  }
}
