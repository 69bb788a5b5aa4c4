package graft

import org.apache.spark.sql.functions._

import graft.text.LogisticTrain

class LogisticTrainSpec extends SparkSpec {
  import spark.implicits._

  private def fit(docs: Seq[(Long, String)], labelToken: String,
      buckets: Int = 16, epochs: Int = 3, etaDiv: Long = 10) = {
    val df = docs.toDF("doc_id", "text")
    val toks = graft.text.TextFunctions.tokens(col("text"))
    val labels = df.select(col("doc_id"),
      when(array_contains(toks, labelToken), 1L).otherwise(0L).as("y"))
    val feats = LogisticTrain.hashedFeatures(df, "doc_id", "text", buckets)
    val w = LogisticTrain.train(feats, labels, buckets, epochs, 1L, etaDiv)
    LogisticTrain.predictMargins(feats, w)
      .join(labels, Seq("doc_id"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("training separates a linearly-separable vocabulary") {
    val pos = (0L until 10L).map(i => i -> "good nice fine")
    val neg = (10L until 20L).map(i => i -> "bad awful poor")
    val out = fit(pos ++ neg, labelToken = "good")
    pos.foreach { case (id, _) =>
      assert(out(id)._1 > 0L, s"doc $id: positive margin expected") }
    neg.foreach { case (id, _) =>
      assert(out(id)._1 < 0L, s"doc $id: negative margin expected") }
  }

  test("zero epochs leaves zero weights and p = 0.5 exactly") {
    val out = fit(Seq(1L -> "any words here"), "any", epochs = 0)
    assert(out(1L) == ((0L, 500000L, 1L)))
  }

  test("fast-sigmoid micro arithmetic at the margin-sign boundary") {
    // margin 0 -> exactly 500000; the sign factor contributes nothing
    val docs = Seq(1L -> "x y", 2L -> "x y")
    val labels = Seq((1L, 1L), (2L, 0L)).toDF("doc_id", "y")
    val feats = LogisticTrain.hashedFeatures(
      docs.toDF("doc_id", "text"), "doc_id", "text", 8)
    // identical docs with opposite labels: gradients cancel, weights 0
    val w = LogisticTrain.train(feats, labels, 8, 2, 1L, 10L)
    val ws = w.agg(sum(abs(col("w_micro")))).head().getLong(0)
    assert(ws == 0L)
    val p = LogisticTrain.predictMargins(feats, w)
      .select("p_micro").as[Long].collect().toSet
    assert(p == Set(500000L))
  }

  test("driver-side exact mirror of one epoch") {
    // 2 docs, tiny vocab; replicate the integer updates by hand
    val docs = Seq(1L -> "aa aa", 2L -> "bb")
    val labels = Seq((1L, 1L), (2L, 0L)).toDF("doc_id", "y")
    val feats = LogisticTrain.hashedFeatures(
      docs.toDF("doc_id", "text"), "doc_id", "text", 4)
    val fmap = feats.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fmap.values.toSet == Set(2L, 1L)) // counts survive hashing
    val w1 = LogisticTrain.train(feats, labels, 4, 1, 1L, 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // epoch 1 from w=0: every p = 500000. n*etaDiv = 2.
    // doc1 (y=1): gc per bucket of aa = (500000-1000000)*2 = -1000000
    // doc2 (y=0): gc for bb = 500000*1
    val bAA = fmap.collectFirst { case ((1L, b), _) => b }.get
    val bBB = fmap.collectFirst { case ((2L, b), _) => b }.get
    if (bAA != bBB) {
      assert(w1(bAA) == 500000L)  // -(-1000000 div 2)
      assert(w1(bBB) == -250000L) // -(500000 div 2)
    }
  }
}
