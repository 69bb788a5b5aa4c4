package graft

import org.apache.spark.sql.functions._

import graft.text.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("feature counting: unigrams + bigrams with multiplicity") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val w = QualityClassifier.hashWeights(spark, 64)
    val row = QualityClassifier.score(docs, "doc_id", "text", w, 64).head()
    // features: a, b, a, "a b", "b a" → 5
    assert(row.getAs[Long]("n_features") == 5L)
  }

  test("uniform positive weights push score above 0.5, negative below") {
    val docs = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val pos = spark.range(64).select(col("id").as("b"),
      lit(1000L).as("w_micro"))
    val neg = spark.range(64).select(col("id").as("b"),
      lit(-1000L).as("w_micro"))
    val sPos = QualityClassifier.score(docs, "doc_id", "text", pos, 64)
      .head().getAs[Double]("score")
    val sNeg = QualityClassifier.score(docs, "doc_id", "text", neg, 64)
      .head().getAs[Double]("score")
    assert(sPos > 0.5 && sNeg < 0.5)
    // sigmoid symmetry around the 0-logit point
    assert(math.abs((sPos - 0.5) - (0.5 - sNeg)) < 1e-9)
  }

  test("bias shifts the keep decision") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val zero = spark.range(64).select(col("id").as("b"), lit(0L).as("w_micro"))
    val without = QualityClassifier
      .score(docs, "doc_id", "text", zero, 64)
      .head().getAs[Boolean]("keep")
    val withNeg = QualityClassifier
      .score(docs, "doc_id", "text", zero, 64, biasMicro = -1000000L)
      .head().getAs[Boolean]("keep")
    assert(without && !withNeg) // sigmoid(0)=0.5 keeps; sigmoid(-1)<0.5 drops
  }

  test("scoring is deterministic across runs") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "lorem ipsum dolor"))
      .toDF("doc_id", "text")
    val w = QualityClassifier.hashWeights(spark, 256)
    val a = QualityClassifier.score(docs, "doc_id", "text", w, 256)
      .collect().map(_.toSeq).toSeq
    val b = QualityClassifier.score(docs, "doc_id", "text", w, 256)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
