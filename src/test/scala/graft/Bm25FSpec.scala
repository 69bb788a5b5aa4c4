package graft

import graft.search.{Bm25, Bm25F}

class Bm25FSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "merge helper", "a b c d e f g h"),
    (2L, "other thing", "merge a b c d e f g"),
    (3L, "other stuff", "x y z w v u t s")).toDF("id", "name", "content")

  test("a name-field hit outranks the same term in the body") {
    val scores = Bm25F.scoreFields(spark, docs, "id",
        Seq("name" -> 3, "content" -> 1), Seq("merge"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L))
    assert(!scores.contains(3L))
  }

  test("with all weights 1 BM25F degenerates to BM25 over concatenated fields") {
    val flat = docs.selectExpr("id", "concat(name, ' ', content) AS text")
    val viaF = Bm25F.scoreFields(spark, docs, "id",
        Seq("name" -> 1, "content" -> 1), Seq("merge", "b"))
      .as[(Long, Double)].collect().toMap
    val viaPlain = Bm25.score(spark,
        Bm25.postings(flat, "id", graft.text.TextFunctions.tokens($"text")),
        Seq("merge", "b"))
      .as[(Long, Double)].collect().toMap
    assert(viaF.keySet === viaPlain.keySet)
    viaF.foreach { case (k, v) => assert(math.abs(v - viaPlain(k)) < 1e-12) }
  }

  test("field weights scale document length too: long weighted fields saturate") {
    // same term counts, but doc 20's hit lives in a heavy LONG field →
    // its weighted dl is larger → lower score than the short-field hit
    // filler docs keep df(merge)=2 of n=5 so the idf stays positive
    val d2 = Seq(
      (10L, "merge", "a b c d e f g h i j k l"),
      (20L, "merge a b c d e f g h i j k l", "x"),
      (30L, "p q", "r s t u v"),
      (40L, "p q", "r s t u v"),
      (50L, "p q", "r s t u v")).toDF("id", "name", "content")
    val scores = Bm25F.scoreFields(spark, d2, "id",
        Seq("name" -> 3, "content" -> 1), Seq("merge"))
      .as[(Long, Double)].collect().toMap
    assert(scores(10L) > scores(20L))
  }

  test("positive integer weights are required") {
    intercept[IllegalArgumentException] {
      Bm25F.fieldPostings(docs, "id", Seq("name" -> 0))
    }
  }
}
