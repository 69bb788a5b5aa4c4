package graft

import graft.text.LexRank

class LexRankSpec extends SparkSpec {
  import spark.implicits._

  test("the sentence sharing tokens with everything ranks first") {
    // 4 sentences of 3 tokens (sentLen=3): s0 overlaps s1, s2 and s3
    // (hub); s1/s2/s3 only overlap s0 → s0 is the most central
    val text = "a b c " + "a b x " + "a c y " + "b c z"
    val got = LexRank.topSentences(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        sentLen = 3, minOverlap = 2, iters = 2, k = 4)
      .select("sid", "pr", "rank", "sentence")
      .as[(Int, Long, Int, String)].collect().sortBy(_._3)
    assert(got.head._1 === 0)
    assert(got.head._4 === "a b c")
    assert(got.head._2 > got(1)._2)
  }

  test("isolated sentences get only the damping floor") {
    val text = "a b c " + "x y z"
    val got = LexRank.topSentences(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        sentLen = 3, minOverlap = 2, iters = 2, k = 2)
      .select("sid", "pr").as[(Int, Long)].collect().toMap
    assert(got(0) === 150000L && got(1) === 150000L)
  }

  test("documents rank independently: one doc's graph never leaks into another") {
    val docs = Seq(
      (1L, "a b c a b x a c y"),
      (2L, "p q r p q s p r t")).toDF("doc_id", "text")
    val got = LexRank.topSentences(docs, "doc_id", "text",
        sentLen = 3, minOverlap = 2, iters = 2, k = 1)
      .select("doc_id", "sid", "sentence")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(0, 0))
    assert(got(0)._3 === "a b c" && got(1)._3 === "p q r")
  }
}
