package graft

import org.apache.spark.sql.Row

import graft.text.GopherRules

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a")

  private def run(docs: Seq[(Long, String)],
      minWords: Int = 2, maxWords: Int = 10,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 6.0,
      minDistinctFrac: Double = 0.5, minStopwords: Int = 1): Map[Long, Row] =
    GopherRules.gopherFilter(docs.toDF("doc_id", "text"), "doc_id", "text",
        stop, minWords, maxWords, minMeanLen, maxMeanLen,
        minDistinctFrac, minStopwords)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("signals are exact on a hand-computed doc") {
    val out = run(Seq((1L, "the cat sat on the mat")))
    val r = out(1L)
    assert(r.getInt(1) == 6)                       // n_words
    assert(r.getDouble(2) == 2.833333)             // (3+3+3+2+3+3)/6
    assert(r.getDouble(3) == 0.833333)             // 5 distinct / 6
    assert(r.getInt(4) == 2)                       // two "the"
    assert(r.getBoolean(9))                        // keep
  }

  test("each rule fails independently and flips keep") {
    val docs = Seq(
      (1L, "the x"),                                // too short? n=2 ok; meanlen (3+1)/2=2.0 ok
      (2L, "the aa aa aa aa aa aa aa aa aa aa aa"), // too long (11 > 10)
      (3L, "the be cat dog fox be"),                // distinct 5/6 ok; meanlen ok
      (4L, "bb cc dd ee ff"))                       // zero stopwords
    val out = run(docs)
    assert(out(2L).getBoolean(5) == false && out(2L).getBoolean(9) == false)
    assert(out(4L).getBoolean(8) == false && out(4L).getBoolean(9) == false)
    assert(out(1L).getBoolean(9) == true)
    assert(out(3L).getBoolean(9) == true)
  }

  test("diversity rule catches token repetition") {
    val out = run(Seq((1L, "the spam spam spam spam spam spam spam")))
    assert(out(1L).getDouble(3) == 0.25) // 2 distinct / 8
    assert(!out(1L).getBoolean(7) && !out(1L).getBoolean(9))
  }

  test("thresholds compare against the ROUNDED ratio (no ulp flakes)") {
    // 3 tokens of lengths 4,4,4 -> mean exactly 4.0; bounds [4.0, 4.0]
    val out = run(Seq((1L, "the abcd wxyz")),
      minMeanLen = 3.666667, maxMeanLen = 3.666667)
    // mean = (3+4+4)/3 = 3.6666666... rounds to 3.666667 == bound
    assert(out(1L).getDouble(2) == 3.666667 && out(1L).getBoolean(6))
  }

  test("empty documents are dropped, not scored") {
    val out = run(Seq((1L, ""), (2L, "the ok")))
    assert(!out.contains(1L) && out.contains(2L))
  }
}
