package graft

import graft.text.C4Rules

class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  private def run(pages: Seq[(Long, String)]) =
    C4Rules.c4Filter(pages.toDF("doc_id", "page"), "doc_id", "page")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getBoolean(4),
          r.getBoolean(5), r.getString(6))))
      .toMap

  private val good = "this line has enough words here."

  test("clean three-sentence page survives with trimmed lines") {
    val page = s"  $good\n$good\n$good  "
    val out = run(Seq((1L, page)))(1L)
    assert(out == ((3, 3, false, false, true, Seq(good, good, good).mkString("\n"))))
  }

  test("line rules: terminal punct, min words, javascript") {
    val page = Seq(
      good,                                      // kept
      "no terminal punctuation on this line",    // dropped: punct
      "too short.",                              // dropped: < 5 words
      "please enable JavaScript to continue.",   // dropped: javascript (ci)
      "ends with a question does it not?",       // kept
      "quoted line with five words \"").mkString("\n") // kept: quote terminal
    val out = run(Seq((1L, page)))(1L)
    assert(out._1 == 6 && out._2 == 3 && out._5)
  }

  test("page rules: lorem ipsum and curly brace drop the whole page") {
    val lorem = s"$good\n$good\nLorem Ipsum dolor sit amet."
    val brace = s"$good\n$good\nvar x = { a: 1 }."
    val out = run(Seq((1L, lorem), (2L, brace)))
    assert(out(1L)._3 && !out(1L)._5 && out(1L)._6 == "")
    assert(out(2L)._4 && !out(2L)._5 && out(2L)._6 == "")
  }

  test("pages with fewer than minKeptLines kept lines are dropped") {
    val page = s"$good\n$good\nno punct line without end"
    val out = run(Seq((1L, page)))(1L)
    assert(out._2 == 2 && !out._5 && out._6 == "")
  }

  test("minLineWords is configurable") {
    val df = Seq((1L, "short line here.")).toDF("doc_id", "page")
    val relaxed = C4Rules.c4Filter(df, "doc_id", "page",
      minLineWords = 3, minKeptLines = 1).collect()(0)
    assert(relaxed.getBoolean(5) && relaxed.getString(6) == "short line here.")
  }
}
