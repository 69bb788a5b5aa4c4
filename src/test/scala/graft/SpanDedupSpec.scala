package graft

import graft.dedup.SpanDedup

/** SpanDedup: interval-union coverage on handcrafted corpora where the
  * duplicated windows (and their unions) are known by construction.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(n: Int, docs: (Long, String)*) =
    SpanDedup.dupSpanCoverage(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

  test("cross-doc shared substring covers the union of its windows") {
    // docs share "c d e f" -> 3-grams "c d e", "d e f" duplicated in
    // both docs; union of [2,5) and [3,6) = positions 2..5 (4 tokens)
    val out = run(3,
      1L -> "a b c d e f",
      2L -> "x y c d e f")
    assert(out.toSeq === Seq(
      (1L, 6, 4L, 0.666667),
      (2L, 6, 4L, 0.666667)))
  }

  test("within-doc repetition counts as duplication") {
    // "a b c" occurs twice in one doc: windows [0,3) and [4,7)
    val out = run(3, 1L -> "a b c z a b c")
    assert(out.toSeq === Seq((1L, 7, 6L, 0.857143)))
  }

  test("disjoint and adjacent windows merge exactly") {
    // doc1/doc2 share "p q r" and "x y z"; in doc1 they sit at
    // positions 0 and 5 (disjoint: 6 covered), doc2 at 0 and 3
    // (adjacent: 6 covered)
    val out = run(3,
      1L -> "p q r m n x y z",
      2L -> "p q r x y z")
    assert(out.toSeq === Seq(
      (1L, 8, 6L, 0.75),
      (2L, 6, 6L, 1.0)))
  }

  test("docs with no duplicated n-grams and short docs report zero") {
    val out = run(4,
      1L -> "unique tokens only here today",
      2L -> "shorty")
    assert(out.toSeq === Seq(
      (1L, 5, 0L, 0.0),
      (2L, 1, 0L, 0.0)))
  }

  private def runRemove(n: Int, docs: (Long, String)*) =
    SpanDedup.removeDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))

  test("removal cuts exactly the covered union and keeps the rest in order") {
    val out = runRemove(3,
      1L -> "a b c d e f",
      2L -> "x y c d e f")
    // shared "c d e f": positions 2..5 cut from both
    assert(out.toSeq === Seq(
      (1L, 6, 4, "a b"),
      (2L, 6, 4, "x y")))
  }

  test("fully duplicated docs collapse to empty text") {
    val out = runRemove(3,
      1L -> "p q r s",
      2L -> "p q r s")
    assert(out.toSeq === Seq(
      (1L, 4, 4, ""),
      (2L, 4, 4, "")))
  }

  test("removal agrees with coverage counts on a mixed corpus") {
    val docs = Seq(
      1L -> "a b c z a b c",
      2L -> "p q r m n x y z",
      3L -> "unique tokens only here")
    val cov = run(3, docs: _*).map(r => r._1 -> r._3).toMap
    val rem = runRemove(3, docs: _*)
    rem.foreach { case (id, nTok, nRem, clean) =>
      assert(nRem.toLong === cov(id), s"doc $id")
      val kept = if (clean.isEmpty) 0 else clean.split(" ").length
      assert(kept === nTok - nRem, s"doc $id kept-token count")
    }
  }

  test("short docs survive removal untouched") {
    val out = runRemove(4, 1L -> "shorty", 2L -> "shorty")
    // 1-token docs carry no 4-grams — nothing to remove even though
    // the docs are identical
    assert(out.toSeq === Seq(
      (1L, 1, 0, "shorty"),
      (2L, 1, 0, "shorty")))
  }
}
