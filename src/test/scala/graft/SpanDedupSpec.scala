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
}
