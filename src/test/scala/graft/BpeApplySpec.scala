package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeApplySpec extends SparkSpec {
  import spark.implicits._

  private val merges = Seq(
    ("t", "a"), ("s", "c"), ("a", "n"), ("sc", "an"),
    ("b", "l"), ("ta", "bl"), ("e", "r"), ("o", "r"))
  private val rank = merges.zipWithIndex.toMap

  test("encodeWord follows rank priority through composed merges") {
    assert(Bpe.encodeWord("table", rank) == Vector("tabl", "e"))
    assert(Bpe.encodeWord("scan", rank) == Vector("scan"))
    assert(Bpe.encodeWord("order", rank) == Vector("or", "d", "er"))
    assert(Bpe.encodeWord("part", rank) ==
      Vector("p", "a", "r", "t"))
  }

  test("leftmost non-overlapping rule on runs") {
    val r = Map(("a", "a") -> 0)
    assert(Bpe.encodeWord("aaa", r) == Vector("aa", "a"))
    assert(Bpe.encodeWord("aaaa", r) == Vector("aa", "aa"))
  }

  test("priority encode re-checks earlier merges; sequential does not") {
    // r0 = (ab, c) consumes r1's output: priority merges a+b first and
    // then closes abc; the sequential fold has already passed r0 by
    // the time "ab" exists.
    val inter = Seq(("ab", "c"), ("a", "b"))
    assert(Bpe.encodeWord("abc", inter.zipWithIndex.toMap) ==
      Vector("abc"))
    val seqCount = Bpe.sequentialTokenCounts(
      Seq((1L, "abc")).toDF("doc_id", "text"), "doc_id", "text", inter)
      .head().getLong(2)
    assert(seqCount == 2L) // [ab, c] — the pinned divergence
  }

  test("mapPartitions encode agrees with the Column fold on a prefix-built list") {
    val docs = Seq(
      (1L, "fast table scan over sorted data"),
      (2L, "order by value and merge the batch"),
      (3L, "a an order scan table tabl")).toDF("doc_id", "text")
    val a = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = Bpe.sequentialTokenCounts(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sameElements(b))
    assert(a.nonEmpty && a.forall { case (_, nw, nb) => nb >= nw })
  }

  test("words untouched by any merge keep their character count") {
    val out = Bpe.encode(Seq((1L, "zzz qqq")).toDF("doc_id", "text"),
      "doc_id", "text", merges).head()
    assert(out.getLong(1) == 2L && out.getLong(2) == 6L)
  }
}
