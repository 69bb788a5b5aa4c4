package graft

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over a sleepy dog"), // near dup
    (4L, "completely different words about spark queries and shuffles")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normalized content") {
    val groups = Dedup.exactDupGroups(docs, "text", "doc_id").collect()
    val dupGroup = groups.find(_.getAs[Long]("n_docs") == 2)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("min_doc_id") == 1L)
    assert(groups.length == 3)
  }

  test("minhash signatures: identical docs identical, disjoint differ") {
    val sh = Dedup.docShingles(docs, "text", "doc_id", 3)
    val sigs = Dedup.minhashSignatures(sh, 12).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("h")).map(_.getAs[Long]("v")).toSeq).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    // near-dup shares most signature positions
    val shared = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(shared >= 6)
  }

  test("lsh pipeline surfaces the duplicate pair with jaccard 1.0") {
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
      k = 3, numHashes = 12, rowsPerBand = 2, minJaccard = 0.5).collect()
    val exact = pairs.find(r => r.getAs[Long]("a") == 1L && r.getAs[Long]("b") == 2L)
    assert(exact.isDefined)
    assert(math.abs(exact.get.getAs[Double]("jaccard") - 1.0) < 1e-12)
  }

  test("simhash: identical equal, near closer than far") {
    val sims = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sims(1L) == sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)))
  }
}
