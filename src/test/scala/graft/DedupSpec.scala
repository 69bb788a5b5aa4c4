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

  test("incremental dedup: corpus hit, within-batch first occurrence, novel") {
    import org.apache.spark.sql.functions.col
    val corpus = docs // ids 1..4
    val csh = Dedup.docShingles(corpus, "text", "doc_id", 3)
    val cbands = Dedup.lshBands(Dedup.minhashSignatures(csh, 12), 2)
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"), // copy of 1/2
      (102L, "entirely novel sentence with its own private vocabulary here"),
      (103L, "entirely novel sentence with its own private vocabulary here")
    ).toDF("doc_id", "text") // 103 dups 102 within the batch only
    val pairs = Dedup.incrementalNearDups(batch, csh, cbands,
      "text", "doc_id", k = 3, numHashes = 12, rowsPerBand = 2)
    val verdicts = Dedup.ingestVerdicts(batch, pairs, "doc_id", 0.5)
      .collect().map(r => r.getAs[Long]("new_id") ->
        ((r.getAs[Boolean]("is_dup"), Option(r.getAs[Any]("best_match"))))).toMap
    // 101 matches corpus doc 1 (smallest id wins the jaccard-1.0 tie
    // between 1 and 2); 102 is first occurrence so kept; 103 is charged
    // to 102, its earlier in-batch copy
    assert(verdicts(101L) == ((true, Some(1L))))
    assert(verdicts(102L) == ((false, None)))
    assert(verdicts(103L) == ((true, Some(102L))))
    // pair rows never point a batch doc at a LATER batch doc
    assert(pairs.filter(col("match_id") > col("new_id")).count() == 0)
  }

  test("simhash: identical equal, near closer than far") {
    val sims = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sims(1L) == sims(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(4L)))
  }
}
