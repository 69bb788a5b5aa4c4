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

  test("star contraction resolves deep chains within O(log n) rounds") {
    // a 60-node chain (diameter 59): label propagation would need ~59
    // rounds; large-star/small-star must close it inside its default 15
    val pairs = (0L until 59L).map(i => (100 + i, 101 + i)).toDF("a", "b")
    val nodes = (100L to 159L).toDF("doc_id")
    val got = graft.dedup.Dedup
      .resolveClustersStar(pairs, nodes, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    val expected = (100L to 159L)
      .map(i => (i, 100L, i == 100L)).toSet
    assert(got == expected)
  }

  test("star contraction and label propagation agree on a mixed graph") {
    // two cliques, one chain, singletons
    val pairs = (
      Seq((1L, 2L), (2L, 3L), (1L, 3L)) ++           // clique {1,2,3}
      Seq((10L, 11L), (11L, 12L)) ++                 // path {10,11,12}
      Seq((20L, 25L), (25L, 21L), (21L, 26L))        // chain {20,21,25,26}
    ).toDF("a", "b")
    val nodes = ((1L to 3L) ++ (10L to 12L) ++ Seq(20L, 21L, 25L, 26L)
      ++ Seq(40L, 41L)).toDF("doc_id")
    val star = graft.dedup.Dedup
      .resolveClustersStar(pairs, nodes, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    val prop = graft.dedup.Dedup
      .resolveClusters(pairs, nodes, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(star == prop)
    assert(star.contains((26L, 20L, false)))
    assert(star.contains((40L, 40L, true)))
  }

  test("star contraction: empty pair set leaves every doc canonical") {
    val pairs = Seq.empty[(Long, Long)].toDF("a", "b")
    val nodes = (1L to 5L).toDF("doc_id")
    val got = graft.dedup.Dedup
      .resolveClustersStar(pairs, nodes, "doc_id")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == (1L to 5L).map(i => (i, i, true)).toSet)
  }

  test("containment: a strict quote scores 1.0 one way, low the other") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta"), // prefix quote of 1
      (3L, "totally different words here entirely"))
      .toDF("doc_id", "text")
    val sh = graft.dedup.Dedup.docShingles(docs, "text", "doc_id", 3)
    val pairs = Seq((2L, 1L), (3L, 1L)).toDF("a", "b")
    val out = graft.dedup.Dedup.containmentOfPairs(pairs, sh)
      .select("a", "b", "inter", "na", "nb", "containment_a",
        "containment_b")
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    // doc2: 2 shingles, both inside doc1's 8 -> c_a=1.0, c_b=0.25
    assert(out(2L) == ((2L, 2L, 8L, 1.0, 0.25)))
    // disjoint docs share nothing
    assert(out(3L)._1 == 0L && out(3L)._4 == 0.0)
  }

  test("selectRepresentatives keeps the best-quality member per cluster") {
    // cluster {1,2,3} labeled by min id 1; singleton 9
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 10L), (2L, 50L), (3L, 50L), (9L, 5L))
      .toDF("doc_id", "q")
    val out = graft.dedup.Dedup
      .selectRepresentatives(clusters, quality, "q")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // quality tie between 2 and 3 breaks on the smaller id
    assert(out(1L) == ((2L, false)))
    assert(out(2L) == ((2L, true)))
    assert(out(3L) == ((2L, false)))
    assert(out(9L) == ((9L, true))) // singleton keeps itself
  }

  test("softDedupWeights: 1/cluster_size, singletons keep full weight") {
    // chain 1-2-3 is one component; 9 is untouched by any pair
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
      .withColumn("jaccard", org.apache.spark.sql.functions.lit(0.9))
    val docs = Seq(1L, 2L, 3L, 9L).toDF("doc_id")
    val out = graft.dedup.Dedup.softDedupWeights(pairs, docs, "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((1L, 3L, 333333L)))
    assert(out(2L) == ((1L, 3L, 333333L)))
    assert(out(3L) == ((1L, 3L, 333333L)))
    assert(out(9L) == ((9L, 1L, 1000000L)))
    // mass per distinct content is constant: weights in a cluster sum
    // to ~1e6 (floor residue aside)
    assert(out.filter(_._2._1 == 1L).values.map(_._3).sum == 999999L)
  }
}
