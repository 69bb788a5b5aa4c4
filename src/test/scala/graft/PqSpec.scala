package graft

import org.apache.spark.sql.functions._

import graft.ann.{Knn, Pq}

class PqSpec extends SparkSpec {
  import spark.implicits._

  /** 8 well-separated centers ±small noise, dim 16 → M=4 subspaces of 4.
    * In this regime ADC ranking must recover exact-search results.
    */
  private def clusteredCorpus(nPerCluster: Int, dim: Int = 16) = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8, dim)(rnd.nextFloat() * 10 - 5)
    val rows = for {
      c <- centers.indices
      i <- 0 until nPerCluster
    } yield {
      val v = centers(c).map(x => x + rnd.nextFloat() * 0.2f - 0.1f)
      ((c * nPerCluster + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("encode emits one code per subspace, all within the codebook") {
    val corpus = clusteredCorpus(50).cache()
    val cb = Pq.fit(corpus, "embedding", m = 4, ksub = 8)
    assert(cb.entries.size == 4 * 8)
    assert(cb.entries.forall(_._3.size == 4))
    val codes = Pq.encode(corpus, "embedding", cb)
      .select("codes").as[Seq[Int]].collect()
    assert(codes.forall(_.size == 4))
    assert(codes.forall(_.forall(c => c >= 0 && c < 8)))
  }

  test("encoding is the portable argmin: re-encoding is identical") {
    val corpus = clusteredCorpus(50).cache()
    val cb = Pq.fit(corpus, "embedding", m = 4, ksub = 8)
    val a = Pq.encode(corpus, "embedding", cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    val b = Pq.encode(corpus, "embedding", cb)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(a == b)
  }

  test("ADC candidates stay in the query's cluster; full recall once " +
      "refine covers the quantization blur") {
    // PQ collapses intra-cluster noise: every member of a tight cluster
    // reconstructs to (nearly) the same codes, so ADC order INSIDE a
    // cluster is arbitrary — the two-stage contract is that ADC gets the
    // cluster right and the over-fetch + exact rerank recovers exact
    // top-k. refine=10 → k·refine = cluster size.
    val corpus = clusteredCorpus(100).cache()
    val queries = corpus.filter(col("vec_id").isin(5L, 250L, 700L))
    val cb = Pq.fit(corpus, "embedding", m = 4, ksub = 16)
    val codes = Pq.encode(corpus, "embedding", cb).select("vec_id", "codes")

    val narrow = Pq.adcTopK(codes, corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", cb, k = 10, refine = 3)
      .select("qid", "id").as[(Long, Long)].collect()
    assert(narrow.forall { case (qid, id) => qid / 100 == id / 100 },
      s"cross-cluster candidate leaked: ${narrow.mkString(",")}")

    val brute = Knn.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val pq = Pq.adcTopK(codes, corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", cb, k = 10, refine = 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & pq).size.toDouble / brute.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("reranked sims are the exact cosines (bit-equal to brute force)") {
    val corpus = clusteredCorpus(100).cache()
    val queries = corpus.filter(col("vec_id") === 5L)
    val cb = Pq.fit(corpus, "embedding", m = 4, ksub = 16)
    val codes = Pq.encode(corpus, "embedding", cb).select("vec_id", "codes")
    val brute = Knn.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", 30)
      .select("id", "sim").as[(Long, Double)].collect().toMap
    val pq = Pq.adcTopK(codes, corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", cb, k = 10, refine = 3)
      .select("id", "sim").as[(Long, Double)].collect()
    pq.foreach { case (id, sim) =>
      assert(brute.contains(id) && brute(id) == sim,
        s"id $id sim $sim vs brute ${brute.get(id)}")
    }
  }

  test("queries excluded from their own candidates") {
    val corpus = clusteredCorpus(50).cache()
    val queries = corpus.filter(col("vec_id") === 5L)
    val cb = Pq.fit(corpus, "embedding", m = 4, ksub = 8)
    val codes = Pq.encode(corpus, "embedding", cb).select("vec_id", "codes")
    val res = Pq.adcTopK(codes, corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", cb, k = 10, refine = 3)
    assert(res.filter(col("id") === col("qid")).count() == 0)
  }
}
