package graft

import org.apache.spark.sql.functions._

import graft.ann.{Ivf, Knn}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Clustered synthetic corpus: 8 well-separated centers ±small noise —
    * the regime where IVF must recover exact-search results.
    */
  private def clusteredCorpus(nPerCluster: Int, dim: Int = 16) = {
    val rnd = new scala.util.Random(7)
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

  test("cluster count sizing mirrors the reference clamp") {
    assert(Ivf.clusterCount(5000) == 1)       // N/4096 cap → single partition
    assert(Ivf.clusterCount(65536) == 16)     // N/4096 = 16 caps sqrt = 256
    assert(Ivf.clusterCount(100000) == 24)    // N/4096 = 24 caps sqrt(100k) = 316
    assert(Ivf.clusterCount(10000000) == 512) // sqrt clamp cap 512
  }

  test("small corpora degenerate to a single cluster (brute force)") {
    val idx = Ivf.build(clusteredCorpus(10), "vec_id", "embedding")
    assert(idx.k == 1)
    assert(idx.assigned.select("cluster_id").distinct().count() == 1)
  }

  test("ivf recall equals brute force on separated clusters, nprobes=1") {
    val corpus = clusteredCorpus(600).cache()
    val queries = corpus.filter(col("vec_id").isin(5L, 1200L, 3000L))
    val idx = Ivf.build(corpus, "vec_id", "embedding", kOverride = Some(8))
    assert(idx.k == 8)

    val brute = Knn.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.topK(idx, queries, "vec_id", "embedding", 10, nprobes = 1)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.95, s"recall $recall")
  }

  test("disk round-trip: partitioned layout returns identical results") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf")
    val corpus = clusteredCorpus(600).cache()
    val queries = corpus.filter(col("vec_id").isin(5L, 1200L))
    val idx = Ivf.build(corpus, "vec_id", "embedding", kOverride = Some(8))
    Ivf.write(idx, dir.toString)
    // layout on disk is cluster-partitioned → probe prunes partitions
    val dirs = new java.io.File(s"$dir/vectors").listFiles()
      .filter(_.getName.startsWith("cluster_id=")).map(_.getName).sorted
    assert(dirs.length == 8)
    val mem = Ivf.topK(idx, queries, "vec_id", "embedding", 10, nprobes = 2)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val disk = graft.ann.IvfDisk.topK(spark, dir.toString, queries,
      "vec_id", "embedding", 10, nprobes = 2)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(mem == disk)
  }

  test("incremental append: batch assigned to existing centroids, " +
      "disk layout grows in place, queries see the new vectors") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app")
    val corpus = clusteredCorpus(100).cache()
    val idx = Ivf.build(corpus, "vec_id", "embedding", kOverride = Some(8))
    Ivf.write(idx, dir.toString)
    // batch = near-copies of vecs 0..9 under new ids
    val batch = corpus.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val assigned = Ivf.assignBatch(idx.centroids, batch,
      "vec_id", "embedding")
    // a near-copy lands in its twin's cluster
    val twin = idx.assigned.filter(col("id") === 3L)
      .select("cluster_id").head().getInt(0)
    assert(assigned.filter(col("id") === 100003L)
      .select("cluster_id").head().getInt(0) == twin)
    Ivf.append(dir.toString, assigned)
    val reread = Ivf.read(spark, dir.toString)
    assert(reread.assigned.count() == corpus.count() + 10)
    // the appended twin is retrieved for its source query
    val q = corpus.filter(col("vec_id") === 3L)
    val hits = Ivf.topK(reread, q, "vec_id", "embedding", 10, nprobes = 2)
      .select("id").as[Long].collect().toSet
    assert(hits.contains(100003L))
    // fresh full assignment against the same centroids == base ∪ batch
    val fresh = Ivf.assignBatch(idx.centroids,
        corpus.unionByName(batch), "vec_id", "embedding")
      .select("id", "cluster_id")
      .as[(Long, Int)].collect().toMap
    val combined = reread.assigned.select("id", "cluster_id")
      .as[(Long, Int)].collect().toMap
    assert(combined == fresh)
  }

  test("KMeans fit reads a capped deterministic sample, never the full corpus") {
    val corpus = clusteredCorpus(600).cache() // 4800 rows
    val base = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val n = base.count()
    // cap binds: ~n/mod rows with mod = ceil(n/cap), chosen by id hash
    val s = Ivf.fitSample(base, n, 1000L)
    val sn = s.count()
    assert(sn < n && sn > 300, s"sample $sn of $n")
    // content-addressed, not layout-addressed: identical row set under a
    // different partitioning
    val reparted = Ivf.fitSample(base.repartition(17), n, 1000L)
      .select("id").as[Long].collect().toSet
    assert(reparted == s.select("id").as[Long].collect().toSet)
    // cap above n is the identity
    assert(Ivf.fitSample(base, n, n + 1).count() == n)
    // and a sampled fit still recovers the separated clusters: recall
    // vs brute force stays exact-search-grade
    val queries = corpus.filter(col("vec_id").isin(5L, 1200L, 3000L))
    val idx = Ivf.build(corpus, "vec_id", "embedding",
      kOverride = Some(8), fitSampleCap = 1000L)
    val brute = Knn.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val ivf = Ivf.topK(idx, queries, "vec_id", "embedding", 10, nprobes = 1)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    assert(idx.assigned.count() == n) // assignment is ALWAYS full-corpus
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.95, s"recall $recall with sampled fit")
  }

  test("sign-LSH multi-probe recall beats single-probe") {
    val corpus = clusteredCorpus(200).cache()
    val queries = corpus.filter(col("vec_id").isin(5L, 400L, 900L))
    val brute = Knn.bruteForceTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    def recall(radius: Int): Double = {
      val hits = Knn.hyperplaneBucketTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", 10, nBits = 4, dim = 16,
        probeRadius = radius)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      (brute & hits).size.toDouble / brute.size
    }
    val r0 = recall(0)
    val r1 = recall(1)
    assert(r1 >= r0, s"multi-probe $r1 vs single $r0")
    assert(r1 >= 0.8, s"multi-probe recall $r1")
  }

  test("probing fewer clusters scans fewer rows") {
    val corpus = clusteredCorpus(600).cache()
    val queries = corpus.filter(col("vec_id") === 5L)
    val idx = Ivf.build(corpus, "vec_id", "embedding", kOverride = Some(8))
    val probed = idx.centroids.crossJoin(
        broadcast(queries.select(col("embedding").as("qvec"))))
      .count()
    assert(probed == idx.k) // centroid table stays tiny → broadcast side
    val hits = Ivf.topK(idx, queries, "vec_id", "embedding", 10, nprobes = 1)
    assert(hits.count() == 10)
  }
}
