package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.search.{Bm25, Phrase}
import graft.text.TextFunctions

/** The persisted probe layouts are BUCKETED by their probe-join keys, so
  * the recurring corpus-sized joins run without an Exchange on the
  * persisted side:
  *  - BM25: postings ⋈ doc_stats on id (the one corpus-sized join every
  *    query pays — query terms / idf / corpus broadcast);
  *  - dedup bands: ingest-batch probe on (band, band_val) — only the
  *    small batch side shuffles to align with the bucket layout;
  *  - phrase postings: the per-term (id, start) self-joins.
  * Broadcast is disabled for the audit so the joins that WOULD shuffle
  * at cluster scale actually plan as shuffle joins here — the assertion
  * is then that the bucketed side contributes zero ShuffleExchange.
  */
class BucketedLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "fast table scan merge table"),
    (1L, "slow index scan fast table"),
    (2L, "merge sort join table scan"),
    (3L, "fast merge fast table scan")).toDF("doc_id", "text")

  /** Count ShuffleExchanges whose subtree reads the named bucketed
    * table; static plan (AQE off for the audit).
    */
  private def shufflesOverBucketedScan(
      plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collectWithSubqueries {
      case e: ShuffleExchangeExec
          if e.collectLeaves().exists {
            case f: FileSourceScanExec => f.bucketedScan
            case _ => false
          } => e
    }.size

  private def withAuditConf[T](f: => T): T = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("corpus-vector registry scan feeds groupBy(id) without an Exchange") {
    // the lifecycle's per-doc best-variant aggregate groups on the
    // bucket column right after the (broadcast) crossJoin with the
    // query vectors — the bucketed layout must carry its partitioning
    // through so the corpus side never reshuffles per query
    import graft.functions.VectorFunctions
    val vecs = graft.embed.HashEmbedder.embed(docs, "doc_id", "text")
    val abs = new java.io.File("target/test_vecs_audit").getAbsolutePath
    vecs.repartition(4, col("id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "id").sortBy("id")
      .option("path", abs).saveAsTable("test_vecs_audit")
    val corpus = spark.table("test_vecs_audit")
    val qvecs = Seq(
        Tuple1(graft.embed.HashEmbedder.embedLocal("fast table")),
        Tuple1(graft.embed.HashEmbedder.embedLocal("merge scan")))
      .toDF("qvec")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val sims = corpus.crossJoin(broadcast(qvecs))
        .select(col("id"),
          VectorFunctions.cosine(col("vector"), col("qvec")).as("sim"))
        .groupBy(col("id")).agg(max(col("sim")).as("sim"))
      assert(shufflesOverBucketedScan(sims.queryExecution.executedPlan) == 0,
        "groupBy(id) over the bucketed vector scan should not reshuffle")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bm25 probe joins read postings/doc_stats without an Exchange") {
    val idx0 = Bm25.buildIndex(
      Bm25.postings(docs, "doc_id", TextFunctions.tokens(col("text"))))
    Bm25.writeIndexBucketed(idx0, "bm25_audit", "target/test/bm25_audit")
    val idx = Bm25.readIndexBucketed(spark, "bm25_audit", "target/test/bm25_audit")
    withAuditConf {
      val scored = Bm25.scoreIndexed(spark, idx, Seq("fast", "table"))
      val plan = scored.queryExecution.executedPlan
      val bucketedScans = plan.collectWithSubqueries {
        case f: FileSourceScanExec if f.bucketedScan => f
      }
      assert(bucketedScans.size >= 2,
        "expected bucketed scans of postings AND doc_stats")
      assert(shufflesOverBucketedScan(plan) === 0,
        s"bucketed side shuffled:\n${plan.treeString}")
      // and the answer itself still matches the unbucketed index
      val plain = Bm25.scoreIndexed(spark, idx0, Seq("fast", "table"))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
      val bucketed = scored.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(bucketed === plain)
    }
  }

  test("dedup band probe reads the persisted bands without an Exchange") {
    val sh = graft.dedup.Dedup.docShingles(docs, "text", "doc_id", 2)
    val bands = graft.dedup.Dedup.lshBands(
      graft.dedup.Dedup.minhashSignatures(sh, 8), 2)
    bands.repartition(4, col("band"), col("band_val"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(4, "band", "band_val").sortBy("band", "band_val")
      .option("path", "target/test/bands_audit")
      .saveAsTable("bands_audit")
    val persisted = spark.table("bands_audit")
    val batch = Seq((100L, "fast table scan merge extra"))
      .toDF("doc_id", "text")
    val bsh = graft.dedup.Dedup.docShingles(batch, "text", "doc_id", 2)
    val bbands = graft.dedup.Dedup.lshBands(
      graft.dedup.Dedup.minhashSignatures(bsh, 8), 2)
    withAuditConf {
      val probe = bbands
        .select(col("band"), col("band_val"), col("doc_id").as("new_id"))
        .join(persisted
          .select(col("band"), col("band_val"), col("doc_id").as("match_id")),
          Seq("band", "band_val"))
      val plan = probe.queryExecution.executedPlan
      assert(plan.collectWithSubqueries {
        case f: FileSourceScanExec if f.bucketedScan => f
      }.nonEmpty, "expected a bucketed scan of the persisted bands")
      assert(shufflesOverBucketedScan(plan) === 0,
        s"persisted band side shuffled:\n${plan.treeString}")
    }
  }

  test("phrase probe joins read the postings index without an Exchange") {
    Phrase.writeIndex(
      Phrase.positionalPostings(docs, "doc_id", TextFunctions.tokens),
      "phrase_audit", "target/test/phrase_audit")
    val p = Phrase.readIndex(spark, "phrase_audit")
    withAuditConf {
      val res = Phrase.phraseSearch(p, Seq("table", "scan"), 10)
      val plan = res.queryExecution.executedPlan
      assert(plan.collectWithSubqueries {
        case f: FileSourceScanExec if f.bucketedScan => f
      }.size >= 2, "expected bucketed scans for both phrase-term legs")
      assert(shufflesOverBucketedScan(plan) === 0,
        s"phrase postings side shuffled:\n${plan.treeString}")
      // and the probe answers correctly: docs 0,1,2,3 contain
      // "table scan"? 0: "table scan" yes; 1: "scan fast" no, "index scan"
      // → "table" at 4? "fast table" end → no adjacency; 2: "table scan"
      // yes; 3: "table scan" yes
      val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === Seq((0L, 1L), (2L, 1L), (3L, 1L)))
    }
  }
}
