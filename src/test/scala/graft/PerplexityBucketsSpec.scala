package graft

import org.apache.spark.sql.functions._

import graft.text.PerplexityBuckets

class PerplexityBucketsSpec extends SparkSpec {
  import spark.implicits._

  // "common common common" scores best (high-frequency tokens), mixed
  // docs middle, the all-rare doc worst
  private val docs = Seq(
    (1L, "common common common common"),
    (2L, "common common rare1 word1"),
    (3L, "common rare2 word2 zeta"),
    (4L, "qqq www eee rrr"),
    (5L, "common common common word3"),
    (6L, "common rare3 uuu iii")).toDF("doc_id", "text")

  test("qpd is positive and orders fluent before rare text") {
    val sc = PerplexityBuckets.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sc.values.forall(_ > 0))
    assert(sc(1L) < sc(2L) && sc(2L) < sc(4L))
  }

  test("head/middle/tail split respects the percentile thresholds") {
    val part = PerplexityBuckets.partition(
      PerplexityBuckets.scoreDocs(docs, "doc_id", "text"))
    val byBucket = part.collect()
      .groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Long]("qpd")).toSeq).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // every head score <= every middle score <= every tail score
    assert(byBucket("head").max <= byBucket("middle").min)
    assert(byBucket("middle").max <= byBucket("tail").min)
    // the most fluent doc is head, the all-rare doc is tail
    val bucketOf = part.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    assert(bucketOf(1L) == "head" && bucketOf(4L) == "tail")
  }

  test("approx-sketch thresholds agree with exact on a small corpus") {
    val sc = PerplexityBuckets.scoreDocs(docs, "doc_id", "text")
    val exact = PerplexityBuckets.partition(sc)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    // percentile_approx at high accuracy is exact on 6 rows
    val approx = PerplexityBuckets.partition(sc, approxAccuracy = 10000)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(exact == approx)
  }
}
