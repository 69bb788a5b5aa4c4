package graft

import org.apache.spark.sql.functions._

import graft.dedup.SemDedup

/** SemDedup: cluster-scoped assignment + earlier-member pruning on
  * handcrafted vectors where every expected keep/prune decision is
  * known by construction.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "vec")

  private val centroids = Seq(
    (0, Seq(1f, 0f, 0f, 0f)),
    (1, Seq(0f, 1f, 0f, 0f))).toDF("cluster_id", "centroid")

  test("assign picks the nearest centroid with cluster-id tiebreak") {
    val a = SemDedup.assign(vecs(
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      2L -> Seq(0.1f, 0.9f, 0f, 0f),
      // exactly equidistant from both centroids -> tiebreak cluster 0
      3L -> Seq(0.5f, 0.5f, 0f, 0f)), centroids)
    val m = a.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(m === Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("prune drops members within tau of an earlier same-cluster member") {
    // cluster 0: 10, 11 (≈copy of 10), 12 (orthogonal-ish)
    // cluster 1: 20, 21 (≈copy of 20)
    val assigned = Seq(
      (10L, Seq(1f, 0f, 0f, 0f), 0),
      (11L, Seq(0.99f, 0.01f, 0f, 0f), 0),
      (12L, Seq(0.1f, 0f, 0.99f, 0f), 0),
      (20L, Seq(0f, 1f, 0f, 0f), 1),
      (21L, Seq(0f, 0.99f, 0.01f, 0f), 1)
    ).toDF("id", "vec", "cluster_id")
    val out = SemDedup.prune(assigned, 0.9).orderBy("id").collect()
    val kept = out.filter(_.getInt(2) == 1).map(_.getLong(0)).toSet
    assert(kept === Set(10L, 12L, 20L))
    val dupOf = out.filter(_.getInt(2) == 0)
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(dupOf === Map(11L -> 10L, 21L -> 20L))
  }

  test("pruning compares against ALL earlier members, kept or not") {
    // chain: b within tau of a, c within tau of b but NOT of a.
    // Paper semantics: c is still pruned (b is earlier, kept or not).
    val a = Seq(1f, 0f, 0f, 0f)
    val b = Seq(0.924f, 0.383f, 0f, 0f) // cos(a,b) ≈ 0.924
    val c = Seq(0.707f, 0.707f, 0f, 0f) // cos(b,c) ≈ 0.924, cos(a,c) ≈ 0.707
    val assigned = Seq((1L, a, 0), (2L, b, 0), (3L, c, 0))
      .toDF("id", "vec", "cluster_id")
    val out = SemDedup.prune(assigned, 0.9).orderBy("id").collect()
    assert(out.map(_.getInt(2)).toSeq === Seq(1, 0, 0))
    assert(out(2).getLong(3) === 2L) // c's dup_of is b, not a
  }

  test("cross-cluster near-pairs are invisible by design") {
    val assigned = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0),
      (2L, Seq(0.99f, 0.01f, 0f, 0f), 1)
    ).toDF("id", "vec", "cluster_id")
    val out = SemDedup.prune(assigned, 0.9).collect()
    assert(out.forall(_.getInt(2) == 1))
  }
}
