package graft

import org.apache.spark.sql.functions._

import graft.dedup.LeakAudit
import graft.text.Splits

class LeakAuditSpec extends SparkSpec {
  import spark.implicits._

  // near-dup pairs: {1,2} and {10,11,12} are clusters
  private val pairs = Seq(
    (1L, 2L, 0.9), (10L, 11L, 0.8), (10L, 12L, 0.7), (11L, 12L, 0.95))
    .toDF("a", "b", "jaccard")
  private val ids = Seq(1L, 2L, 10L, 11L, 12L, 20L, 21L).toDF("doc_id")
  private val layout = Seq(("train", 5000), ("test", 5000))

  test("cluster-keyed assignment leaks nothing, and pair columns ride along") {
    // key every member by its cluster representative → same split
    val rep = Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 21L)
    val keyed = ids.withColumn("rep",
      element_at(typedLit(rep), col("doc_id")))
    val assigned = Splits.assign(keyed, "rep", layout)
    assert(LeakAudit.crossSplitPairs(pairs, assigned, "doc_id").count() === 0)
  }

  test("iid assignment exposes straddling pairs; matrix counts them") {
    // force a split difference deterministically: odd ids train, even test
    val assigned = ids.withColumn("split",
      when(col("doc_id") % 2 === 1, "train").otherwise("test"))
    val cross = LeakAudit.crossSplitPairs(pairs, assigned, "doc_id")
    val got = cross.select("a", "b").as[(Long, Long)].collect().toSet
    // (1,2) odd/even leaks; (11,12) odd/even leaks; (10,11) even/odd
    // leaks; (10,12) even/even does not
    assert(got === Set((1L, 2L), (10L, 11L), (11L, 12L)))
    val m = LeakAudit.leakMatrix(cross)
      .select("split_a", "split_b", "n_pairs")
      .as[(String, String, Long)].collect().toSet
    assert(m === Set(("train", "test", 2L), ("test", "train", 1L)))
  }

  test("hash assignment is stable: adding docs never moves a split") {
    val before = Splits.assign(ids, "doc_id", layout)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val more = (ids.as[Long].collect().toSeq ++ (100L to 140L)).toDF("doc_id")
    val after = Splits.assign(more, "doc_id", layout)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(before.forall { case (k, v) => after(k) == v })
  }
}
