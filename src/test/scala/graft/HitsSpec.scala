package graft

import graft.graph.Hits

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("bipartite graph: hubs and authorities separate exactly") {
    // 1,2,3 each point at 10 and 20; nothing points at 1,2,3
    val edges = Seq(
      (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 20L))
      .toDF("src", "dst")
    val got = Hits.integerHits(edges, iters = 2)
      .select("node", "hub", "auth")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val hubs = got.filter(r => Set(1L, 2L, 3L)(r._1))
    val auths = got.filter(r => Set(10L, 20L)(r._1))
    // symmetric roles → identical scores within each side
    assert(hubs.map(_._2).distinct.size === 1)
    assert(auths.map(_._3).distinct.size === 1)
    // pure hubs have zero authority, pure authorities zero hub
    assert(hubs.forall(_._3 === 0L))
    assert(auths.forall(_._2 === 0L))
    // L1 normalization: each side's nonzero scores sum to ~1e6
    assert(math.abs(hubs.map(_._2).sum - Hits.HitsUnit) <= hubs.size)
    assert(math.abs(auths.map(_._3).sum - Hits.HitsUnit) <= auths.size)
  }

  test("a better-connected authority outranks a less-cited one") {
    // 10 cited by three hubs, 20 by one; hub 1 also cites 20
    val edges = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L)).toDF("src", "dst")
    val byNode = Hits.integerHits(edges, iters = 3)
      .select("node", "hub", "auth")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(byNode(10L)._2 > byNode(20L)._2)
    // hub 1 cites both authorities → strictly better hub than 2 or 3
    assert(byNode(1L)._1 > byNode(2L)._1)
    assert(byNode(2L)._1 === byNode(3L)._1)
  }

  test("duplicate edges collapse and results are partitioning-invariant") {
    val base = Seq((1L, 10L), (2L, 10L), (1L, 20L))
    val dup = (base ++ base ++ base).toDF("src", "dst").repartition(7)
    val once = base.toDF("src", "dst")
    val a = Hits.integerHits(dup, 2).select("node", "hub", "auth")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Hits.integerHits(once, 2).select("node", "hub", "auth")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
