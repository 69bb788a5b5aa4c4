package graft

import graft.graph.ShortestPath

class ShortestPathSpec extends SparkSpec {
  import spark.implicits._

  private def sp(edges: Seq[(Long, Long, Long)], src: Long) =
    ShortestPath.fromSource(edges.toDF("src", "dst", "w"), src)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("weighted detour beats the heavy direct edge") {
    // 0→2 direct costs 10; 0→1→2 costs 3
    val out = sp(Seq((0L, 2L, 10L), (0L, 1L, 1L), (1L, 2L, 2L)), 0L)
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 3L))
  }

  test("unreachable nodes are absent; parallel edges collapse to min") {
    val out = sp(Seq((0L, 1L, 5L), (0L, 1L, 2L), (7L, 8L, 1L)), 0L)
    assert(out == Map(0L -> 0L, 1L -> 2L))
  }

  test("chains need one relaxation round per hop (early exit after)") {
    val chain = (0L until 6L).map(i => (i, i + 1, i + 1))
    val out = sp(chain, 0L)
    assert(out(6L) == (1L to 6L).sum)
  }

  test("cycles settle to the fixpoint") {
    val out = sp(Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 0L, 1L)), 0L)
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("a tree deeper than the round budget throws instead of returning " +
      "overestimated or missing distances") {
    val chain = (0L until 10L).map(i => (i, i + 1, 1L))
    val ex = intercept[IllegalStateException] {
      ShortestPath.fromSource(chain.toDF("src", "dst", "w"), 0L, maxRounds = 3)
        .collect()
    }
    assert(ex.getMessage.contains("maxRounds"))
    // the same graph under a sufficient budget converges exactly
    val ok = sp(chain, 0L)
    assert(ok(10L) == 10L && ok.size == 11)
  }

  test("gate fixture fixpoints within the oracle's 12 rounds") {
    val raw = (0L until 500L).flatMap { d =>
      val r = d % 60
      Seq((r, (r + 1) % 60, 1 + r % 3), (r, (7 * r + 3) % 60, 2 + r % 5))
    }
    val edges = raw.groupBy(t => (t._1, t._2))
      .map { case ((s, t), ws) => (s, t, ws.map(_._3).min) }
    // driver-side Bellman-Ford, counting rounds to fixpoint
    var dist = Map(0L -> 0L)
    var rounds = 0
    var changed = true
    while (changed) {
      val relaxed = (dist.toSeq ++ edges.flatMap { case (s, t, w) =>
        dist.get(s).map(c => t -> (c + w))
      }).groupBy(_._1).map { case (n, cs) => n -> cs.map(_._2).min }
      changed = relaxed != dist
      dist = relaxed
      rounds += 1
    }
    assert(rounds <= 12, s"fixpoint took $rounds rounds")
    assert(sp(raw.toSeq, 0L) == dist)
  }
}
