package graft

import graft.graph.KCore

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    KCore.kCore(edges.toDF("a", "b"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)

  test("K4 with a pendant path: 2-core drops the path, keeps K4") {
    val g = k4 ++ Seq((3L, 10L), (10L, 11L), (11L, 12L))
    val out = core(g, 2)
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out.values.forall(_ == 3L))
    assert(core(g, 3).keySet == Set(0L, 1L, 2L, 3L))
    assert(core(g, 4).isEmpty)
  }

  test("a path fully cascades away at k=2 (iterative, not one-shot)") {
    // one-shot degree filtering would keep the middle nodes (deg 2);
    // true peeling unravels the path end-in
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(path, 2).isEmpty)
  }

  test("a cycle is its own 2-core") {
    val cyc = (0L until 6L).map(i => (i, (i + 1) % 6))
    val out = core(cyc, 2)
    assert(out.keySet == (0L until 6L).toSet && out.values.forall(_ == 2L))
  }

  test("duplicates, reversed copies and self-loops are tolerated") {
    val noisy = k4 ++ k4.map(_.swap) ++ Seq((0L, 0L))
    assert(core(noisy, 3).keySet == Set(0L, 1L, 2L, 3L))
  }

  test("a 1000-node chain trips the round cap LOUDLY, not with a wrong core") {
    // peel depth on a chain is ~n/2 (each round removes only the two
    // current endpoints), so a small budget cannot reach the fixpoint;
    // the contract is to throw — a silent bail would return interior
    // nodes that violate the degree>=2 invariant
    val chain = (0L until 999L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException] {
      KCore.kCore(chain.toDF("a", "b"), 2, maxRounds = 10).collect()
    }
    assert(ex.getMessage.contains("maxRounds"))
  }

  test("coreness inner peel is capped and throws on deep cascades") {
    val chain = (0L until 40L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      KCore.coreness(chain.toDF("a", "b"), kMax = 4, maxRounds = 3).collect()
    }
    // with budget ≥ the cascade depth the same graph resolves: a chain
    // is pure 1-core
    val ok = KCore.coreness(chain.toDF("a", "b"), kMax = 4, maxRounds = 30)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ok.values.forall(_ == 1) && ok.size == 41)
  }

  test("coreness: K4 + pendant + separate cycle") {
    val g = k4 ++ Seq((3L, 10L)) ++ Seq((20L, 21L), (21L, 22L), (22L, 20L))
    val out = KCore.coreness(g.toDF("a", "b"), kMax = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(out(_) == 3))
    assert(out(10L) == 1)
    assert(Seq(20L, 21L, 22L).forall(out(_) == 2))
  }

  test("gate fixture: kc1 peel reaches fixpoint within the oracle's 8 rounds") {
    // replicate the kc1 edge formulas over doc_ids 0..499 (the graph is
    // invariant once ids cover 0..119, so this matches every SF)
    val ids = 0L until 500L
    val raw = ids.flatMap { d =>
      val r = d % 60
      Seq((r, (r + 1) % 60), (r, (d * 3 + 7) % 40)) ++
        (if (r < 10) (1 to 4).map(k => (r, (r + k) % 10)) else Seq.empty)
    }
    var e = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.toSet
    var rounds = 0
    var shrinking = true
    while (shrinking) {
      val deg = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val e2 = e.filter { case (a, b) => deg(a) >= 5 && deg(b) >= 5 }
      rounds += 1
      shrinking = e2.size < e.size
      e = e2
    }
    assert(rounds <= 8, s"fixpoint took $rounds rounds; oracle chains 8")
    // the distributed result agrees with the driver peel
    val dist = core(raw, 5)
    val expected = e.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(dist == expected)
  }
}
