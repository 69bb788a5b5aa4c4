package graft

import graft.graph.Closeness

class ClosenessSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxRounds: Int = 32) =
    Closeness.harmonicFromSeeds(edges.toDF("src", "dst"), seeds, maxRounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("hand-computed harmonic sums on a directed path with a shortcut") {
    // 0→1→2→3 plus 0→3 shortcut; seeds 0 and 2
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L))
    val out = run(e, Seq(0L, 2L))
    // node 1: d(0,1)=1 → 1_000_000
    assert(out(1L) == ((1L, 1000000L)))
    // node 2: d(0,2)=2 → 500_000 (self-pair from seed 2 excluded)
    assert(out(2L) == ((1L, 500000L)))
    // node 3: d(0,3)=1 (shortcut), d(2,3)=1 → 2_000_000
    assert(out(3L) == ((2L, 2000000L)))
    // node 0: unreachable from any non-self seed → absent
    assert(!out.contains(0L))
  }

  test("disconnected components stay well-defined (harmonic, not closeness)") {
    val e = Seq((0L, 1L), (5L, 6L))
    val out = run(e, Seq(0L, 5L))
    assert(out == Map(1L -> ((1L, 1000000L)), 6L -> ((1L, 1000000L))))
  }

  test("a graph deeper than the round budget throws instead of " +
      "silently undercounting") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      run(chain, Seq(0L), maxRounds = 3)
    }
    // sufficient budget converges: node 10 at d=10 → 100_000
    val ok = run(chain, Seq(0L))
    assert(ok(10L) == ((1L, 100000L)))
  }
}
