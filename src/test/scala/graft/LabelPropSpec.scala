package graft

import graft.graph.LabelProp

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int) =
    LabelProp.communities(edges.toDF("a", "b"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def clique(ids: Seq[Long]) =
    for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (ids(i), ids(j))

  test("two cliques with one bridge settle into separate communities") {
    val g = clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((3L, 10L))
    val out = run(g, 3)
    val c1 = Seq(0L, 1L, 2L, 3L).map(out).distinct
    val c2 = Seq(10L, 11L, 12L, 13L).map(out).distinct
    assert(c1.size == 1 && c2.size == 1)
    assert(c1.head != c2.head)
    assert(c1.head <= 3L && c2.head >= 10L)
  }

  test("ties adopt the smaller label") {
    // node 2 sees labels {1, 3} once each → adopts 1 after round 1
    val out = run(Seq((1L, 2L), (2L, 3L)), 1)
    assert(out(2L) == 1L)
  }

  test("fixed rounds are deterministic under repartitioning") {
    val g = clique(Seq(0L, 1L, 2L, 3L, 4L)) ++ Seq((4L, 9L), (9L, 8L))
    val a = run(g, 3)
    val b = LabelProp.communities(
        g.toDF("a", "b").repartition(7), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("duplicate/reversed/self edges are canonicalized away") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L))
    val out = run(noisy, 2)
    assert(out.keySet == Set(1L, 2L))
  }
}
