package graft

import graft.graph.LinkPredict

class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  private val Pico = 1000000000000L

  private def predict(edges: Seq[(Long, Long)], maxHubDeg: Int = 10000) =
    LinkPredict.predictLinks(edges.toDF("a", "b"), maxHubDeg)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("square: both diagonals predicted with cn=2, ra=2·(1/2)") {
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val out = predict(sq)
    assert(out.keySet == Set((1L, 3L), (2L, 4L)))
    out.values.foreach { case (cn, ra) =>
      assert(cn == 2L && ra == 2 * (Pico / 2))
    }
  }

  test("star: leaf pairs share only the center, weighted 1/deg(center)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val out = predict(star)
    assert(out.size == 6) // C(4,2) leaf pairs
    out.values.foreach { case (cn, ra) =>
      assert(cn == 1L && ra == Pico / 4)
    }
  }

  test("triangle: every pair already adjacent, nothing predicted") {
    assert(predict(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isEmpty)
  }

  test("maxHubDeg excludes high-degree centers from wedge enumeration") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    assert(predict(star, maxHubDeg = 3).isEmpty)
  }

  test("ra sums over multiple common neighbors of different degree") {
    // x=1,y=2 share centers 3 (deg 2) and 4 (deg 3); 4 also connects 5
    val g = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
    val out = predict(g)
    assert(out((1L, 2L)) == ((2L, Pico / 2 + Pico / 3)))
  }
}
