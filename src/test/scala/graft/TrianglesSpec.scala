package graft

import org.apache.spark.sql.functions._

import graft.graph.Triangles

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def tri(edges: Seq[(Long, Long)]) =
    Triangles.nodeTriangles(edges.toDF("a", "b"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("K4: every node in 3 triangles, clustering 1.0") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val out = tri(k4)
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    out.values.foreach { case (deg, t, c) =>
      assert(deg == 3L && t == 3L && c == 1.0)
    }
  }

  test("path graph has zero triangles; endpoints deg<2 get clustering 0") {
    val out = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(out.values.forall(_._2 == 0L))
    assert(out(1L) == ((1L, 0L, 0.0)))
    assert(out(2L) == ((2L, 0L, 0.0)))
  }

  test("duplicates, reversed copies and self-loops are tolerated") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 3L))
    val out = tri(noisy)
    assert(out(1L) == ((2L, 1L, 1.0)) && out(2L) == ((2L, 1L, 1.0)) &&
      out(3L) == ((2L, 1L, 1.0)))
  }

  test("triangle + pendant: clustering reflects open wedges") {
    // 1-2-3 triangle, 4 hangs off 1: deg(1)=3, one closed of three wedges
    val out = tri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)))
    assert(out(1L)._2 == 1L && out(1L)._3 == 0.333333)
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("globalStats: K4 plus isolated edge") {
    val k4 = (for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)) :+
      ((8L, 9L))
    val r = Triangles.globalStats(k4.toDF("a", "b")).head()
    assert(r.getLong(0) == 4L) // K4 has 4 triangles
    // wedges: 4 nodes with deg 3 -> 12; transitivity = 12 closed wedge
    // slots / 12 wedges = 1.0 over K4, isolated edge adds none
    assert(r.getDouble(1) == 1.0)
  }
}
