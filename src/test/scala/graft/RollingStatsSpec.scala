package graft

import graft.analyze.RollingStats

class RollingStatsSpec extends SparkSpec {
  import spark.implicits._

  private def roll(rows: Seq[(String, Int, Long)], window: Int) =
    RollingStats.rollingZ(rows.toDF("k", "t", "n"), "k", "t", "n", window, tieCol = "n")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap

  test("hand-computed z over a trailing window") {
    // frame at t=3 (window 3): values 2,4,6 → mean 4, sd 2, z = (6-4)/2 = 1
    val out = roll(Seq(("a", 1, 2L), ("a", 2, 4L), ("a", 3, 6L)), 3)
    assert(out(("a", 1)) == ((1L, 2.0, 0.0))) // single row: z forced 0
    assert(out(("a", 3)) == ((3L, 4.0, 1.0)))
  }

  test("constant series has zero variance and zero z") {
    val out = roll((1 to 5).map(t => ("a", t, 7L)), 3)
    assert(out.values.forall { case (_, m, z) => m == 7.0 && z == 0.0 })
  }

  test("frame is trailing ROWS, capped at the window size") {
    val out = roll((1 to 10).map(t => ("a", t, t.toLong)), 4)
    // at t=10 frame is 7,8,9,10: mean 8.5
    assert(out(("a", 10))._1 == 4L && out(("a", 10))._2 == 8.5)
  }

  test("keys are independent") {
    val out = roll(Seq(("a", 1, 100L), ("b", 1, 1L), ("b", 2, 3L)), 7)
    assert(out(("b", 2))._2 == 2.0)
    assert(out(("a", 1))._2 == 100.0)
  }

  test("a spike scores a large positive z against its own history") {
    val rows = (1 to 6).map(t => ("a", t, 10L)) :+ (("a", 7, 100L))
    val out = roll(rows, 7)
    assert(out(("a", 7))._3 > 2.0)
  }
}
