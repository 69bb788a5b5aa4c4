package graft

import graft.util.GapFill

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def fill(rows: Seq[(Long, String, Long, Long)]) =
    GapFill.fillDaily(
      rows.toDF("k", "day", "n", "state")
        .select($"k", $"day".cast("date").as("day"), $"n", $"state"),
      "k", "day", "n", "state")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap

  test("gaps are densified, counts zero-fill, state carries forward") {
    val out = fill(Seq(
      (1L, "2024-01-01", 2L, 10L),
      (1L, "2024-01-04", 1L, 20L)))
    assert(out.size == 4)
    assert(out((1L, "2024-01-01")) == ((2L, 10L, true)))
    assert(out((1L, "2024-01-02")) == ((0L, 10L, false)))
    assert(out((1L, "2024-01-03")) == ((0L, 10L, false)))
    assert(out((1L, "2024-01-04")) == ((1L, 20L, true)))
  }

  test("keys fill independently over their own spans") {
    val out = fill(Seq(
      (1L, "2024-01-01", 1L, 1L), (1L, "2024-01-03", 1L, 3L),
      (2L, "2024-02-10", 5L, 7L)))
    assert(out.size == 4) // key 1: 3 days; key 2: 1 day
    assert(out((2L, "2024-02-10")) == ((5L, 7L, true)))
    assert(!out.contains((2L, "2024-02-11")))
  }

  test("a fully dense series is unchanged") {
    val out = fill(Seq(
      (1L, "2024-01-01", 1L, 1L), (1L, "2024-01-02", 2L, 2L)))
    assert(out.values.forall(_._3))
  }
}
