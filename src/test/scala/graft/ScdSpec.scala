package graft

import graft.util.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def history(rows: Seq[(Long, String, Long, String)]) =
    Scd.scd2(rows.toDF("k", "t", "tie", "attr")
        .select($"k", $"t".cast("date").as("t"), $"tie", $"attr"),
        "k", "t", "tie", "attr")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2),
        (r.getString(1), r.getDate(3).toString, r.getDate(4).toString,
          r.getLong(5))))

  test("runs collapse, intervals chain, open run gets the sentinel") {
    val log = Seq(
      (1L, "2024-01-01", 1L, "A"), (1L, "2024-01-05", 2L, "A"),
      (1L, "2024-02-01", 3L, "B"), (1L, "2024-03-01", 4L, "A"))
    val out = history(log).sortBy(_._2)
    assert(out.map(_._2).toSeq == Seq(1, 2, 3))
    assert(out(0)._3 == (("A", "2024-01-01", "2024-02-01", 2L)))
    assert(out(1)._3 == (("B", "2024-02-01", "2024-03-01", 1L)))
    assert(out(2)._3 == (("A", "2024-03-01", "9999-12-31", 1L)))
  }

  test("same-day changes are ordered by the tiebreak") {
    val log = Seq(
      (1L, "2024-01-01", 2L, "B"), (1L, "2024-01-01", 1L, "A"))
    val out = history(log).sortBy(_._2)
    assert(out.map(_._3._1).toSeq == Seq("A", "B"))
    assert(out(0)._3._2 == "2024-01-01" && out(0)._3._3 == "2024-01-01")
  }

  test("keys are independent") {
    val log = Seq(
      (1L, "2024-01-01", 1L, "A"), (1L, "2024-01-02", 2L, "B"),
      (2L, "2024-01-01", 3L, "X"))
    val out = history(log)
    assert(out.count(_._1 == 1L) == 2 && out.count(_._1 == 2L) == 1)
    assert(out.filter(_._1 == 2L).head._3 ==
      (("X", "2024-01-01", "9999-12-31", 1L)))
  }

  test("single unchanged attribute yields one open version") {
    val log = Seq(
      (5L, "2024-01-01", 1L, "Z"), (5L, "2024-06-01", 2L, "Z"),
      (5L, "2024-12-01", 3L, "Z"))
    val out = history(log)
    assert(out.length == 1)
    assert(out.head._3 == (("Z", "2024-01-01", "9999-12-31", 3L)))
  }
}
