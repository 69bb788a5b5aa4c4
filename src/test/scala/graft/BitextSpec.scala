package graft

import graft.ann.Bitext

class BitextSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float])], id: String) =
    rows.toDF(id, "vec")

  test("margin demotes the hub target that raw cosine over-ranks") {
    // y5 is a hub: decent cosine to EVERY x; y1/y3 are true matches of
    // x0/x2. Raw cosine ranks y5 near the top everywhere; the margin
    // ratio cancels its inflated denominator.
    val x = df(Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(0f, 0f, 1f, 0f)), "xid")
    val y = df(Seq(
      1L -> Seq(0.9f, 0.1f, 0f, 0f),
      3L -> Seq(0.1f, 0.9f, 0f, 0f),
      5L -> Seq(0.6f, 0.6f, 0.6f, 0.2f)), "yid")
    val out = Bitext.marginPairs(x, y, k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out((0L, 1L)) > out((0L, 5L)))
    assert(out((2L, 3L)) > out((2L, 5L)))
    // the hub is the best available match for x4 — still mined there
    assert(out.contains((4L, 5L)))
  }

  test("candidates come from the forward top-k only") {
    val x = df(Seq(0L -> Seq(1f, 0f)), "xid")
    val y = df(Seq(
      1L -> Seq(1f, 0f), 3L -> Seq(0f, 1f), 5L -> Seq(0.5f, 0.5f)), "yid")
    val out = Bitext.marginPairs(x, y, k = 2).collect()
    assert(out.length == 2) // k=2 forward candidates, not |X|·|Y|
  }

  test("margins are partitioning-invariant (integer arithmetic)") {
    val x = df((0L until 10L).map(i =>
      (i * 2, Seq(i.toFloat, 1f, (i % 3).toFloat, 0.5f))), "xid")
    val y = df((0L until 10L).map(i =>
      (i * 2 + 1, Seq((i % 4).toFloat, 0.5f, i.toFloat, 1f))), "yid")
    val a = Bitext.marginPairs(x, y, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val b = Bitext.marginPairs(x.repartition(7), y.repartition(5), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(a == b)
  }

  test("identical twin pair scores the maximal margin in its row") {
    val x = df(Seq(0L -> Seq(1f, 2f, 3f, 4f), 2L -> Seq(4f, 3f, 2f, 1f)), "xid")
    val y = df(Seq(
      1L -> Seq(1f, 2f, 3f, 4f),    // exact copy of x0
      3L -> Seq(0f, 1f, 0f, 1f)), "yid")
    val out = Bitext.marginPairs(x, y, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out((0L, 1L)) == out.filter(_._1._1 == 0L).values.max)
  }
}
