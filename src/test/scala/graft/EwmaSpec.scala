package graft

import graft.analyze.Ewma

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("the recurrence matches a hand-rolled fold, per key") {
    val rows = Seq(
      ("a", 1, 10L), ("a", 2, 20L), ("a", 3, 0L), ("a", 4, 40L),
      ("b", 1, 7L), ("b", 2, 7L))
    val got = Ewma.ewmaHalf(rows.toDF("k", "o", "x"), "k", "o", "x")
      .select("key", "ord", "value", "ewma_micro")
      .as[(String, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4).toSeq).toMap
    def fold(xs: Seq[Long]): Seq[Long] =
      xs.tail.scanLeft(xs.head * 1000000L)((s, x) => (x * 1000000L + s) >> 1)
    assert(got("a") === fold(Seq(10L, 20L, 0L, 40L)))
    assert(got("b") === fold(Seq(7L, 7L)))
  }

  test("a constant series is a fixed point") {
    val rows = (1 to 50).map(i => ("k", i, 9L))
    val micros = Ewma.ewmaHalf(rows.toDF("k", "o", "x"), "k", "o", "x")
      .select("ewma_micro").as[Long].collect().toSet
    assert(micros === Set(9000000L))
  }

  test("result is invariant to input partitioning and row order") {
    val rows = (1 to 300).map(i => (s"k${i % 7}", i, (i * 37 % 101).toLong))
    val base = Ewma.ewmaHalf(rows.toDF("k", "o", "x"), "k", "o", "x")
      .select("key", "ord", "ewma_micro")
      .as[(String, Int, Long)].collect().toSet
    val shuffled = Ewma.ewmaHalf(
        scala.util.Random.shuffle(rows).toDF("k", "o", "x").repartition(13),
        "k", "o", "x")
      .select("key", "ord", "ewma_micro")
      .as[(String, Int, Long)].collect().toSet
    assert(base === shuffled)
  }

  test("the level decays toward a new regime geometrically") {
    val rows = (1 to 10).map(i => ("k", i, 100L)) ++
      (11 to 20).map(i => ("k", i, 0L))
    val last = Ewma.ewmaHalf(rows.toDF("k", "o", "x"), "k", "o", "x")
      .select("ord", "ewma").as[(Int, Double)].collect().sortBy(_._1)
    assert(last(9)._2 === 100.0)
    // ten halvings later the level is under 100/2^9
    assert(last(19)._2 < 100.0 / 512 + 1e-6)
    assert(last(19)._2 > 0.0 - 1e-9)
  }
}
