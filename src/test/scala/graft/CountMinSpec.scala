package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.sketch.CountMin

/** CountMin: estimates against an exact driver mirror of the sketch,
  * the no-collision == exact-count case, the over-estimate invariant,
  * weighted builds, and sketch size bounds.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val Depth = 4

  /** Driver-side exact mirror: build the same depth×width counter table
    * and take the min per key.
    */
  private def mirror(occ: Seq[String], width: Int): Map[String, Long] = {
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
    occ.foreach { k =>
      (0 until Depth).foreach { i =>
        val b = PortableHash.hash60Local(i.toString, k) % width
        counters((i, b)) = counters.getOrElse((i, b), 0L) + 1L
      }
    }
    occ.distinct.map { k =>
      k -> (0 until Depth).map(i =>
        counters((i, PortableHash.hash60Local(i.toString, k) % width))).min
    }.toMap
  }

  private val occ: Seq[String] =
    (0 until 500).map(i => s"tok${i % 37}") ++ Seq.fill(60)("hot")

  test("estimates match the driver mirror bit for bit") {
    val df = occ.toDF("k")
    val sketch = CountMin.build(df, "k", Depth, 64)
    val est = CountMin.estimate(df.distinct(), "k", sketch, Depth, 64)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    assert(est === mirror(occ, 64))
  }

  test("estimate is never below the true count, exact when width is roomy") {
    val truth = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // narrow sketch: over-estimates allowed, never under
    val narrow = CountMin.estimate(occ.toDF("k").distinct(), "k",
        CountMin.build(occ.toDF("k"), "k", Depth, 16), Depth, 16)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    truth.foreach { case (k, c) => assert(narrow(k) >= c, s"under-counted $k") }
    // wide sketch: 38 distinct keys in width 4096 → all rows exact with
    // overwhelming margin; the MIN over 4 rows needs only one clean row
    val wide = CountMin.estimate(occ.toDF("k").distinct(), "k",
        CountMin.build(occ.toDF("k"), "k", Depth, 4096), Depth, 4096)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    assert(wide === truth)
  }

  test("heavy hitters surface the planted hot key first") {
    val top = CountMin.heavyHitters(occ.toDF("k"), "k", Depth, 4096,
      minEst = 30L, k = 3).collect()
    // only the planted key clears the floor (organic keys sit at 13/14)
    assert(top.map(r => (r.getString(0), r.getAs[Long]("est"))).toSeq
      === Seq(("hot", 60L)))
    // with the floor below the organic band, k caps the output and the
    // hot key still ranks first
    val capped = CountMin.heavyHitters(occ.toDF("k"), "k", Depth, 4096,
      minEst = 10L, k = 3).collect()
    assert(capped.length === 3 && capped.head.getString(0) === "hot")
  }

  test("weighted build sums the weight column") {
    val wdf = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("k", "w")
    val est = CountMin.estimate(wdf.select("k").distinct(), "k",
        CountMin.build(wdf, "k", Depth, 1024, Some("w")), Depth, 1024)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    assert(est === Map("a" -> 12L, "b" -> 1L))
  }

  test("sketch row count is bounded by depth times width, not corpus") {
    val n = CountMin.build(occ.toDF("k"), "k", Depth, 16).count()
    assert(n <= Depth * 16)
  }

  test("sketches merge by counter addition (the distributed property)") {
    // two shard sketches unioned + re-summed == the whole-corpus sketch;
    // this is why the build is one map-side-combinable aggregate at any
    // partition count
    val (left, right) = occ.splitAt(occ.length / 3)
    val merged = CountMin.build(left.toDF("k"), "k", Depth, 64)
      .unionByName(CountMin.build(right.toDF("k"), "k", Depth, 64))
      .groupBy("row_id", "bucket")
      .agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
    val est = CountMin.estimate(occ.toDF("k").distinct(), "k", merged,
        Depth, 64)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    assert(est === mirror(occ, 64))
  }
}
