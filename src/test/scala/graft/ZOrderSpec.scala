package graft

import org.apache.spark.sql.functions._

import graft.index.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave2 bit-exact on known values") {
    // x=3 (11b) even positions -> 0101b = 5; y=1 odd positions -> 10b = 2
    val out = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 2).as("z"))
      .head().getLong(0)
    assert(out == 7L)
    // full-width: x=1023,y=0 fills even bits only
    val even = Seq((1023L, 0L)).toDF("x", "y")
      .select(ZOrder.interleave2(col("x"), col("y"), 10).as("z"))
      .head().getLong(0)
    assert(even == (0 until 10).map(k => 1L << (2 * k)).sum)
  }

  test("quadrant locality: same-quadrant points share the bucket range") {
    val pts = Seq((1L, 2L), (3L, 1L), (1020L, 1019L), (1023L, 1023L))
    val out = ZOrder.withZOrder(pts.toDF("x", "y"), "x", "y",
        bits = 10, buckets = 16)
      .orderBy(col("zvalue")).collect()
    val buckets = out.map(_.getAs[Int]("zbucket"))
    assert(buckets(0) == buckets(1)) // two low-quadrant points
    assert(buckets(2) == buckets(3)) // two high-quadrant points
    assert(buckets(0) < buckets(2))
  }

  test("writeZOrdered: per-file zvalue ranges are disjoint") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = spark.range(0, 2000).select(
      (col("id") * 37 % 1024).as("x"), (col("id") * 11 % 1024).as("y"))
    ZOrder.writeZOrdered(df, s"$tmp/z", "x", "y", bits = 10, files = 4)
    val ranges = spark.read.parquet(s"$tmp/z")
      .groupBy(input_file_name().as("f"))
      .agg(min("zvalue").as("lo"), max("zvalue").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo)
      case _ =>
    }
  }
}
