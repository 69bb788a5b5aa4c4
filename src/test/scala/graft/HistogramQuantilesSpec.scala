package graft

import org.apache.spark.sql.functions._

import graft.sketch.HistogramQuantiles

class HistogramQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: exact integer counts, clamped edges, edge rounding") {
    val df = Seq(-5L, 0L, 1L, 15L, 16L, 17L, 100L, 999L).toDF("v")
    val h = HistogramQuantiles.histogram(df, "v", lo = 0L, hi = 64L,
        buckets = 4).orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    // width 16: bucket0 [0,16): {-5 clamped, 0, 1, 15}; bucket1 [16,32):
    // {16, 17}; bucket3 [48,64): {100, 999 clamped}
    assert(h.toSeq == Seq((0, 0.0, 16.0, 4L), (1, 16.0, 32.0, 2L),
      (3, 48.0, 64.0, 2L)))
  }

  test("merge of per-group histograms equals the global histogram") {
    val df = spark.range(0, 1000).select((col("id") * 7 % 513).as("v"),
      (col("id") % 4).as("g"))
    val global = HistogramQuantiles.histogram(df, "v", 0L, 512L, 32)
      .select("bucket", "n")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val perGroup = (0L until 4L).map { g =>
      HistogramQuantiles.histogram(df.filter(col("g") === g), "v",
        0L, 512L, 32).select("bucket", "n")
    }.reduce(_ unionByName _)
    val merged = HistogramQuantiles.merge(perGroup)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(merged == global)
  }

  test("quantile estimates are within one bucket width of exact ranks") {
    val df = spark.range(0, 1000).select((col("id") % 512).as("v"))
    val hist = HistogramQuantiles.histogram(df, "v", 0L, 512L, 32)
    val qs = HistogramQuantiles.quantiles(hist, 0L, 512L, 32,
        Seq(250, 500, 750))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // v is uniform on [0,512): exact q-quantile ≈ q·512/1000
    Seq(250, 500, 750).foreach { q =>
      val exact = q * 512.0 / 1000
      assert(math.abs(qs(q) - exact) <= 16.0,
        s"q=$q est=${qs(q)} exact=$exact")
    }
  }

  test("running count covers the total at the top quantile") {
    val df = spark.range(0, 100).select(col("id").as("v"))
    val hist = HistogramQuantiles.histogram(df, "v", 0L, 128L, 8)
    val out = HistogramQuantiles.quantiles(hist, 0L, 128L, 8, Seq(1000))
      .collect()(0)
    assert(out.getLong(3) == 100L)
    // q=1000 needs the last non-empty bucket: values reach 99 → bucket 6
    assert(out.getInt(2) == 6)
  }
}
