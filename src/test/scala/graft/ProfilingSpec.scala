package graft

import org.apache.spark.sql.functions._

import graft.text.Profiling

/** Distribution profiling: exact R-7 percentiles against hand
  * computation; the approx sketch (scale path) within bounds of exact
  * on a skewed distribution.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("exact percentiles use R-7 linear interpolation") {
    val df = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10))
      .toDF("g", "v")
    val got = Profiling.percentiles(df, "g", "v", Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // a: pos=(4-1)*0.5=1.5 -> 2.5; pos=(4-1)*0.9=2.7 -> 3 + .7*(4-3)
    assert(got("a") == ((4L, 2.5, 3.7)))
    assert(got("b") == ((1L, 10.0, 10.0)))
  }

  test("approx percentiles track exact within the sketch neighborhood") {
    // heavily skewed: 900 small values, long tail to 100k
    val df = spark.range(1000).select(lit("g").as("g"),
      when(col("id") < 900, col("id") % 50)
        .otherwise((col("id") - 899) * 1000).as("v"))
    val exact = Profiling.percentiles(df, "g", "v", Seq(0.5, 0.99))
      .select("p50", "p99").head()
    val approx = Profiling.percentilesApprox(df, "g", "v", Seq(0.5, 0.99))
      .select("p50", "p99").head()
    // accuracy=10000 on 1000 rows: the sketch is rank-exact up to
    // interpolation (approx returns a data value, exact may interpolate)
    assert(math.abs(approx.getDouble(0) - exact.getDouble(0)) <= 1.0)
    assert(math.abs(approx.getDouble(1) - exact.getDouble(1)) <= 1000.0)
  }
}
