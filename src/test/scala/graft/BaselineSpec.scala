package graft

import graft.analyze.Baseline

/** Baseline comparator rules (`analysis/baseline/comparator.py`):
  * threshold neutrality, zero-baseline ±100%, count metrics never
  * regress, new/deleted detection.
  */
class BaselineSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (String, Double, Double, Double, Double, Double)*) =
    rows.toSeq.toDF("file_path", "total_complexity", "avg_complexity",
      "max_complexity", "function_count", "class_count")

  test("classification: threshold, direction, count neutrality") {
    val base = snap(("a", 100.0, 10.0, 20.0, 5.0, 1.0))
    val cur = snap(("a", 120.0, 9.0, 20.5, 50.0, 9.0))
    val rows = Baseline.compare(cur, base)
      .collect().map(r => r.getAs[String]("metric_name") ->
        r.getAs[String]("classification")).toMap
    assert(rows("total_complexity") == "regression") // +20%
    assert(rows("avg_complexity") == "improvement")  // −10%
    assert(rows("max_complexity") == "neutral")      // +2.5% < 5%
    assert(rows("function_count") == "neutral")      // count metric
    assert(rows("class_count") == "neutral")
  }

  test("zero baseline reads as +100%; new and deleted files flagged") {
    val base = snap(("a", 0.0, 0.0, 0.0, 0.0, 0.0), ("gone", 1, 1, 1, 1, 1))
    val cur = snap(("a", 50.0, 0.0, 1.0, 2.0, 0.0), ("fresh", 1, 1, 1, 1, 1))
    val out = Baseline.compare(cur, base).collect()
    val a = out.filter(r => r.getAs[String]("file_path") == "a")
      .map(r => r.getAs[String]("metric_name") ->
        (r.getAs[Double]("percentage_delta"), r.getAs[String]("classification")))
      .toMap
    assert(a("total_complexity") == (100.0, "regression"))
    assert(a("avg_complexity") == (0.0, "neutral"))
    val status = out.map(r => r.getAs[String]("file_path") ->
      r.getAs[String]("status")).toMap
    assert(status("fresh") == "new" && status("gone") == "deleted")
  }
}
