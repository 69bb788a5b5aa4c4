package graft

import org.apache.spark.sql.functions._

import graft.analyze.DataQuality

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val dim = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
  private lazy val fact = Seq(
    (10L, 1L, 5.0), (11L, 3L, -2.0), (10L, 2L, 0.0))
    .toDF("k", "fk", "v")

  test("constraint helpers return the violating rows") {
    assert(DataQuality.duplicateKeys(fact, Seq("k")).count() == 2)
    assert(DataQuality.orphans(fact, "fk", dim, "id")
      .select("k").as[Long].collect().toSeq == Seq(11L))
    assert(DataQuality.violating(fact, col("v") > 0).count() == 2)
    val withNull = Seq((1L, Some("x")), (2L, None)).toDF("id", "s")
    assert(DataQuality.nulls(withNull, "s").count() == 1)
    // null predicate counts as a violation, not a pass
    val nullV = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "v")
    assert(DataQuality.violating(nullV, col("v") > 0).count() == 1)
  }

  test("summarize folds named checks into one violation table") {
    val got = DataQuality.summarize(Seq(
      "dup" -> DataQuality.duplicateKeys(fact, Seq("k")),
      "orphan" -> DataQuality.orphans(fact, "fk", dim, "id"),
      "positive" -> DataQuality.violating(fact, col("v") > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("dup" -> 2L, "orphan" -> 1L, "positive" -> 2L))
  }
}
