package graft

import org.apache.spark.sql.functions._

import graft.text.Doremi

class DoremiSpec extends SparkSpec {
  import spark.implicits._

  test("weights shift toward high-excess domains and stay normalized") {
    // domain 0: zero excess; domain 1: moderate; domain 2: high
    val docs = (Seq.fill(10)((0L, 0L)) ++ Seq.fill(10)((1L, 300000L)) ++
      Seq.fill(10)((2L, 900000L))).toDF("domain", "excess_micro")
    val w = Doremi.domainWeights(docs, "domain", "excess_micro")
      .collect().map(r => r.getAs[Long]("domain") ->
        r.getAs[Long]("weight_micro")).toMap
    assert(w(0) < w(1) && w(1) < w(2))
    // normalization: integer division leaves at most |domains| micro
    val tot = w.values.sum
    assert(tot <= 1000000L && tot >= 1000000L - 3)
  }

  test("zero excess everywhere keeps the uniform mixture") {
    val docs = (0L until 4L).flatMap(d =>
      Seq.fill(5)((d, 0L))).toDF("domain", "excess_micro")
    val w = Doremi.domainWeights(docs, "domain", "excess_micro")
      .select("weight_micro").as[Long].collect()
    assert(w.toSet == Set(250000L))
  }

  test("one corpus aggregation, then domain-scale iterations") {
    // the corpus-scale input appears in exactly ONE aggregate subtree:
    // no per-iteration re-scan of the docs relation
    val docs = (0L until 100L).map(i => (i % 4, i)).toDF(
      "domain", "excess_micro")
    val plan = Doremi.domainWeights(docs, "domain", "excess_micro")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("WindowExec"))
  }

  test("the corpus is physically scanned exactly once (ADVICE r9: " +
      "perDomain cache, not exchange-reuse luck)") {
    import org.apache.spark.sql.{Row, types => T}
    val scans = spark.sparkContext.longAccumulator("corpus-row-reads")
    val rows = spark.sparkContext.parallelize(0 until 1200, 4).map { i =>
      scans.add(1); Row(i.toLong % 4, i.toLong * 10)
    }
    val docs = spark.createDataFrame(rows, T.StructType(Seq(
      T.StructField("domain", T.LongType, nullable = false),
      T.StructField("excess_micro", T.LongType, nullable = false))))
    val out = Doremi.domainWeights(docs, "domain", "excess_micro").collect()
    assert(out.length == 4)
    assert(scans.value == 1200L,
      s"corpus rows read ${scans.value} times, expected exactly 1200 (1 scan)")
  }
}
