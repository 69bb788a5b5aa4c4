package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analyze.Debt
import graft.search.SearchEngine

class DebtSpec extends SparkSpec {

  private lazy val chunks = new SearchEngine(spark).buildIndex(sampleRepo)._1.cache()

  test("snapshot: bounded per-file scores with components") {
    val snap = Debt.snapshot(chunks, new Timestamp(1000L)).collect()
    assert(snap.nonEmpty)
    snap.foreach { r =>
      val s = r.getAs[Double]("debt_score")
      assert(s >= 0.0 && s <= 100.0)
    }
  }

  test("trend: second snapshot with more complexity is 'worsening'") {
    val s1 = Debt.snapshot(chunks, new Timestamp(1000L))
    val worse = chunks.withColumn("complexity", col("complexity") + 10)
    val s2 = Debt.snapshot(worse, new Timestamp(2000L))
    val t = Debt.trend(s1.unionByName(s2))
      .filter(col("run_ts") === new Timestamp(2000L))
      .collect()
    assert(t.nonEmpty)
    assert(t.forall(_.getAs[String]("direction") == "worsening"))
    val totals = Debt.totals(s1.unionByName(s2)).orderBy("run_ts").collect()
    assert(totals(1).getAs[Double]("total_debt") > totals(0).getAs[Double]("total_debt"))
  }
}
