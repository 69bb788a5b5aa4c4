package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, LshPlan}

class LshPlanSpec extends SparkSpec {
  import spark.implicits._

  private def planRows(hs: Seq[Int], taus: Seq[Long]) =
    LshPlan.plans(hs.toDF("max_hashes"), taus)
      .select("max_hashes", "tau_micro", "b", "r", "cost_micro", "chosen")
      .as[(Int, Long, Int, Int, Long, Int)].collect().toSeq

  test("every candidate is an exact factorization; one chosen per group") {
    val rows = planRows(Seq(60, 128), Seq(500000L, 800000L))
    assert(rows.forall { case (h, _, b, r, _, _) => b * r == h })
    rows.groupBy(t => (t._1, t._2)).foreach { case (_, g) =>
      assert(g.count(_._6 == 1) == 1)
    }
  }

  test("balanced split wins at tau=0.5 for a tiny budget") {
    // H=4: (4,1) floods with false positives, (1,4) drowns recall;
    // (2,2)'s curve is the balanced S at 0.5
    val chosen = planRows(Seq(4), Seq(500000L)).filter(_._6 == 1)
    assert(chosen.map(c => (c._3, c._4)) == Seq((2, 2)))
  }

  test("a higher threshold moves the chosen plan toward more rows per band") {
    val rows = planRows(Seq(120), Seq(400000L, 800000L))
    val rLow = rows.find(t => t._2 == 400000L && t._6 == 1).get._4
    val rHigh = rows.find(t => t._2 == 800000L && t._6 == 1).get._4
    assert(rHigh >= rLow)
  }
}

class NoveltySpec extends SparkSpec {
  import spark.implicits._

  test("copies score 0, disjoint vocab scores 1, overlap is exact") {
    val ref = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val scored = Seq(
      (10L, "alpha beta gamma delta epsilon"),      // exact copy -> 0
      (11L, "zeta eta theta iota kappa"),            // disjoint -> 1.0
      // shingles: 4 total, 2 of them (alpha beta gamma / beta gamma
      // delta) present in ref -> novelty 0.5
      (12L, "alpha beta gamma delta zeta kappa"))
      .toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(scored, ref, "text", "doc_id", 3)
      .select("doc_id", "n_shingles", "n_novel", "novelty_micro")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (10L, 3L, 0L, 0L),
      (11L, 3L, 3L, 1000000L),
      (12L, 4L, 2L, 500000L)))
  }

  test("short docs drop out; scored side never broadcasts the reference") {
    val ref = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val scored = Seq((2L, "a b"), (3L, "a b c x y")).toDF("doc_id", "text")
    val out = Dedup.ngramNovelty(scored, ref, "text", "doc_id", 3)
    assert(out.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }
}
