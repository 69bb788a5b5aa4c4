package graft

import org.apache.spark.sql.functions._

import graft.search.RankEval

class RankEvalSpec extends SparkSpec {
  import spark.implicits._

  private def metrics(results: Seq[(Long, Long, Int)],
      qrels: Seq[(Long, Long, Long)], k: Int) =
    RankEval.rankingMetrics(
      results.toDF("query_id", "id", "rank"),
      qrels.toDF("query_id", "id", "rel"), k)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))))
      .toMap

  test("perfect ranking scores ndcg=1, mrr=1, full recall") {
    val out = metrics(
      Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)),
      Seq((1L, 10L, 2L), (1L, 11L, 1L)), k = 3)
    val (nRel, hits, ndcg, mrr, p, r) = out(1L)
    assert(nRel == 2L && hits == 2L)
    assert(ndcg == 1.0 && mrr == 1.0)
    assert(p == 0.666667 && r == 1.0)
  }

  test("single relevant at rank 2: hand-computed ndcg and mrr") {
    val out = metrics(
      Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)),
      Seq((1L, 11L, 1L)), k = 3)
    val (_, hits, ndcg, mrr, _, _) = out(1L)
    // dcg = dm(2) = round(1e6/log2(3)) = 630930; idcg = dm(1) = 1e6
    assert(hits == 1L && ndcg == 0.63093 && mrr == 0.5)
  }

  test("relevant doc outside top-k costs recall, not a crash") {
    val out = metrics(
      Seq((1L, 10L, 1), (1L, 99L, 5)),
      Seq((1L, 10L, 1L), (1L, 99L, 1L), (1L, 77L, 1L)), k = 2)
    val (nRel, hits, _, _, _, r) = out(1L)
    assert(nRel == 3L && hits == 1L && r == 0.333333)
  }

  test("query with zero relevant judgments scores all zeros") {
    val out = metrics(
      Seq((1L, 10L, 1), (1L, 11L, 2)),
      Seq((2L, 5L, 1L)), k = 2)
    val (nRel, hits, ndcg, mrr, p, r) = out(1L)
    assert(nRel == 0L && hits == 0L && ndcg == 0.0 && mrr == 0.0 &&
      p == 0.0 && r == 0.0)
  }

  test("graded gains: misordered grades lower ndcg below 1") {
    // ideal order is (rel 3, rel 1); system ranks them swapped
    val out = metrics(
      Seq((1L, 10L, 1), (1L, 11L, 2)),
      Seq((1L, 10L, 1L), (1L, 11L, 3L)), k = 2)
    val (_, _, ndcg, mrr, _, _) = out(1L)
    // dcg = 1*dm(1) + 3*dm(2); idcg = 3*dm(1) + 1*dm(2)
    val dm1 = 1000000L; val dm2 = 630930L
    val want = BigDecimal((dm1 + 3 * dm2).toDouble / (3 * dm1 + dm2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(ndcg == want && mrr == 1.0)
  }
}
