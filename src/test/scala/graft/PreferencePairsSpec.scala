package graft

import org.apache.spark.sql.functions._

import graft.text.{PreferencePairs, RejectionSampling}

/** DPO preference-pair assembly + reward rejection sampling: extremes,
  * tiebreaks, drop branches, text re-attachment.
  */
class PreferencePairsSpec extends SparkSpec {
  import spark.implicits._

  private def cands = Seq(
    // prompt "a": clear spread, distinct rewards
    ("a", 1L, 0.9, "best"), ("a", 2L, 0.1, "worst"), ("a", 3L, 0.5, "mid"),
    // prompt "b": top reward TIED between ids 20 and 10 → lowest id wins;
    // bottom tied between 30 and 40 → lowest id wins
    ("b", 20L, 0.8, "t20"), ("b", 10L, 0.8, "t10"),
    ("b", 30L, 0.2, "t30"), ("b", 40L, 0.2, "t40"),
    // prompt "c": single candidate → dropped (chosen == rejected)
    ("c", 5L, 0.7, "only"),
    // prompt "d": margin 0.05 < floor → dropped
    ("d", 6L, 0.50, "hi"), ("d", 7L, 0.45, "lo"))
    .toDF("prompt_id", "resp_id", "reward", "text")

  test("pairs: extremes with lowest-id tiebreaks; singletons and sub-margin prompts drop") {
    val p = PreferencePairs.pairs(cands, "prompt_id", "resp_id", "reward",
      minMargin = 0.1).collect().map(r =>
      r.getAs[String]("prompt_id") ->
        (r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id"),
          r.getAs[Long]("n_candidates"))).toMap
    assert(p.keySet == Set("a", "b"))
    assert(p("a") == ((1L, 2L, 3L)))
    assert(p("b") == ((10L, 30L, 4L)))
  }

  test("withTexts re-attaches both responses by compound key") {
    val p = PreferencePairs.pairs(cands, "prompt_id", "resp_id", "reward")
    val t = PreferencePairs.withTexts(p, cands, "prompt_id", "resp_id", "text")
      .filter(col("prompt_id") === "a").collect().head
    assert(t.getAs[String]("chosen_text") == "best")
    assert(t.getAs[String]("rejected_text") == "worst")
  }

  test("bestOfN: floor rejects, zero-acceptee prompts drop, stats from one pass") {
    val r = RejectionSampling.bestOfN(
      cands.drop("text"), "prompt_id", "resp_id", "reward", minReward = 0.45)
      .collect().map(x => x.getAs[String]("prompt_id") ->
        (x.getAs[Long]("best_id"), x.getAs[Long]("n_candidates"),
          x.getAs[Long]("n_accepted"), x.getAs[Long]("accept_permille")))
      .toMap
    // "a": 0.9/0.5 accepted of 3; "b": tie at 0.8 → id 10; "c": 0.7 single;
    // "d": 0.50/0.45 both accepted, best id 6
    assert(r.keySet == Set("a", "b", "c", "d"))
    assert(r("a") == ((1L, 3L, 2L, 666L)))
    assert(r("b") == ((10L, 4L, 2L, 500L)))
    assert(r("c") == ((5L, 1L, 1L, 1000L)))
    assert(r("d") == ((6L, 2L, 2L, 1000L)))
    val none = RejectionSampling.bestOfN(
      cands.drop("text"), "prompt_id", "resp_id", "reward", minReward = 0.95)
    assert(none.count() == 0)
  }
}
