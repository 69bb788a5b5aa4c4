package graft

import org.apache.spark.sql.functions._

import graft.audit.Audit

/** Auditor data-plane semantics (reference `auditor/claim_router.py`,
  * `evidence_collector.py`, `drift.py`) — the general cases the au1/au2
  * oracles can't express: non-clique greedy dedup, the (0,0) placeholder
  * quirks, routing fallbacks, noise globs.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private def claim(id: String, cat: String, norm: String, kws: Seq[String]) =
    Seq((id, cat, norm, kws)).toDF("claim_id", "category", "normalized", "keywords")

  test("known category routes its strategy plans ranked by weight, YAML order on ties") {
    val plans = Audit.routeClaims(
      claim("c1", "encryption", "data is encrypted at rest", Seq("aes", "keys")))
      .orderBy("plan_rank").collect()
    assert(plans.length == 7) // 6 strategy queries + 1 keyword-interpolated
    val first = plans.head
    assert(first.getAs[String]("tool") == "search_code")
    assert(first.getAs[String]("query").startsWith("AES encrypt"))
    // ties at 0.8: kg_query (seq 2) must precede search_hybrid (seq 3)
    val at08 = plans.filter(_.getAs[Double]("weight") == 0.8).map(_.getAs[String]("tool"))
    assert(at08.head == "kg_query")
    // interpolated plan is last, at weight 0.5, template-substituted
    val last = plans.last
    assert(last.getAs[Double]("weight") == 0.5)
    assert(last.getAs[String]("query") == "aes keys encrypt implementation")
  }

  test("keyword interpolation caps at 8 keywords; absent keywords skip the plan") {
    val many = (1 to 12).map(i => s"k$i")
    val plans = Audit.routeClaims(claim("c1", "retention", "n", many))
      .filter(col("weight") === 0.5).collect()
    assert(plans.length == 1)
    assert(plans.head.getAs[String]("query") ==
      "k1 k2 k3 k4 k5 k6 k7 k8 delete expire retention")
    val none = Audit.routeClaims(claim("c2", "retention", "n", Seq.empty))
      .filter(col("weight") === 0.5).count()
    assert(none == 0)
  }

  test("unknown category falls back to hybrid(normalized) then code(first-5 keywords)") {
    val plans = Audit.routeClaims(
      claim("c1", "mystery", "some policy text", (1 to 7).map(i => s"k$i")))
      .orderBy("plan_rank").collect()
    assert(plans.length == 2)
    assert(plans(0).getAs[String]("tool") == "search_hybrid")
    assert(plans(0).getAs[String]("query") == "some policy text")
    assert(plans(1).getAs[String]("tool") == "search_code")
    assert(plans(1).getAs[String]("query") == "k1 k2 k3 k4 k5")
    // no keywords → code fallback uses normalized too
    val nk = Audit.routeClaims(claim("c2", "mystery", "just text", Seq.empty))
      .orderBy("plan_rank").collect()
    assert(nk(1).getAs[String]("query") == "just text")
  }

  private def ev(rows: (String, Int, Int, Double)*) =
    rows.zipWithIndex.map { case ((f, s0, e0, sc), i) =>
      ("c1", "search_code", "q", i.toLong, f, s0, e0, "snip", sc, 1)
    }.toDF("claim_id", "tool", "query", "id", "file_path", "start_line",
      "end_line", "snippet", "score", "plan_rank")

  test("greedy overlap dedup is chain-aware, not clique-max") {
    // A(1-10, 3.0) kept; B(5-15, 2.0) overlaps A → dropped;
    // C(12-20, 1.0) overlaps only the DROPPED B → kept.
    val kept = Audit.dedupEvidence(ev(
      ("f.py", 1, 10, 3.0), ("f.py", 5, 15, 2.0), ("f.py", 12, 20, 1.0)))
      .orderBy("start_line").collect()
    assert(kept.map(_.getAs[Int]("start_line")).toSeq == Seq(1, 12))
  }

  test("exact-key dedup keeps the best score before the greedy pass") {
    val kept = Audit.dedupEvidence(ev(
      ("f.py", 1, 10, 1.5), ("f.py", 1, 10, 4.0)))
      .collect()
    assert(kept.length == 1 && kept.head.getAs[Double]("score") == 4.0)
  }

  test("(0,0) placeholder ranges: collapse together, never suppress real ranges") {
    val kept = Audit.dedupEvidence(ev(
      ("f.py", 0, 0, 5.0), ("f.py", 0, 0, 4.0), ("f.py", 3, 9, 1.0)))
      .orderBy("start_line").collect()
    assert(kept.length == 2)
    assert(kept.map(_.getAs[Int]("start_line")).toSeq == Seq(0, 3))
  }

  test("dedup is per (claim, file): other files and claims never interact") {
    val rows = Seq(
      ("c1", "t", "q", 1L, "a.py", 1, 10, "s", 3.0, 1),
      ("c1", "t", "q", 2L, "b.py", 1, 10, "s", 1.0, 1),
      ("c2", "t", "q", 3L, "a.py", 1, 10, "s", 0.5, 1))
      .toDF("claim_id", "tool", "query", "id", "file_path", "start_line",
        "end_line", "snippet", "score", "plan_rank")
    assert(Audit.dedupEvidence(rows).count() == 3)
  }

  test("noise-file patterns: stylesheets, ui components, tests, lockfiles") {
    val paths = Seq("app/styles/main.css", "web/ui/button.tsx",
      "src/components/ui/card.jsx", "yarn.lock", "dist/app.js.map",
      "src/core/auth.test.ts", "spec/x.spec.js",
      // NOT noise:
      "src/ui_helpers.py", "src/uikit/view.tsx", "src/test_utils.py",
      "src/main.tsx").toDF("p")
    val flagged = paths.filter(Audit.isNoiseFile(col("p")))
      .as[String].collect().toSet
    assert(flagged == Set("app/styles/main.css", "web/ui/button.tsx",
      "src/components/ui/card.jsx", "yarn.lock", "dist/app.js.map",
      "src/core/auth.test.ts", "spec/x.spec.js"))
  }

  test("drift classifies against the most recent certification only") {
    val cur = Seq(("t1", "pA", "hA"), ("t2", "pA", "hA"))
      .toDF("target", "policy_sha", "head_commit")
    val certs = Seq(
      ("t1", "pA", "hA", 2L), ("t1", "pX", "hX", 1L), // old cert drifted, new matches
      ("t2", "pA", "hA", 1L), ("t2", "pB", "hA", 2L)) // new cert has policy drift
      .toDF("target", "policy_sha", "head_commit", "cert_ts")
    val out = Audit.drift(cur, certs).orderBy("target").collect()
    assert(out(0).getAs[String]("status") == "certified")
    assert(out(1).getAs[String]("status") == "policy_drifted")
  }
}
