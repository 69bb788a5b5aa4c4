package graft

/** Wiring smoke for the a4/a6 recall-at-scale stress rows (r12,
  * VERDICT r11 #6): the family first runs for real inside the bench's
  * stress fork, so a wiring bug (schema drift, wrong join keys, a
  * self-match slipping through) must fail HERE, not in a round
  * artifact. Recall floors at this tiny size are deliberately loose —
  * the ≥ 0.9 claim is guarded by the x10/x100 rows via the inverted
  * recall guard.
  */
class QuantRecallStressSpec extends SparkSpec {
  test("a4/a6 recall rows: wiring, bounds, and non-degenerate recall") {
    val (a4, a6) = Stress.quantRecallStress(spark, 2000L)
    assert(a4 >= 0.0 && a4 <= 1.0, s"a4 recall out of range: $a4")
    assert(a6 >= 0.0 && a6 <= 1.0, s"a6 recall out of range: $a6")
    // int8 + refine=3 resolves far below the fixture's noise scale
    assert(a4 >= 0.8, s"a4 recall@10 = $a4")
    // PQ (m=8, ksub=16) is the coarse path; still must beat chance
    assert(a6 >= 0.3, s"a6 recall@10 = $a6")
  }
}
