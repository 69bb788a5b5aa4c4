package graft

import graft.analyze.Privacy
import graft.text.Entropy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymize suppresses groups below k and releases the rest") {
    val df = (Seq.fill(6)(("en", "a")) ++ Seq.fill(2)(("en", "b")) ++
      Seq.fill(5)(("de", "a"))).toDF("lang", "src")
    val out = Privacy.kAnonymize(df, Seq("lang", "src"), k = 5)
      .orderBy("lang", "src")
      .as[(String, String, Long, Int)].collect().toSeq
    assert(out === Seq(("de", "a", 5L, 1), ("en", "a", 6L, 1),
      ("en", "b", 2L, 0)))
  }

  test("dpCounts releases only noisy counts over tau, deterministically") {
    val df = (Seq.fill(50)("big") ++ Seq.fill(2)("tiny")).toDF("g")
    val a = Privacy.dpCounts(df, Seq("g"), epsilon = 1.0, tau = 10.0)
      .as[(String, Double)].collect().toSeq
    val b = Privacy.dpCounts(df, Seq("g"), epsilon = 1.0, tau = 10.0)
      .as[(String, Double)].collect().toSeq
    assert(a === b)
    assert(a.map(_._1) === Seq("big"))
    // Laplace(1) noise: |noisy - true| within a generous tail bound
    assert(math.abs(a.head._2 - 50.0) < 25.0)
  }

  test("dpCounts noise differs across groups (hash-derived, not constant)") {
    val df = (1 to 40).flatMap(i => Seq.fill(20)(s"g$i")).toDF("g")
    val noises = Privacy.dpCounts(df, Seq("g"), 1.0, tau = 0.0)
      .as[(String, Double)].collect().map(_._2 - 20.0)
    assert(noises.distinct.length > 30)
    assert(noises.exists(_ > 0) && noises.exists(_ < 0))
  }

  test("tokenEntropy: uniform tokens hit ln(n_types); repeats hit zero") {
    val docs = Seq(
      (1L, "a b c d"), // 4 distinct, uniform → ln(4)
      (2L, "x x x x") // one type → 0
    ).toDF("doc_id", "text")
    val rows = Entropy.tokenEntropy(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(math.abs(rows(0)._4 - math.log(4)) < 1e-5)
    assert(rows(0)._5 === 1.0)
    assert(rows(1)._4 === 0.0)
    assert(rows(1)._5 === 0.25)
  }
}
