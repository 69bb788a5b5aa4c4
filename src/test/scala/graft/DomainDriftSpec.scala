package graft

import graft.text.DomainDrift

class DomainDriftSpec extends SparkSpec {
  import spark.implicits._

  test("a domain distributed like the corpus has exactly zero KL") {
    // both domains share the same token distribution → every log-ratio
    // is ln(1) = 0, and floor(0) = 0 exactly
    val docs = Seq(
      ("a", "x x y"), ("a", "x y y x"),
      ("b", "x x y y"), ("b", "x y x")).toDF("source", "text")
    // make both domains exactly 4x:3y? a: x x y x y y x = 4x 3y; b: 4x 3y
    val got = DomainDrift.unigramKl(docs, "source", "text")
      .select("source", "n_tokens", "vocab", "sum_micro_nats", "kl_nats")
      .as[(String, Long, Int, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(7L, 7L))
    assert(got.forall(_._4 === 0L))
    assert(got.forall(_._5 === 0.0))
  }

  test("a skewed domain scores positive KL, matching the closed form") {
    // corpus: dom a = 3x 1y, dom b = 1x 3y → corpus 4x 4y (p_c = 1/2)
    val docs = Seq(("a", "x x x y"), ("b", "x y y y"))
      .toDF("source", "text")
    val got = DomainDrift.unigramKl(docs, "source", "text")
      .select("source", "kl_nats").as[(String, Double)].collect().toMap
    // KL = 3/4 ln(3/2) + 1/4 ln(1/2), quantized per type then averaged
    val qx = math.floor(math.log(1.5) * 1e6).toLong
    val qy = math.floor(math.log(0.5) * 1e6).toLong
    val expected = BigDecimal((3 * qx + 1 * qy) / 4.0 / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") === expected)
    assert(got("a") > 0.0 && got("b") > 0.0)
  }

  test("embedding drift: aligned domain sims 1.0, orthogonal domain lower") {
    // domain a vectors all on axis 1; domain b on axis 2. Corpus
    // centroid sits between → equal sims; a lone domain c ON the
    // corpus diagonal scores highest.
    val rows =
      (1 to 4).map(i => ("a", Array(1f, 0f))) ++
      (1 to 4).map(i => ("b", Array(0f, 1f))) :+ ("c", Array(1f, 1f))
    val got = DomainDrift.embeddingDrift(
        rows.toDF("source", "vec"), "source", "vec")
      .select("source", "n_docs", "centroid_sim")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq ===
      Seq(("a", 4L), ("b", 4L), ("c", 1L)))
    val sims = got.map(r => r._1 -> r._3).toMap
    assert(sims("a") === sims("b"))
    assert(sims("c") > sims("a"))
    assert(sims.values.forall(s => s > 0.0 && s <= 1.0))
  }

  test("quantized KL is invariant to input partitioning") {
    val docs = (1 to 200).map(i =>
      (s"d${i % 5}", if (i % 3 == 0) "x y z w" else "x x y"))
      .toDF("source", "text")
    val a = DomainDrift.unigramKl(docs, "source", "text")
      .select("source", "sum_micro_nats").as[(String, Long)]
      .collect().toMap
    val b = DomainDrift.unigramKl(docs.repartition(13), "source", "text")
      .select("source", "sum_micro_nats").as[(String, Long)]
      .collect().toMap
    assert(a === b)
  }
}
