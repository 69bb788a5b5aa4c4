package graft

import graft.sketch.Bloom

/** Bloom: no false negatives ever, exact-match hits, bounded filter
  * size, and a deliberately saturated filter showing the false-positive
  * (never false-negative) failure direction.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = (0 until 200).map(i => s"doc text number $i")

  test("every inserted key is maybe_present (no false negatives)") {
    val keys = corpus.toDF("k")
    val f = Bloom.build(keys, "k", d = 5, m = 65536)
    val out = Bloom.probe(keys.distinct(), "k", f, d = 5, m = 65536)
      .collect().map(r => r.getString(0) -> r.getAs[Boolean]("maybe_present"))
    assert(out.length === 200)
    assert(out.forall(_._2), "an inserted key probed absent")
  }

  test("absent keys probe absent when the filter has headroom") {
    val f = Bloom.build(corpus.toDF("k"), "k", d = 5, m = 65536)
    val absent = (0 until 200).map(i => s"novel probe string $i").toDF("k")
    val hits = Bloom.probe(absent, "k", f, d = 5, m = 65536)
      .filter("maybe_present").count()
    // fp rate ≈ (1 - e^(-1000/65536))^5 ≈ 8e-10 — any hit here means
    // the construction is broken, not unlucky
    assert(hits === 0L)
  }

  test("a saturated filter over-admits but never rejects members") {
    // 200 keys × 5 hashes into 32 bits: nearly every bit set
    val f = Bloom.build(corpus.toDF("k"), "k", d = 5, m = 32)
    val members = Bloom.probe(corpus.toDF("k").distinct(), "k", f, 5, 32)
      .filter("NOT maybe_present").count()
    assert(members === 0L)
  }

  test("filter relation is bounded by m rows") {
    assert(Bloom.build(corpus.toDF("k"), "k", d = 5, m = 64).count() <= 64L)
  }
}
