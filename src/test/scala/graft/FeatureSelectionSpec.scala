package graft

import graft.text.FeatureSelection

class FeatureSelectionSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "x foo a", 1), (2L, "x foo b", 1), (3L, "x foo c", 1),
    (4L, "x bar a", 0), (5L, "x bar b", 0), (6L, "x baz c", 0))
    .toDF("doc_id", "text", "label")

  test("a perfectly label-aligned token tops the ranking") {
    val got = FeatureSelection
      .tokenLabelMi(docs, "doc_id", "text", "label", topK = 20)
      .select("t", "n_t", "n_t1", "mi")
      .as[(String, Long, Long, Double)].collect()
    assert(got.head._1 === "foo")
    assert((got.head._2, got.head._3) === (3L, 3L))
    // foo's MI is exactly H(label) = ln 2 (quantized)
    assert(math.abs(got.head._4 - math.log(2)) < 2e-6)
  }

  test("a token present in every document carries zero information") {
    val got = FeatureSelection
      .tokenLabelMi(docs, "doc_id", "text", "label", topK = 20)
      .select("t", "mi_micro").as[(String, Long)].collect().toMap
    assert(got("x") === 0L)
  }

  test("partially-aligned tokens rank between aligned and uniform") {
    val got = FeatureSelection
      .tokenLabelMi(docs, "doc_id", "text", "label", topK = 20)
      .select("t", "mi").as[(String, Double)].collect().toMap
    // 'a' appears once per class → near-zero MI; 'bar' only in class 0
    assert(got("bar") > got("a"))
    assert(got("foo") >= got("bar"))
    assert(got("a") >= 0.0 || math.abs(got("a")) < 2e-6)
  }
}
