package graft

import graft.graph.Anchors

class AnchorsSpec extends SparkSpec {
  import spark.implicits._

  test("top anchors rank by count with text tiebreak; totals ride along") {
    val links = Seq(
      (1L, 10L, "click here"), (2L, 10L, "click here"),
      (3L, 10L, "the docs"), (4L, 10L, "api reference"),
      (5L, 10L, "the docs"), (6L, 10L, "zzz last"),
      (7L, 20L, "solo"))
      .toDF("src", "dst", "anchor")
    val out = Anchors.topAnchors(links, k = 3)
      .orderBy("dst", "rank")
      .as[(Long, Int, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (10L, 1, "click here", 2L, 6L),
      (10L, 2, "the docs", 2L, 6L),
      (10L, 3, "api reference", 1L, 6L),
      (20L, 1, "solo", 1L, 1L)))
  }

  test("k caps the anchors per target, not the inlink total") {
    val links = (1 to 9).map(i => (i.toLong, 1L, s"anchor$i"))
      .toDF("src", "dst", "anchor")
    val out = Anchors.topAnchors(links, k = 2).collect()
    assert(out.length === 2)
    assert(out.forall(_.getAs[Long]("n_inlinks") == 9L))
  }
}
