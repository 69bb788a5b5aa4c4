package graft

import org.apache.spark.sql.functions._

import graft.dedup.Winnow

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def fps(text: String, k: Int = 2, w: Int = 3): Seq[(Long, Long)] =
    Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
        "text", "doc_id", k, w)
      .select("pos", "fp").as[(Long, Long)].collect().toSeq.sortBy(_._1)

  test("every full window of w grams contains a selected position") {
    val text = (1 to 40).map(i => s"tok${i % 9}").mkString(" ")
    val k = 3; val w = 4
    val sel = fps(text, k, w).map(_._1).toSet
    val nGrams = 40 - k + 1
    (0 to nGrams - w).foreach { p =>
      assert((p until p + w).exists(q => sel.contains(q.toLong)),
        s"window starting at $p has no selected fingerprint")
    }
  }

  test("density is well below 1 (≈ 2/(w+1))") {
    val text = (1 to 200).map(i => s"w${i % 23}").mkString(" ")
    val sel = fps(text, 3, 8)
    assert(sel.size < 200 / 2)
  }

  test("ties select the rightmost minimal hash (identical grams)") {
    // 8 identical tokens, k=2 → 7 identical grams; each full window's
    // min is the shared hash and the RIGHTMOST position wins.
    val sel = fps(Seq.fill(8)("a").mkString(" "), 2, 4).map(_._1)
    assert(sel === Seq(3L, 4L, 5L, 6L))
  }

  test("documents shorter than k produce no fingerprints") {
    assert(fps("a b", k = 4, w = 2).isEmpty)
  }
}
