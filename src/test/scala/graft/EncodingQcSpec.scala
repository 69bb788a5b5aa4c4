package graft

import graft.text.{Augment, EncodingQc}

class EncodingQcSpec extends SparkSpec {
  import spark.implicits._

  private def screen(text: String) =
    EncodingQc.screen(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("n_chars", "n_ctrl", "n_repl", "n_nonascii", "verdict")
      .as[(Int, Int, Int, Int, String)].head()

  test("clean ascii keeps; counts are zero") {
    assert(screen("plain ascii text") === ((16, 0, 0, 0, "keep")))
  }

  test("one replacement char flags; tabs and newlines do not") {
    assert(screen("ok\tbut\nclean")._5 === "keep")
    val r = screen("decode scar � here")
    assert(r._3 === 1 && r._5 === "flag")
  }

  test("control characters are counted and flag") {
    val r = screen("bell and esc")
    assert(r._2 === 2 && r._5 === "flag")
  }

  test("mostly non-ascii text flags by ratio; a light accent does not") {
    assert(screen("дёжà вü çöntént")._5 === "flag")
    val light = screen("mostly ascii with one é accent only here")
    assert(light._4 === 1 && light._5 === "keep")
  }

  test("supplementary-plane chars count as code points, not UTF-16 units") {
    // expected values computed in DuckDB (the oracle engine):
    // length('a😀b😀') = 4, nonascii = 2 — if Spark counted UTF-16
    // code units these would be 6 and 4 and the gar1 gate would skew
    val r = screen("a😀b😀")
    assert(r === ((4, 0, 0, 2, "flag")))
    val ratio = EncodingQc.screen(
        Seq((1L, "ascii text 😀")).toDF("doc_id", "text"),
        "doc_id", "text")
      .select("n_chars", "n_nonascii", "nonascii_ratio")
      .as[(Int, Int, Double)].head()
    assert(ratio === ((12, 1, 0.083333)))
  }

  test("word dropout is deterministic, bounded, and seed-sensitive") {
    val docs = (1L to 50L).map(i => (i, ("w" * 1) + (1 to 40)
      .map(j => s"t$j").mkString(" ", " ", ""))).toDF("doc_id", "text")
    val a = Augment.wordDropout(docs, "doc_id", "text")
      .select("doc_id", "n_orig", "n_kept", "aug_sha256")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    val b = Augment.wordDropout(docs.repartition(7), "doc_id", "text")
      .select("doc_id", "n_orig", "n_kept", "aug_sha256")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(r => r._3 <= r._2 && r._3 >= r._2 - 12))
    // roughly 10% drops overall
    val dropped = a.map(r => r._2 - r._3).sum.toDouble / a.map(_._2).sum
    assert(dropped > 0.03 && dropped < 0.2)
    // a different seed yields different masks somewhere
    val c = Augment.wordDropout(docs, "doc_id", "text", seed = 1)
      .select("aug_sha256").as[String].collect().toSet
    assert(c !== a.map(_._4).toSet)
  }
}
