package graft

import graft.text.Fim

class FimSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven eight"),
    (3L, "solo"))
    .toDF("doc_id", "text")

  test("rate 100 transforms every doc; rate 0 passes all through") {
    val all = Fim.psm(docs, "text", "doc_id", ratePct = 100)
      .select("fim_applied").as[Int].collect()
    assert(all.forall(_ == 1))
    val none = Fim.psm(docs, "text", "doc_id", ratePct = 0)
      .select("fim_applied", "fim_text").as[(Int, String)].collect()
    assert(none.forall(_._1 == 0))
    assert(none.map(_._2).sorted.head === "alpha beta gamma delta epsilon zeta")
  }

  test("PSM pieces reassemble to the original token sequence") {
    val rows = Fim.psm(docs, "text", "doc_id", ratePct = 100)
      .select("doc_id", "fim_text").as[(Long, String)].collect().toMap
    val originals = Map(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "one two three four five six seven eight",
      3L -> "solo")
    rows.foreach { case (id, t) =>
      val m = "<PRE> (.*) <SUF> (.*) <MID> (.*)".r
      t match {
        case m(pre, suf, mid) =>
          val rebuilt = Seq(pre, mid, suf).filter(_.nonEmpty).mkString(" ")
          assert(rebuilt === originals(id), s"doc $id")
        case _ => fail(s"doc $id not in PSM shape: $t")
      }
    }
  }

  test("transform is deterministic per document") {
    val a = Fim.psm(docs, "text", "doc_id").orderBy("doc_id").collect()
    val b = Fim.psm(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }
}
