package graft

import graft.dedup.Cdc

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def segTexts(docs: Seq[(Long, String)]): Map[Long, Seq[String]] =
    Cdc.segments(docs.toDF("doc_id", "text"), "text", "doc_id",
        k = 2, divisor = 4)
      .orderBy("doc_id", "pos")
      .as[(Long, Int, String, Long)].collect().toSeq
      .groupBy(_._1)
      .map { case (id, rows) =>
        id -> rows.groupBy(_._4).toSeq.sortBy(_._1)
          .map(_._2.map(_._3).mkString(" "))
      }

  test("boundaries are content-local: a prefix insertion leaves later segments intact") {
    val base = (1 to 40).map(i => s"tok${i % 11}").mkString(" ")
    val shifted = "inserted " + base
    val segs = segTexts(Seq((1L, base), (2L, shifted)))
    // everything after the first boundary of doc 1 must reappear in doc 2
    val tail1 = segs(1L).drop(1).toSet
    val all2 = segs(2L).toSet
    assert(tail1.nonEmpty && tail1.subsetOf(all2))
  }

  test("segments tile the document exactly") {
    val text = (1 to 30).map(i => s"w${i % 7}").mkString(" ")
    val segs = segTexts(Seq((1L, text)))(1L)
    assert(segs.mkString(" ") === text)
  }

  test("repeatedSegments finds cross-document repeats only") {
    val shared = (1 to 20).map(i => s"s${i % 5}").mkString(" ")
    val docs = Seq((1L, shared + " unique1 only1"),
      (2L, shared + " unique2 only2"),
      (3L, "totally different words here now"))
    val rep = Cdc.repeatedSegments(docs.toDF("doc_id", "text"),
        "text", "doc_id", k = 2, divisor = 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(rep.nonEmpty)
    assert(rep.forall(_._2 > 1))
    assert(rep.forall(r => !r._1.contains("unique")))
  }
}
