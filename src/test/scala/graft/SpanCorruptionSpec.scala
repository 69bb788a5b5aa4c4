package graft

import graft.text.{SpanCorruption, TextFunctions}

class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(docs: Seq[(Long, String)]) =
    SpanCorruption.corrupt(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))).toMap

  /** Undo the corruption: splice each sentinel's target span back into
    * the input — must reproduce the normalized original exactly.
    */
  private def reconstruct(input: String, target: String): String = {
    val bySentinel = "<extra_id_(\\d+)>".r.findAllMatchIn(target)
      .map(_.group(1)).toSeq
      .zip("<extra_id_\\d+> ?".r.split(target).drop(1))
      .toMap
    input.split(" ").flatMap { t =>
      "<extra_id_(\\d+)>".r.findFirstMatchIn(t) match {
        case Some(m) => bySentinel(m.group(1)).trim.split(" ").toSeq
        case None => Seq(t)
      }
    }.mkString(" ")
  }

  test("splicing targets back into the input reproduces the original") {
    val docs = Seq(
      (1L, ("alpha beta gamma delta " * 12).trim), // 48 tokens, 3 blocks
      (2L, "one two three four five six seven"),   // partial single block
      (3L, "solo"))
    val out = pairs(docs)
    docs.foreach { case (id, text) =>
      val norm = text.toLowerCase
      val (input, target, _, _) = out(id)
      assert(reconstruct(input, target) == norm, s"doc $id")
    }
  }

  test("one span per full block at the 15% T5 rate") {
    val (input, target, nSpans, nCorrupted) =
      pairs(Seq((7L, ("tok " * 60).trim)))(7L)
    assert(nSpans == 3) // 60 tokens = 3 full blocks
    assert(nCorrupted == 9) // 3 tokens per span = 15% of 60
    assert("<extra_id_\\d+>".r.findAllIn(input).size == 3)
    // sentinels appear once in input and once in target, same ids
    val inIds = "<extra_id_(\\d+)>".r.findAllMatchIn(input)
      .map(_.group(1)).toSeq
    val tgIds = "<extra_id_(\\d+)>".r.findAllMatchIn(target)
      .map(_.group(1)).toSeq
    assert(inIds == tgIds && inIds == inIds.sorted)
  }

  test("placement is deterministic and matches the portable hash") {
    val a = pairs(Seq((5L, (0 until 40).map(i => s"t$i").mkString(" "))))(5L)
    val b = pairs(Seq((5L, (0 until 40).map(i => s"t$i").mkString(" "))))(5L)
    assert(a == b)
    // the sentinel in block 0 sits exactly at hash60("sc", "5_0") % 18
    val off0 = (graft.functions.PortableHash.hash60Local("sc", "5_0") % 18L).toInt
    val inputToks = a._1.split(" ")
    assert(inputToks(off0) == "<extra_id_0>")
    // tokens before the offset are untouched
    (0 until off0).foreach(i => assert(inputToks(i) == s"t$i"))
  }
}
