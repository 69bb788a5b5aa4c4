package graft

import org.apache.spark.sql.functions._

import graft.text.Bleu

class BleuSpec extends SparkSpec {
  import spark.implicits._

  private def score(cand: String, ref: String) = {
    val df = Seq((1L, cand.split(" ").toSeq, ref.split(" ").toSeq))
      .toDF("pair_id", "cand_toks", "ref_toks")
    Bleu.bleu2(df).collect()(0)
  }

  test("hand-computed clipped precisions") {
    // cand: the:2 cat:2 sat:1 → m1 = min(2,2)+min(2,1)+min(1,1) = 4
    // cand bigrams: "the cat"×2 "cat the" "cat sat" → m2 = 1+1 = 2
    val r = score("the cat the cat sat", "the cat sat the dog")
    assert(r.getInt(1) == 5 && r.getInt(2) == 5)
    assert(r.getDouble(3) == 0.8)    // 4/5
    assert(r.getDouble(4) == 0.5)    // 2/4
    assert(r.getDouble(5) == 0.632456) // sqrt(0.4) rounded
  }

  test("identical texts score 1.0 everywhere") {
    val r = score("a b c d e", "a b c d e")
    assert(r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0 &&
      r.getDouble(5) == 1.0)
  }

  test("disjoint texts score 0.0 (left joins survive empty overlap)") {
    val r = score("a b c", "x y z")
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.0)
  }

  test("clipping caps repeated candidate grams at reference counts") {
    // cand repeats "a" 5×; ref has it once → m1 = 1, p1 = 0.2
    val r = score("a a a a a", "a b c d e")
    assert(r.getDouble(3) == 0.2)
    assert(r.getDouble(4) == 0.0) // "a a" never occurs in ref
  }

  test("pairs with under 2 tokens on either side are dropped") {
    val df = Seq(
      (1L, Seq("a"), Seq("a", "b")),
      (2L, Seq("a", "b"), Seq("b"))).toDF("pair_id", "cand_toks", "ref_toks")
    assert(Bleu.bleu2(df).count() == 0)
  }

  test("bigrams of a short array is empty, not an ANSI index error") {
    val out = Seq(Tuple1(Seq("solo")))
      .toDF("t").select(Bleu.bigrams(col("t")).as("b"))
      .collect()(0).getSeq[String](0)
    assert(out.isEmpty)
  }

  test("bigrams helper is positional, not distinct") {
    val out = Seq(Tuple1(Seq("x", "y", "x", "y")))
      .toDF("t").select(Bleu.bigrams(col("t")).as("b"))
      .collect()(0).getSeq[String](0)
    assert(out == Seq("x y", "y x", "x y"))
  }
}
