package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learn reproduces the textbook merge sequence") {
    // "abab"×3, "ab"×2 → round 1 merges (a,b) (count 8), round 2 merges
    // ("ab","ab") (count 3)
    val docs = Seq(
      (1L, "abab abab ab"), (2L, "abab ab")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.learn(docs, "text", rounds = 2)
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "b"), ("ab", "ab")))
    assert(merges.head._3 == 8L)
    val finalSyms = syms.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(finalSyms("abab") == Seq("abab"))
    assert(finalSyms("ab") == Seq("ab"))
  }

  test("greedy leftmost rule: aaa + merge(a,a) → [aa, a]") {
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"))
      .toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "a"), Seq("aa", "aa")))
  }

  test("merge application leaves non-matching sequences untouched") {
    val df = Seq(Seq("x", "y", "z")).toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "b").as("m"))
      .as[Seq[String]].head()
    assert(got == Seq("x", "y", "z"))
  }

  test("pair counts are frequency-weighted") {
    val types = Seq(("ab", 5L), ("ba", 2L)).toDF("word", "freq")
    val pc = Bpe.pairCounts(Bpe.initSymbols(types))
      .as[(String, String, Long)].collect().toSet
    assert(pc == Set(("a", "b", 5L), ("b", "a", 2L)))
  }

  test("learn stops when no pairs remain") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text") // all 1-char words
    val (merges, _) = Bpe.learn(docs, "text", rounds = 3)
    assert(merges.isEmpty)
  }
}
