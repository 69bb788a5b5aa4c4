package graft

import org.apache.spark.sql.functions._

import graft.search.Phrase
import graft.text.TextFunctions

class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private def search(docs: Seq[(Long, String)], phrase: Seq[String],
      k: Int = 10) = {
    val p = Phrase.positionalPostings(
      docs.toDF("doc_id", "text"), "doc_id", TextFunctions.tokens)
    Phrase.phraseSearch(p, phrase, k).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
  }

  test("adjacent tokens match; scattered tokens do not") {
    val docs = Seq(
      1L -> "the quick brown fox",
      2L -> "quick and also brown",   // both words, not adjacent
      3L -> "very quick brown quick brown thing")
    assert(search(docs, Seq("quick", "brown")) ==
      Seq(3L -> 2L, 1L -> 1L))
  }

  test("three-term phrase only matches the full run") {
    val docs = Seq(
      1L -> "fast table scan wins",
      2L -> "fast table but no match scan",
      3L -> "a fast table scan and another fast table scan")
    assert(search(docs, Seq("fast", "table", "scan")) ==
      Seq(3L -> 2L, 1L -> 1L))
  }

  test("repeated term in phrase requires a genuine repeat") {
    val docs = Seq(
      1L -> "buffalo buffalo roam",
      2L -> "buffalo roam buffalo")
    assert(search(docs, Seq("buffalo", "buffalo")) == Seq(1L -> 1L))
  }

  test("overlapping occurrences all count") {
    assert(search(Seq(1L -> "go go go go"), Seq("go", "go")) ==
      Seq(1L -> 3L))
  }

  test("normalization applies: punctuation and case fold away") {
    val docs = Seq(1L -> "Fast, TABLE scan!")
    assert(search(docs, Seq("fast", "table", "scan")) == Seq(1L -> 1L))
  }

  test("phrase absent from corpus returns empty") {
    assert(search(Seq(1L -> "nothing here"), Seq("missing", "phrase")).isEmpty)
  }

  private def prox(docs: Seq[(Long, String)], a: String, b: String) = {
    val p = Phrase.positionalPostings(
      docs.toDF("doc_id", "text"), "doc_id", TextFunctions.tokens)
    Phrase.proximityPairs(p, a, b)
      .select("id", "n_a", "n_b", "min_dist")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1).toSeq
  }

  test("proximity: min distance over all occurrence pairs, both orders") {
    val docs = Seq(
      1L -> "x a y y y b a z", // a@1,6 b@5 → min |6-5| = 1
      2L -> "b y y a",         // b@0 a@3 → 3
      3L -> "a only here")     // missing b → absent
    assert(prox(docs, "a", "b") ===
      Seq((1L, 2, 1, 1), (2L, 1, 1, 3)))
  }

  test("proximity ranks adjacent above scattered and caps at k") {
    val docs = Seq(
      1L -> "q w a b e r t",
      2L -> "a x x x x x x x b",
      3L -> "a x b")
    val got = prox(docs, "a", "b").sortBy(_._4)
    assert(got.map(_._1) === Seq(1L, 3L, 2L))
    assert(got.map(_._4) === Seq(1, 2, 8))
    val p = Phrase.positionalPostings(
      docs.toDF("doc_id", "text"), "doc_id", TextFunctions.tokens)
    assert(Phrase.proximityPairs(p, "a", "b", k = 2).count() === 2)
  }
}
