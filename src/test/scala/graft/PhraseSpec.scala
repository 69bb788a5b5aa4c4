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
}
