package graft

import org.apache.spark.sql.functions._

import graft.text.NlpExtract

class NlpExtractSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "Use the `parse_file()` API to parse parse parse a file with the parser"),
    (2L, "the cache and the http socket share a thread pool in the database"))
    .toDF("id", "text")

  test("code refs extracted from backticks") {
    val refs = docs.select(NlpExtract.codeRefs(col("text")).as("r"))
      .as[Seq[String]].collect()
    assert(refs(0) == Seq("parse_file()"))
    assert(refs(1).isEmpty)
  }

  test("technical terms are dictionary hits, deduped") {
    val terms = docs.select(NlpExtract.technicalTerms(col("text")).as("t"))
      .as[Seq[String]].collect()
    assert(terms(0).toSet == Set("api", "parser"))
    assert(terms(1).toSet == Set("cache", "http", "socket", "thread", "database"))
  }

  test("keywords ranked by frequency with deterministic ties") {
    val kw = docs.filter(col("id") === 1)
      .select(NlpExtract.keywords(col("text"), 3).as("k"))
      .as[Seq[String]].collect().head
    assert(kw.head == "parse") // tf 4 dominates
    assert(kw.length == 3)
    // determinism: run twice, same output
    val kw2 = docs.filter(col("id") === 1)
      .select(NlpExtract.keywords(col("text"), 3).as("k"))
      .as[Seq[String]].collect().head
    assert(kw == kw2)
  }
}
