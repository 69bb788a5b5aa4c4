package graft

import graft.text.VocabGrowth

class VocabGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("curve counts new types at their first document, cumulatively") {
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a d e"))
      .toDF("doc_id", "text")
    val rows = VocabGrowth.curve(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows === Seq(
      (1L, 2L, 2L, 2L, 2L),
      (2L, 2L, 1L, 4L, 3L),
      (3L, 3L, 2L, 7L, 5L)))
  }

  test("final cumulative vocab equals the distinct type count") {
    val docs = (1 to 60)
      .map(i => (i.toLong, s"w${i % 7} w${i % 11} w${i % 13}"))
      .toDF("doc_id", "text")
    val last = VocabGrowth.curve(docs, "text", "doc_id")
      .orderBy(org.apache.spark.sql.functions.col("doc_id").desc)
      .limit(1)
      .select("cum_vocab").as[Long].head()
    val distinct = docs
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split($"text", " ")))
      .distinct().count()
    assert(last === distinct)
  }
}
