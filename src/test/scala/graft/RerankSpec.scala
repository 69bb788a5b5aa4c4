package graft

import org.apache.spark.sql.functions._

import graft.search.{FeatureScorer, Rerank}

/** Ordering quality of the Q10 rerank stage against a labeled fixture —
  * the reference's cross-encoder exists to put jointly-relevant
  * documents first, so that property (not just pipeline position) is
  * what these tests pin down.
  */
class RerankSpec extends SparkSpec {
  import spark.implicits._

  // (query, doc_id, content, graded relevance 0-3)
  private val fixture: Seq[(String, String, String, Int)] = Seq(
    // q1: exact phrase + full coverage beats scattered terms beats one term
    ("parse file into chunks", "d1", "def parse_file(path): split a file into chunks for indexing", 3),
    ("parse file into chunks", "d2", "chunks are stored after we parse each file eventually", 2),
    ("parse file into chunks", "d3", "parse the configuration flags", 1),
    ("parse file into chunks", "d4", "class ConnectionPool: manage database sockets", 0),
    ("parse file into chunks", "d5", "file utilities for path joins", 1),
    // q2: identifier-style query
    ("build_index", "e1", "def build_index(corpus): construct the inverted index", 3),
    ("build_index", "e2", "the index build pipeline calls build_index internally", 2),
    ("build_index", "e3", "index maintenance and compaction", 1),
    ("build_index", "e4", "render the html template", 0),
    // q3: two-term query, order sensitivity
    ("vector search", "f1", "vector search over the embeddings table with cosine scoring", 3),
    ("f3-pad", "zzz", "padding row", 0),
    ("vector search", "f2", "search every vector bucket for candidates", 2),
    ("vector search", "f4", "binary search over sorted arrays", 1),
    ("vector search", "f5", "regex match helpers", 0))

  private def rankFor(query: String): Seq[(String, Int)] = {
    val docs = fixture.filter(_._1 == query)
      .map { case (_, id, content, rel) => (id, content, rel) }
      .toDF("chunk_id", "content", "rel")
    Rerank(docs, query, keepN = 10)
      .orderBy(col("rank"))
      .select("chunk_id", "rel")
      .as[(String, Int)].collect().toSeq
  }

  private def ndcg(ranked: Seq[Int], k: Int): Double = {
    def dcg(rels: Seq[Int]) = rels.take(k).zipWithIndex.map { case (r, i) =>
      (math.pow(2, r) - 1) / (math.log(i + 2) / math.log(2))
    }.sum
    val ideal = dcg(ranked.sorted.reverse)
    if (ideal == 0) 1.0 else dcg(ranked) / ideal
  }

  test("most relevant document ranks first for every labeled query") {
    for (q <- Seq("parse file into chunks", "build_index", "vector search")) {
      val ranked = rankFor(q)
      assert(ranked.head._2 == 3, s"query '$q' top-1 was ${ranked.head}")
    }
  }

  test("NDCG@5 is near-perfect on the labeled fixture") {
    for (q <- Seq("parse file into chunks", "build_index", "vector search")) {
      val ranked = rankFor(q).map(_._2)
      val score = ndcg(ranked, 5)
      assert(score >= 0.95, s"query '$q' NDCG@5 = $score, ranked = $ranked")
    }
  }

  test("irrelevant documents never outrank relevant ones") {
    for (q <- Seq("parse file into chunks", "build_index", "vector search")) {
      val ranked = rankFor(q)
      val firstZero = ranked.indexWhere(_._2 == 0)
      val lastPositive = ranked.lastIndexWhere(_._2 > 0)
      assert(firstZero == -1 || firstZero > lastPositive,
        s"query '$q': irrelevant doc above a relevant one: $ranked")
    }
  }

  test("scores are sigmoid-bounded in (0, 1) and replace the prior score") {
    val docs = fixture.filter(_._1 == "vector search")
      .map { case (_, id, content, _) => (id, content, 0.99) }
      .toDF("chunk_id", "content", "similarity_score")
    val out = Rerank(docs, "vector search", 10)
    val scores = out.select("rerank_score").as[Double].collect()
    assert(scores.forall(s => s > 0.0 && s < 1.0))
    // ordering is by rerank_score, not the uniform similarity_score
    assert(scores.distinct.length > 1)
  }

  test("pluggable scorer: a constant model yields id-tiebreak ordering") {
    val docs = Seq(("a", "x"), ("b", "y")).toDF("chunk_id", "content")
    val constant = new graft.search.PairScorer {
      def logit(query: String, doc: org.apache.spark.sql.Column) = lit(0.0)
    }
    val out = Rerank(docs, "anything", 2, constant)
      .orderBy(col("rank")).select("chunk_id").as[String].collect()
    assert(out.toSeq == Seq("a", "b"))
  }

  test("feature scorer rewards phrase adjacency over scattered terms") {
    val row = spark.range(1).select(
      FeatureScorer.logit("vector search",
        lit("vector search implementation")).as("adj"),
      FeatureScorer.logit("vector search",
        lit("search all the things in the vector")).as("scattered"))
      .head()
    assert(row.getDouble(0) > row.getDouble(1))
  }
}
