package graft

import org.apache.spark.sql.functions._

import graft.graph.Relationships
import graft.search.SearchEngine

/** Relationships (related_chunks) — `core/relationships.py:34-473`. */
class RelationshipsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val (chunks, vectors) = {
    val (c, v) = new SearchEngine(spark).buildIndex(sampleRepo)
    (c.cache(), v.cache())
  }

  test("semantic links: per-chunk cap, no self, thresholds hold") {
    val links = Relationships.semanticLinks(vectors, vecCol = "vector",
      searchThreshold = 0.1, linkThreshold = 0.1)
    val rows = links.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[String]("chunk_id") !=
      r.getAs[String]("related_id")))
    assert(rows.forall(_.getAs[Double]("score") >= 0.1))
    val perChunk = links.groupBy("chunk_id").count()
      .agg(max("count")).as[Long].head()
    assert(perChunk <= 5)
  }

  test("caller links: load_config calls parse_file -> caller edge exists") {
    val callers = Relationships.callerLinks(chunks).collect()
    assert(callers.nonEmpty)
    val pf = chunks.filter(col("name") === "parse_file")
      .select("chunk_id").as[String].head()
    val lc = chunks.filter(col("name") === "load_config")
      .select("chunk_id").as[String].head()
    assert(callers.exists(r => r.getAs[String]("chunk_id") == pf &&
      r.getAs[String]("related_id") == lc))
    // no self-calls surface
    assert(callers.forall(r => r.getAs[String]("chunk_id") !=
      r.getAs[String]("related_id")))
  }

  test("indexRepo produces the related_chunks artifact at index time") {
    val dir = java.nio.file.Files.createTempDirectory("relidx").toString
    new SearchEngine(spark).indexRepo(sampleRepo,
      s"$dir/chunks", s"$dir/vectors", relatedPath = Some(s"$dir/related"))
    val related = Relationships.read(spark, s"$dir/related")
    assert(related.count() > 0)
    assert(related.columns.sorted.toSeq ==
      Seq("chunk_id", "kind", "related_id", "score"))
    // caller links present (semantic links depend on corpus sims)
    assert(related.filter(col("kind") === "caller").count() > 0)
  }

  test("build unions kinds and persists round-trip") {
    val related = Relationships.build(chunks, vectors, vecCol = "vector")
    val kinds = related.select("kind").distinct().as[String].collect().toSet
    assert(kinds.contains("caller"))
    assert(kinds.subsetOf(Set("semantic", "caller")))
    val path = java.nio.file.Files
      .createTempDirectory("relspec").toString + "/related"
    Relationships.write(spark, related, path)
    val back = Relationships.read(spark, path)
    assert(back.count() == related.count())
    assert(back.columns.sorted.toSeq ==
      Seq("chunk_id", "kind", "related_id", "score"))
  }
}
