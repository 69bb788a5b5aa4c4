package graft

import org.apache.spark.sql.functions._

import graft.analyze.Themes
import graft.search.Boilerplate

/** Story theme clustering (story/analyzer.py:146-233) and the
  * language-aware boilerplate penalty (core/boilerplate.py).
  */
class ThemesBoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("theme clustering: one batched pass yields per-theme clusters") {
    val engine = new graft.search.SearchEngine(spark)
    val (_, vectors) = engine.buildIndex(sampleRepo)
    val clusters = Themes.codeThemes(spark, vectors, limit = 10, threshold = 0.0)
    val rows = clusters.collect()
    assert(rows.length == Themes.ThemeQueries.length)
    rows.foreach { r =>
      val files = r.getSeq[String](r.fieldIndex("files"))
      assert(files.nonEmpty && files.length <= 5)
      assert(files == files.sorted)
      assert(r.getAs[Long]("n_results") <= 10)
      assert(Set("HIGH", "MEDIUM", "LOW")(r.getAs[String]("confidence")))
      assert(r.getSeq[String](r.fieldIndex("code_snippets")).nonEmpty)
    }
  }

  test("theme clustering plan: per-theme window, no unpartitioned WindowExec") {
    val engine = new graft.search.SearchEngine(spark)
    val (_, vectors) = engine.buildIndex(sampleRepo)
    val plan = Themes.codeThemes(spark, vectors)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(plan.contains("partitionBy") || plan.contains("theme"))
  }

  test("boilerplate penalty: language sets, query override, unknown language") {
    val rows = Seq(
      ("__init__", "python", 1),
      ("constructor", "typescript", 2),
      ("initialize", "ruby", 3),
      ("__construct", "php", 4),
      ("build", "dart", 5),
      ("custom_fn", "python", 6),   // not boilerplate
      ("__init__", "go", 7))        // unknown language → no penalty
      .toDF("name", "language", "id")
    val out = rows.select(col("id"),
      Boilerplate.penalty(col("name"), col("language"), "search classes").as("p"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(out(1) == -0.15 && out(2) == -0.15 && out(3) == -0.15 &&
      out(4) == -0.15 && out(5) == -0.15)
    assert(out(6) == 0.0 && out(7) == 0.0)
  }

  test("boilerplate penalty waived when the query names the pattern") {
    val rows = Seq(("__init__", "python")).toDF("name", "language")
    val waived = rows.select(
      Boilerplate.penalty(col("name"), col("language"), "find __init__ methods").as("p"))
      .head().getDouble(0)
    assert(waived == 0.0)
  }

  test("engine boost applies the language-aware penalty") {
    val engine = new graft.search.SearchEngine(spark)
    val results = Seq(
      ("c1", "__init__", "python", "def __init__(self): pass", "a.py", "function", 0.5),
      ("c2", "parse_doc", "python", "def parse_doc(x): pass", "a.py", "function", 0.5))
      .toDF("chunk_id", "name", "language", "content", "file_path", "chunk_type",
        "similarity_score")
    val boosted = engine.boost(results, "some query", "similarity_score")
      .select("chunk_id", "boosted").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(boosted("c1") < boosted("c2"))
  }
}
