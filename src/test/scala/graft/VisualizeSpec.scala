package graft

import org.apache.spark.sql.functions._

import graft.analyze.Visualize

/** Unit coverage for the visualize-export quality formula and graph
  * shape (the viz1 oracle covers the full frame; these pin the edge
  * semantics ported from graph_builder.py:22-120 in isolation).
  */
class VisualizeSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(name: String, tpe: String, start: Int, end: Int,
      cx: Int, params: Int, nest: Int, parent: String = "") =
    ("src/a/f.py", name, tpe, start, end, cx, params, nest, parent)

  private def df(rows: (String, String, String, Int, Int, Int, Int, Int,
      String)*) =
    rows.toDF("file_path", "name", "chunk_type", "start_line",
      "end_line", "complexity", "n_params", "nesting_depth",
      "parent_name")

  test("complexity 0 falls back to LOC/5 (floored at 1)") {
    val eff = Visualize.qualityMetrics(df(
      chunk("tiny", "function", 1, 2, 0, 0, 0),   // 2 lines -> eff 1.0
      chunk("mid", "function", 1, 40, 0, 0, 0)))  // 40 lines -> eff 8.0
      .select("name", "eff_complexity").as[(String, Double)]
      .collect().toMap
    assert(eff("tiny") == 1.0)
    assert(eff("mid") == 8.0)
  }

  test("every smell rule fires and quality floors at 0") {
    val m = Visualize.qualityMetrics(df(
      // 60 lines, 7 params, nesting 6, cyclomatic 60, class 501 lines:
      chunk("bad", "function", 1, 60, 60, 7, 6),
      chunk("god", "class", 1, 501, 1, 0, 0)))
      .select("name", "smells", "quality_score")
      .as[(String, Seq[String], Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("bad")._1 == Seq("Long Method", "Too Many Parameters",
      "Deep Nesting", "Complex Method"))
    // eff 60 -> base 0.0; minus 4 smells -> floored at 0
    assert(m("bad")._2 == 0.0)
    assert(m("god")._1 == Seq("Long Method", "God Class"))
  }

  test("grade boundaries are inclusive (5/10/20/50)") {
    val g = Visualize.qualityMetrics(df(
      chunk("a", "function", 1, 3, 5, 0, 0),
      chunk("b", "function", 1, 3, 10, 0, 0),
      chunk("c", "function", 1, 3, 20, 0, 0),
      chunk("d", "function", 1, 3, 50, 0, 0),
      chunk("f", "function", 1, 3, 51, 0, 0)))
      .select("name", "complexity_grade").as[(String, String)]
      .collect().toMap
    assert(g == Map("a" -> "A", "b" -> "B", "c" -> "C", "d" -> "D",
      "f" -> "F"))
  }

  test("hierarchy links only materialize for parents that exist") {
    val links = Visualize.graphLinks(df(
      chunk("C", "class", 1, 10, 1, 0, 0),
      chunk("m", "method", 2, 5, 1, 0, 0, parent = "C"),
      chunk("orphan", "method", 6, 9, 1, 0, 0, parent = "Ghost")))
      .filter(col("link_type") === "chunk_hierarchy")
      .select("source", "target").as[(String, String)].collect()
    assert(links.toSeq == Seq(
      ("chunk:src/a/f.py:C", "chunk:src/a/f.py:m")))
  }

  test("export plan has no windows and no cartesian joins") {
    val plan = Visualize.graphExport(df(
      chunk("C", "class", 1, 10, 1, 0, 0),
      chunk("m", "method", 2, 5, 1, 0, 0, parent = "C")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
