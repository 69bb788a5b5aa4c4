package graft

import graft.analyze.Profiler

/** Codebase profiler fidelity (`core/codebase_profiler.py`): size
  * thresholds, dominant-type detection, preset lookup.
  */
class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private def profileOf(paths: Seq[String]) = {
    val row = Profiler.profile(paths.toDF("p"), "p").collect().head
    (row.getAs[String]("size_category"), row.getAs[String]("codebase_type"),
      row.getAs[Int]("batch_size"))
  }

  test("size categories at the file-count thresholds") {
    val (s1, _, b1) = profileOf((1 to 999).map(i => s"a$i.py"))
    assert(s1 == "small" && b1 == 16)
    val (s2, _, b2) = profileOf((1 to 1000).map(i => s"a$i.py"))
    assert(s2 == "medium" && b2 == 32)
  }

  test("type detection: docs>30%, py>60%, js-family>60%, else mixed") {
    // 4/10 docs = 40% > 30 → documentation even though py is 60%
    val docsHeavy = (1 to 4).map(i => s"d$i.md") ++ (1 to 6).map(i => s"c$i.py")
    assert(profileOf(docsHeavy)._2 == "documentation")
    // 7/10 py, 3 docs (30% is NOT > 30) → python
    val pyHeavy = (1 to 7).map(i => s"c$i.py") ++ (1 to 3).map(i => s"d$i.txt")
    assert(profileOf(pyHeavy)._2 == "python")
    // js family summed across .js/.ts/.tsx/.jsx
    val jsHeavy = Seq("a.js", "b.ts", "c.tsx", "d.jsx", "e.ts", "f.js", "g.ts",
      "h.py", "i.py", "j.go")
    assert(profileOf(jsHeavy)._2 == "javascript")
    val mixed = Seq("a.py", "b.js", "c.go", "d.rs", "e.java")
    assert(profileOf(mixed)._2 == "mixed")
  }

  test("per-extension distribution with pct") {
    val rows = Profiler.profile(
      (Seq.fill(3)("x.py") ++ Seq("y.md")).zipWithIndex
        .map { case (p, i) => s"$i/$p" }.toDF("p"), "p")
      .collect().map(r => r.getAs[String]("ext") ->
        (r.getAs[Long]("n_files"), r.getAs[Double]("pct"))).toMap
    assert(rows(".py") == (3L, 75.0))
    assert(rows(".md") == (1L, 25.0))
  }
}
