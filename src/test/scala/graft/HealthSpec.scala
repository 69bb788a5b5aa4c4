package graft

import graft.analyze.Analytics

/** File health score + grade distribution (`analysis/metrics.py:52-67,
  * 232-266, 382-394`): complexity grade bands, penalty bands, smell cap,
  * comment-ratio band, zero clamp.
  */
class HealthSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(id: String, file: String, cognitive: Int,
      complexity: Int = 1, lines: Int = 20, doc: String = "d",
      content: String = "# c\n# c\ncode\ncode\ncode\ncode\ncode\ncode\ncode\ncode") =
    (id, file, cognitive, complexity, 1, lines, doc, "function",
      s"$id()", id, content)

  private def df(rows: Seq[(String, String, Int, Int, Int, Int, String,
      String, String, String, String)]) =
    rows.toDF("chunk_id", "file_path", "cognitive_complexity", "complexity",
      "start_line", "end_line", "docstring", "chunk_type", "signature",
      "name", "content")

  test("complexity grades band on cognitive complexity") {
    val d = df(Seq(chunk("a", "f1", 5), chunk("b", "f1", 6),
      chunk("c", "f1", 20), chunk("d", "f1", 21), chunk("e", "f1", 31)))
    val dist = Analytics.gradeDistribution(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist == Map("A" -> 1L, "B" -> 1L, "C" -> 1L, "D" -> 1L, "F" -> 1L))
  }

  test("health: clean file scores 1.0, penalties subtract, clamp at 0") {
    // clean: avg cx 2, no smells, ratio 1/10 = 0.1 (in [0.1, 0.5])
    val clean = df(Seq(chunk("a", "good", 2)))
    val h = Analytics.fileHealth(clean).collect().head
    assert(h.getAs[Double]("health_score") == 1.0)
    // avg cx 12 → −0.2; no comments → ratio 0 → −0.1
    val mid = df(Seq(chunk("b", "mid", 12, content = "code\ncode")))
    val hm = Analytics.fileHealth(mid).collect().head
    assert(math.abs(hm.getAs[Double]("health_score") - 0.7) < 1e-9)
    // pile on smells: complexity 11 (critical) + 60 lines (long_method,
    // and missing docstring with empty doc) → 3 smells → −0.15; cx 35 →
    // −0.5; ratio 0 → −0.1 ⇒ 0.25
    val bad = df(Seq(chunk("c", "bad", 35, complexity = 11, lines = 60,
      doc = "", content = "code")))
    val hb = Analytics.fileHealth(bad).collect().head
    assert(hb.getAs[Long]("n_smells") == 3L)
    assert(math.abs(hb.getAs[Double]("health_score") - 0.25) < 1e-9)
    // smell penalty caps at 0.3 (27 smells would be −1.35 uncapped);
    // worst case is 1 − 0.5 − 0.3 − 0.1 = 0.1 — the reference's 0-clamp
    // is defensive, the floor is 0.1
    val many = df((1 to 9).map(i =>
      chunk(s"m$i", "ugly", 35, complexity = 11, lines = 60, doc = "",
        content = "code")))
    val hu = Analytics.fileHealth(many).collect().head
    assert(math.abs(hu.getAs[Double]("health_score") - 0.1) < 1e-9)
  }
}
