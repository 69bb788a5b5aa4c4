package graft

import graft.text.Windowing

class WindowingSpec extends SparkSpec {
  import spark.implicits._

  private def win(text: String, winLen: Int, stride: Int) =
    Windowing.tokenWindows(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", winLen, stride)
      .collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .sortBy(_._1)

  test("overlapping windows cover the doc; tail keeps its real length") {
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val out = win(text, winLen = 8, stride = 4)
    assert(out.length == 5) // starts 0,4,8,12,16
    assert(out(0) == ((0, 0, 8, (1 to 8).map(i => s"t$i").mkString(" "))))
    assert(out(1)._2 == 4 && out(1)._3 == 8)
    assert(out(4) == ((4, 16, 4, (17 to 20).map(i => s"t$i").mkString(" "))))
  }

  test("short doc yields one full-copy window") {
    val out = win("a b c", winLen = 16, stride = 8)
    assert(out.toSeq == Seq((0, 0, 3, "a b c")))
  }

  test("stride == winLen gives disjoint cover") {
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val out = win(text, winLen = 3, stride = 3)
    assert(out.map(_._3).sum == 9)
    assert(out.map(_._4).mkString(" ") == text)
  }

  test("every token position is covered by at least one window") {
    val text = (1 to 23).map(i => s"w$i").mkString(" ")
    val out = win(text, winLen = 10, stride = 7)
    val covered = out.flatMap { case (_, start, n, _) =>
      start until (start + n)
    }.toSet
    assert(covered == (0 until 23).toSet)
  }
}
