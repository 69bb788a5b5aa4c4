package graft

import graft.text.HtmlExtract

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String, minWords: Int = 5, maxDensity: Double = 0.33) =
    HtmlExtract.extract(Seq((1L, html)).toDF("doc_id", "html"),
        "doc_id", "html", minWords, maxDensity)
      .select("n_blocks", "n_kept", "n_words_kept", "main_text")
      .as[(Int, Int, Int, String)].head()

  test("prose kept, nav and footer dropped, document order preserved") {
    val html = "<div><a href=\"/\">home</a> <a href=\"/a\">about</a></div>" +
      "<p>first clean paragraph with enough words here</p>" +
      "<p>second clean paragraph also has enough words</p>" +
      "<div><a>contact</a> us</div>"
    val (nb, nk, nw, text) = one(html)
    assert(nb === 4 && nk === 2 && nw === 14)
    assert(text === "first clean paragraph with enough words here\n" +
      "second clean paragraph also has enough words")
  }

  test("a wordy but link-dense block is dropped by density alone") {
    val html = "<li><a>one two three</a> <a>four five six</a></li>" +
      "<p>plain prose block with five words more</p>"
    val (nb, nk, _, text) = one(html)
    assert(nb === 2 && nk === 1)
    assert(text.startsWith("plain prose"))
    // with the density rule disabled it would have been kept
    assert(one(html, maxDensity = 1.0)._2 === 2)
  }

  test("short blocks drop by word count; tag-only pieces are not blocks") {
    val html = "<p>too short</p><div><br/><hr/></div>" +
      "<p>this block is long enough to keep around</p>"
    val (nb, nk, _, _) = one(html)
    assert(nb === 2 && nk === 1)
  }

  test("a page with no kept blocks yields empty text, not null") {
    val (nb, nk, nw, text) = one("<div><a>x</a></div>")
    assert((nb, nk, nw, text) === (1, 0, 0, ""))
  }

  test("anchor text counts toward density but stays in the visible text") {
    // 1 anchored word of 4 chars over ~40 visible chars → low density
    val html = "<p>read the <a href=\"/d\">docs</a> for the full story</p>"
    val (_, nk, nw, text) = one(html)
    assert(nk === 1 && nw === 7)
    assert(text === "read the docs for the full story")
  }
}
