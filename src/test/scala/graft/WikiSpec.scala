package graft

import graft.analyze.Wiki

/** Wiki flat-ontology extraction (`core/wiki.py:236-418`): concept-set
  * channels, noise filters, frequency floor, 12-hex ids.
  */
class WikiSpec extends SparkSpec {
  import spark.implicits._

  private def chunks = Seq(
    ("c1", "build_index", "Indexer", "src/core/indexer.py",
      "Builds the search index quickly. Second sentence ignored here."),
    ("c2", "build_index", "", "src/core/search.py", ""),
    ("c3", "", "", "lib/tests/util.py", "Tiny doc."),
    ("c4", "search", "Indexer", "src/core/indexer.py", "no"))
    .toDF("chunk_id", "name", "parent_name", "file_path", "docstring")

  test("concept channels: names, parents, path parts, docstring words") {
    val rows = Wiki.conceptRows(chunks)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // empty name/parent contribute nothing; src/lib/tests are stoplisted
    assert(rows.contains(("c1", "build_index")))
    assert(rows.contains(("c1", "Indexer")))
    assert(rows.contains(("c1", "core")) && rows.contains(("c1", "indexer.py")))
    assert(!rows.exists(_._2 == "src") && !rows.exists(_._2 == "lib"))
    assert(!rows.exists(_._2 == "tests"))
    // first sentence only, len>3 alnum only, max 3, lowered
    assert(rows.contains(("c1", "builds")))
    assert(rows.contains(("c1", "search")) && rows.contains(("c1", "index")))
    assert(!rows.exists(t => t._1 == "c1" && t._2 == "quickly")) // 4th word
    assert(!rows.exists(t => t._1 == "c1" && t._2 == "ignored")) // 2nd sentence
    // c3: only path part util.py survives
    assert(rows.contains(("c3", "util.py")))
    assert(!rows.exists(t => t._1 == "c3" && t._2 == "Tiny"))
  }

  test("frequency floor and deterministic 12-hex concept ids") {
    val c = Wiki.concepts(chunks).collect()
      .map(r => r.getString(1) -> (r.getString(0), r.getLong(2))).toMap
    assert(c("build_index")._2 == 2L) // c1 + c2
    assert(c("core")._2 == 3L)        // c1, c2, c4
    assert(!c.contains("search.py"))  // frequency 1 filtered
    assert(c.keys.forall(k => c(k)._1.matches("[0-9a-f]{12}")))
    // sha256("build_index:")[:12] — stable id
    val exp = java.security.MessageDigest.getInstance("SHA-256")
      .digest("build_index:".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    assert(c("build_index")._1 == exp)
  }
}
