package graft

import graft.text.Lexicon

class LexiconSpec extends SparkSpec {
  import spark.implicits._

  private val lex = Seq("dup" -> 3, "slow scan" -> 2, "slow" -> 1)

  private def scoreOne(text: String) =
    Lexicon.score(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", lex)
      .select("n_toks", "hits", "weighted", "top_sev", "score", "verdict")
      .as[(Int, Int, Int, Int, Double, String)].head()

  test("token and phrase hits count independently") {
    // "slow scan" matches the phrase once AND "slow" once
    val (n, hits, w, sev, _, _) = scoreOne("slow scan table")
    assert(n === 3)
    assert(hits === 2)
    assert(w === 2 + 1)
    assert(sev === 2)
  }

  test("overlapping phrase occurrences all count") {
    val (_, _, w, _, _, _) = scoreOne("slow scan slow scan")
    // phrase twice (pos 1, 3) + token "slow" twice
    assert(w === 2 * 2 + 2)
  }

  test("any hit at blockSev blocks regardless of ratio") {
    val text = ("table " * 200).trim + " dup"
    val (_, hits, _, sev, score, verdict) = scoreOne(text)
    assert(hits === 1 && sev === 3 && score < 0.06)
    assert(verdict === "block")
  }

  test("score thresholds route flag vs allow") {
    assert(scoreOne("slow table scan row agg filter value key " +
      "merge join sort group")._6 === "flag") // 1/12 = 0.083
    assert(scoreOne(("table " * 30).trim + " slow")._6 === "allow")
  }

  test("a phrase longer than the doc scores zero, single-token doc works") {
    val (n, hits, w, sev, _, verdict) = scoreOne("slow")
    assert((n, hits, w, sev) === (1, 1, 1, 1))
    assert(verdict === "block") // 1/1 = 1.0 >= tauBlock
  }

  test("phrase match at the exact end of the array is found") {
    val (_, _, w, _, _, _) = scoreOne("table row slow scan")
    assert(w === 2 + 1)
  }

  test("absent terms contribute nothing and top_sev is 0 when clean") {
    val (_, hits, w, sev, score, verdict) = scoreOne("table row agg")
    assert((hits, w, sev, score) === (0, 0, 0, 0.0))
    assert(verdict === "allow")
  }
}
