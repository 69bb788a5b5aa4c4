package graft

import graft.text.StupidBackoff

class StupidBackoffSpec extends SparkSpec {
  import spark.implicits._

  test("bigram leg, backoff leg, and OOV all hand-verify in micro-nats") {
    // background: bigrams (a,b)x2 (b,a) (b,c); unigrams a2 b2 c1,
    // N=5, V=3
    val bg = Seq((100L, "a b a b c")).toDF("doc_id", "text")
    val fg = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = StupidBackoff.scoreDocs(bg, fg, "doc_id", "text").head()
    assert(out.getAs[Int]("n_bigrams") == 3)
    // (a,b): ln(2/2)=0; (b,c): ln(1/2) -> -693148;
    // (c,d): unseen w1 -> backoff, cu(d)=0 -> ln(0.4*1/8) -> -2995733
    assert(out.getAs[Long]("n_backoffs") == 1L)
    assert(out.getAs[Long]("sum_micro_nats") ==
      0L - 693148L - 2995733L)
  }

  test("a seen-context unseen-continuation bigram backs off to the " +
      "continuation unigram") {
    val bg = Seq((100L, "a b a c")).toDF("doc_id", "text")
    // (a,x): w1 seen (cnt1=2) but (a,x) unseen -> unigram leg on x
    val fg = Seq((1L, "a x")).toDF("doc_id", "text")
    val out = StupidBackoff.scoreDocs(bg, fg, "doc_id", "text").head()
    assert(out.getAs[Long]("n_backoffs") == 1L)
    // N=4, V=3, cu(x)=0 -> ln(0.4 * 1 / 7)
    val expected = math.floor(math.log(0.4 * 1.0 / 7.0) * 1e6).toLong
    assert(out.getAs[Long]("sum_micro_nats") == expected)
  }

  test("foreground scoring is background-deterministic under repartition") {
    val bg = (0L until 40L).map(i => (i, s"t${i % 7} t${i % 5} t${i % 3}"))
      .toDF("doc_id", "text")
    val fg = (100L until 110L).map(i => (i, s"t${i % 5} t${i % 3} novel$i"))
      .toDF("doc_id", "text")
    def run(b: org.apache.spark.sql.DataFrame) =
      StupidBackoff.scoreDocs(b, fg, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_backoffs"), r.getAs[Long]("sum_micro_nats"))))
        .toMap
    assert(run(bg) == run(bg.repartition(13)))
  }
}
