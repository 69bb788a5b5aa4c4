package graft

import org.apache.spark.sql.functions._

import graft.search.{Bm25, Fusion}

/** Batch search consistency: the batched multi-query paths must agree
  * with the single-query operators they generalize (the hb1 oracle
  * proves cross-engine exactness; this guards refactors cheaply).
  */
class BatchSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, Seq("fast", "table", "scan")),
    (2L, Seq("table", "merge", "table", "join")),
    (3L, Seq("slow", "row", "scan", "scan")),
    (4L, Seq("window", "agg", "table"))
  ).toDF("id", "toks")

  private lazy val idx =
    Bm25.buildIndex(Bm25.postings(docs, "id", col("toks")))

  test("native TokenTf postings equal the groupBy(id, term) form " +
      "(r11: the corpus-wide tf Exchange is gone, rows must not change)") {
    val fixture = Seq(
      (1L, Seq("a", "b", "a", "a")),
      (2L, Seq.empty[String]),
      (3L, Seq("b")),
      (4L, Seq("c", "c", "b", "a", "c"))
    ).toDF("id", "toks")
    val native = Bm25.postings(fixture, "id", col("toks"))
      .orderBy("id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val viaGroupBy = fixture
      .select(col("id"), explode(col("toks")).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .orderBy("id", "term").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(native.toSeq == viaGroupBy.toSeq)
    // schema contract downstream consumers rely on
    assert(Bm25.postings(fixture, "id", col("toks")).schema.map(f =>
      (f.name, f.dataType.simpleString)) ==
      Seq(("id", "bigint"), ("term", "string"), ("tf", "bigint")))
  }

  test("termIdf single-pass histogram form equals the per-term " +
      "definition (r12: one vocab aggregate, floor from the df histogram)") {
    // "hot" appears in every doc (df = n) → negative raw idf → the
    // epsilon * avg_idf floor must activate; distinct rare terms share
    // a df value so the histogram genuinely groups
    val fixture = Seq(
      (1L, Seq("hot", "hot", "warm", "rare1")),
      (2L, Seq("hot", "warm", "x")),
      (3L, Seq("hot", "warm", "y")),
      (4L, Seq("hot", "rare2"))
    ).toDF("id", "toks")
    val post = Bm25.postings(fixture, "id", col("toks"))
    val got = Bm25.buildIndex(post).idf.orderBy("term").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // per-term definition computed directly (the pre-r12 shape)
    val dfs = post.groupBy("term").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val n = 4.0
    val raw = dfs.map { case (t, df) =>
      (t, math.log(n - df + 0.5) - math.log(df + 0.5)) }
    assert(raw.exists(_._2 < 0), "fixture must exercise the epsilon floor")
    val avg = raw.values.sum / raw.size
    val want = raw.map { case (t, r) =>
      (t, if (r < 0) Bm25.Epsilon * avg else r) }.toSeq.sortBy(_._1)
    assert(got.map(_._1) == want.map(_._1))
    got.zip(want).foreach { case ((t, gv), (_, wv)) =>
      assert(math.abs(gv - wv) < 1e-12, s"$t: $gv vs $wv")
    }
  }

  test("scoreBatchIndexed with one query equals scoreIndexed") {
    val q = Seq("table", "scan", "table")
    val single = Bm25.scoreIndexed(spark, idx, q)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val qterms = q.groupBy(identity).map { case (t, os) => (0L, t, os.size) }
      .toSeq.toDF("qid", "term", "qtf")
    val batch = Bm25.scoreBatchIndexed(idx, qterms)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score")))
    assert(batch.toSeq == single.toSeq)
  }

  test("rrfBatch with one qid equals rrf") {
    val v = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "rank")
    val k = Seq((2L, 1), (4L, 2)).toDF("id", "rank")
    val single = Fusion.rrf(v, k, 0.7)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("rrf_score")))
    val vb = v.withColumn("qid", lit(9L))
    val kb = k.withColumn("qid", lit(9L))
    val batch = Fusion.rrfBatch(vb, kb, 0.7)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("rrf_score")))
    assert(batch.toSeq == single.toSeq)
  }

  test("rrfBatch normalizes per qid independently") {
    // qid 1's best fused score must map to 1.0 regardless of qid 2
    val v = Seq((1L, 1L, 1), (2L, 10L, 1)).toDF("qid", "id", "rank")
    val k = Seq((1L, 1L, 1), (2L, 10L, 5)).toDF("qid", "id", "rank")
    val out = Fusion.rrfBatch(v, k, 0.5)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Double]("rrf_score"))).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0)
  }

  test("mergeIndex equals a full rebuild over the union") {
    val batch = Seq(
      (10L, Seq("table", "scan", "fresh")),
      (11L, Seq("merge", "merge", "row"))).toDF("id", "toks")
    val merged = Bm25.mergeIndex(idx,
      Bm25.postings(batch, "id", col("toks")))
    val full = Bm25.buildIndex(
      Bm25.postings(docs.unionByName(batch), "id", col("toks")))
    def scores(i: Bm25.Bm25Index) =
      Bm25.scoreIndexed(spark, i, Seq("table", "merge", "scan"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(merged) == scores(full))
    // global stats identical: same n/avgdl, same idf table
    assert(merged.corpus.collect().toSeq == full.corpus.collect().toSeq)
    val mIdf = merged.idf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val fIdf = full.idf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mIdf == fIdf)
  }

  test("mergeIndex upserts re-ingested docs instead of double-counting") {
    // doc 2 re-ingested with new content: its old postings must vanish
    val batch = Seq((2L, Seq("fresh", "content", "here")))
      .toDF("id", "toks")
    val merged = Bm25.mergeIndex(idx,
      Bm25.postings(batch, "id", col("toks")))
    val rebuilt = Bm25.buildIndex(Bm25.postings(
      docs.filter(col("id") =!= 2L).unionByName(batch), "id", col("toks")))
    assert(merged.docStats.filter(col("id") === 2L)
      .head().getLong(1) == 3L) // new dl, not old+new
    assert(merged.corpus.collect().toSeq == rebuilt.corpus.collect().toSeq)
    val mIdf2 = merged.idf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rIdf2 = rebuilt.idf.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(mIdf2 == rIdf2)
  }
}
