package graft

import org.apache.spark.sql.functions._

import graft.dedup.Decontaminate
import graft.text.Sampling

/** Training-pipeline hygiene operators: benchmark decontamination and
  * token-budget sampling.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate removes docs sharing n-grams with the eval set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark physical plans here"),
      (3L, "the quick brown fox jumps over something else entirely"),
      (4L, "short text")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "quick brown fox jumps over")).toDF("bench_id", "btext")
    val pairs = Decontaminate.overlapPairs(corpus, "text", "doc_id",
      bench, "btext", "bench_id", n = 5, minShared = 1).collect()
    // docs 1 and 3 share the 5-gram "quick brown fox jumps over"
    assert(pairs.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
    val clean = Decontaminate.decontaminate(corpus, "text", "doc_id",
      bench, "btext", "bench_id", n = 5, minShared = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 4L))
    // raising minShared above the overlap keeps everything
    val strict = Decontaminate.decontaminate(corpus, "text", "doc_id",
      bench, "btext", "bench_id", n = 5, minShared = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(strict == Set(1L, 2L, 3L, 4L))
  }

  test("semantic decontamination flags by cosine with best-match argmax") {
    // unit axes: corpus doc 1 = bench 100's axis, doc 2 = 45° between
    // bench 100 and 101 (hits both), doc 3 orthogonal (clean)
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(1f, 1f, 0f)),
      (3L, Array(0f, 0f, 1f))).toDF("vec_id", "vec")
    val bench = Seq(
      (100L, Array(1f, 0f, 0f)),
      (101L, Array(0f, 1f, 0f))).toDF("bench_id", "bvec")
    val got = Decontaminate.semanticContaminated(
        corpus, "vec_id", "vec", bench, "bench_id", "bvec", tau = 0.7)
      .select("doc_id", "n_hits", "bench_id", "sim")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
    // doc 2's sims are exactly equal (cos 45° both) → tiebreak to the
    // SMALLER bench id; doc 3 absent
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ===
      Seq((1L, 1, 100L), (2L, 2, 100L)))
    assert(got(0)._4 === 1.0)
    assert(math.abs(got(1)._4 - math.sqrt(0.5)) < 1e-6)
  }

  test("cluster resolution follows transitive chains to the smallest id") {
    import graft.dedup.Dedup
    // chain 1-2-3-4 (pairwise near-dups only adjacent), triangle 10-11-12,
    // pair 20-21, singletons 30, 31
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("a", "b")
    val docs = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L, 31L))
      .toDF("doc_id")
    val got = Dedup.resolveClusters(pairs, docs, "doc_id")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_)._1 == 1L))
    assert(Seq(10L, 11L, 12L).forall(got(_)._1 == 10L))
    assert(got(20L)._1 == 20L && got(21L)._1 == 20L)
    assert(got(30L) == (30L, true) && got(31L) == (31L, true))
    assert(got.count(_._2._2) == 5) // canonical: 1, 10, 20, 30, 31
  }

  test("pii scrub: counts and ordered redaction") {
    import graft.text.Scrub
    val docs = Seq(
      (1L, "mail a.b+c@test.org or x@y.io, host 10.0.0.1, ssn 123-45-6789, tel +1 555 123 4567"),
      (2L, "clean text with no identifiers at all")).toDF("doc_id", "text")
    val got = docs.select(Seq(col("doc_id")) ++
      Scrub.piiCountCols(col("text")) ++
      Seq(Scrub.redact(col("text")).as("red")): _*)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Int]("n_email") == 2 && r1.getAs[Int]("n_ipv4") == 1 &&
      r1.getAs[Int]("n_ssn") == 1 && r1.getAs[Int]("n_phone") == 1)
    val red = r1.getAs[String]("red")
    assert(red.contains("<EMAIL>") && red.contains("<IP>") &&
      red.contains("<SSN>") && red.contains("<PHONE>"))
    assert(!red.contains("@") && !red.contains("123-45-6789"))
    val r2 = got(2L)
    assert(Seq("n_email", "n_ipv4", "n_ssn", "n_phone")
      .forall(r2.getAs[Int](_) == 0))
    assert(r2.getAs[String]("red") == "clean text with no identifiers at all")
  }

  test("repetition signals: duplicated lines and dominant bigrams score high") {
    import graft.text.Scrub
    val docs = Seq(
      (1L, "same line\nsame line\nsame line\nother"),
      (2L, "buy now buy now buy now buy now"),
      (3L, "a perfectly normal sentence without repeats")).toDF("doc_id", "text")
    val got = Scrub.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Double]("dup_line_frac") == 0.5) // 4 lines, 2 dups
    assert(got(2L).getAs[Double]("top_bigram_frac") > 0.5) // 'buy now' dominates
    assert(got(3L).getAs[Double]("dup_line_frac") == 0.0)
    assert(got(3L).getAs[Double]("top_bigram_frac") <= 0.2)
  }

  test("paragraph dedup keeps first occurrence, blanks, and doc order") {
    import graft.dedup.ParaDedup
    val docs = Seq(
      (1L, "shared header\nunique one\n\nshared footer"),
      (2L, "shared header\nunique two\nshared footer"),
      (3L, "dup twice\ndup twice\nunique three"),
      (4L, "shared header\nshared footer")).toDF("doc_id", "text")
    val got = ParaDedup.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_paras"), r.getAs[Int]("n_kept"),
          r.getAs[String]("kept_text"))).toMap
    // doc 1 is first everywhere: keeps all paras incl the blank line
    assert(got(1L) == ((4, 4, "shared header\nunique one\n\nshared footer")))
    // doc 2 loses header+footer to doc 1
    assert(got(2L) == ((3, 1, "unique two")))
    // within-doc duplicate: second copy dropped
    assert(got(3L) == ((3, 2, "dup twice\nunique three")))
    // doc 4 loses everything -> empty reconstruction, still present
    assert(got(4L) == ((2, 0, "")))
  }

  test("frequent-line removal strips boilerplate from every doc") {
    import graft.dedup.FrequentLines
    val docs = Seq(
      (1L, "site banner\nunique one\n\nrare footer"),
      (2L, "site banner\nunique two\nrare footer"),
      (3L, "site banner\nsite banner\nunique three"),
      (4L, "site banner")).toDF("doc_id", "text")
    val df = FrequentLines.lineDf(docs, "doc_id", "text").collect()
      .map(r => r.getAs[String]("line") -> r.getAs[Long]("df")).toMap
    // within-doc repeat counts once; blanks never counted
    assert(df("site banner") == 4L)
    assert(df("rare footer") == 2L)
    assert(!df.contains(""))
    val got = FrequentLines.removeFrequentLines(docs, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_lines"), r.getAs[Int]("n_kept"),
          r.getAs[String]("kept_text")))).toMap
    // unlike ParaDedup, the FIRST occurrence is removed too
    assert(got(1L) == ((4, 3, "unique one\n\nrare footer")))
    assert(got(2L) == ((3, 2, "unique two\nrare footer")))
    assert(got(3L) == ((3, 1, "unique three")))
    // all-boilerplate doc -> empty reconstruction, still present
    assert(got(4L) == ((1, 0, "")))
  }

  test("frequent-line removal is invariant to input partitioning") {
    import graft.dedup.FrequentLines
    val docs = Seq(
      (1L, "b\nx\nb"), (2L, "b\ny"), (3L, "b\nz"), (4L, "w\nb")
    ).toDF("doc_id", "text")
    val a = FrequentLines.removeFrequentLines(
      docs.repartition(11), "doc_id", "text", 3).orderBy("doc_id").collect().toSeq
    val b = FrequentLines.removeFrequentLines(
      docs.coalesce(1), "doc_id", "text", 3).orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.map(_.getAs[String]("kept_text")) == Seq("x", "y", "z", "w"))
  }

  test("split assignment matches the driver hash, is group-atomic and growth-stable") {
    import graft.text.Splits
    import graft.functions.PortableHash
    val rows = (0L until 200L).map(i => (i, i % 7)).toDF("doc_id", "grp")
    val layout = Seq(("train", 2), ("val", 1), ("test", 1))
    val got = Splits.assign(rows.repartition(13), "grp", layout, buckets = 4, seed = 9)
      .select("doc_id", "grp", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def expected(g: Long): String = {
      val b = PortableHash.hash60Local("9", g.toString) % 4
      if (b < 2) "train" else if (b < 3) "val" else "test"
    }
    got.foreach { case (_, g, s) => assert(s == expected(g)) }
    // every doc sharing a group key lands in the same split
    assert(got.groupBy(_._2).forall(_._2.map(_._3).distinct.size == 1))
    // growth stability: assignments over a subset are unchanged
    val sub = Splits.assign(rows.filter(col("doc_id") < 50), "grp", layout,
        buckets = 4, seed = 9)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = got.map(t => t._1 -> t._3).toMap
    sub.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("sequence packing: segments tile blocks exactly") {
    import graft.text.Packing
    val docs = Seq((1L, 7), (2L, 10), (3L, 3), (4L, 0), (5L, 25))
      .toDF("doc_id", "n_tokens")
    val rows = Packing.packIntoBlocks(docs, "doc_id", "n_tokens", 10L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("tok_offset"), r.getAs[Long]("block_id"),
        r.getAs[Long]("seg_tokens"))).sortBy(r => (r._1, r._3))
    // offsets: d1@0(7) d2@7(10) d3@17(3) d5@20(25); total 45 tokens
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 7L),
      (2L, 7L, 0L, 3L), (2L, 7L, 1L, 7L),
      (3L, 17L, 1L, 3L),
      (5L, 20L, 2L, 10L), (5L, 20L, 3L, 10L), (5L, 20L, 4L, 5L)))
    // per-doc segment sums recover token counts; zero-token doc absent
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    assert(perDoc.toMap == Map(1L -> 7L, 2L -> 10L, 3L -> 3L, 5L -> 25L))
    // every block except the last is exactly full
    val perBlock = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    assert(perBlock == Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 5L))
  }

  test("domain mixing: majorities down-sample, minorities survive whole") {
    import graft.text.Mixing
    val docs = (0L until 900L).map(i => (i, "big")) ++
      (900L until 1000L).map(i => (i, "small"))
    val df = docs.toDF("doc_id", "lang")
    val kept = Mixing.stratifiedUniform(df, "lang", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // uniform target = 500 per domain; "small" (100 < 500) kept whole,
    // "big" sampled at rate 500/900 ~ 0.56 -> hash-uniform near 500
    assert(byLang("small") == 100)
    assert(byLang("big") > 400 && byLang("big") < 600)
    // deterministic: a second run returns the identical set
    val again = Mixing.stratifiedUniform(df, "lang", "doc_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    assert(kept.sorted.toSeq == again.sorted.toSeq)
  }

  test("unigram LM scoring matches a driver-side exact computation") {
    import graft.text.UnigramLm
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "beta gamma"),
      (3L, "alpha beta gamma")).toDF("doc_id", "text")
    // unigram counts over the whole corpus: alpha 3, beta 3, gamma 2; T=8
    val cnt = Map("alpha" -> 3L, "beta" -> 3L, "gamma" -> 2L)
    val total = 8.0
    def q(t: String): Long =
      math.floor(math.log(cnt(t) / total) * 1e6).toLong
    val expect = Map(
      1L -> (3, 2 * q("alpha") + q("beta")),
      2L -> (2, q("beta") + q("gamma")),
      3L -> (3, q("alpha") + q("beta") + q("gamma")))
    val got = UnigramLm.scoreDocs(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Long]("sum_micro_nats")))).toMap
    assert(got == expect)
  }

  test("bigram LM scoring matches a driver-side exact computation") {
    import graft.text.BigramLm
    val fixture = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat the cat"),
      (3L, "zebra"),
      (4L, "on the mat"))
    val got = BigramLm.scoreDocs(fixture.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_bigrams"), r.getAs[Long]("sum_micro_nats")))).toMap
    def toks(s: String) = s.split(" ").toSeq
    val bgs = fixture.flatMap { case (id, t) =>
      toks(t).sliding(2).filter(_.size == 2).map(p => (id, p(0), p(1))) }
    val c2 = bgs.groupBy(b => (b._2, b._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = bgs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val vocab = fixture.flatMap(t => toks(t._2)).distinct.size.toLong
    val expSum = bgs.groupBy(_._1).map { case (id, bs) =>
      id -> bs.map(b => math.floor(math.log(
        (c2((b._2, b._3)).toDouble + 1) / (c1(b._2) + vocab)) * 1e6).toLong).sum
    }
    got.foreach { case (id, (_, s)) => assert(s == expSum(id)) }
    // single-token doc has no bigrams and is excluded
    assert(!got.contains(3L))
    assert(got(1L)._1 == 5)
  }

  test("shuffle ranks are a deterministic permutation, not id order") {
    import graft.text.Mixing
    val df = (0L until 500L).toDF("doc_id")
    val ranks = Mixing.shuffleRanks(df, "doc_id")
      .select("doc_id", "shuffle_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ranks.map(_._2).sorted.toSeq == (1L to 500L)) // a permutation
    // genuinely scrambled: the rank order disagrees with id order often
    val byId = ranks.sortBy(_._1).map(_._2)
    val inversions = byId.sliding(2).count(p => p(0) > p(1))
    assert(inversions > 100)
    val again = Mixing.shuffleRanks(df, "doc_id")
      .select("doc_id", "shuffle_rank")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ranks.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("sequence packing under adversarial partitioning is exact") {
    import graft.text.Packing
    // 300 docs, shuffled across 7 input partitions; compare against a
    // driver-side exact computation of offsets and block tiling
    val docs = spark.range(300).select(
      col("id").as("doc_id"),
      (pmod(col("id") * 31, lit(40)) + lit(1)).cast("int").as("n_tokens"))
      .repartition(7)
    val ctx = 50L
    val rows = docs.collect().map(r => (r.getLong(0), r.getInt(1)))
      .sortBy(_._1)
    val offsets = rows.scanLeft(0L)(_ + _._2).dropRight(1)
    val expected = rows.zip(offsets).flatMap { case ((id, n), off) =>
      (off / ctx to (off + n - 1) / ctx).map { b =>
        val seg = math.min(off + n, (b + 1) * ctx) - math.max(off, b * ctx)
        (id, off, b, seg)
      }
    }.toSet
    val got = Packing.packIntoBlocks(docs, "doc_id", "n_tokens", ctx,
        partitions = 5)
      .select("doc_id", "tok_offset", "block_id", "seg_tokens")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("paragraph dedup is invariant to input partitioning") {
    import graft.dedup.ParaDedup
    // cross-doc duplicate paragraphs planted densely; first occurrence
    // is defined by (doc_id, position), never by physical layout
    val docs = spark.range(120).select(
      col("id").as("doc_id"),
      concat_ws("\n",
        concat(lit("shared-"), pmod(col("id"), lit(10))),
        concat(lit("own-"), col("id")),
        concat(lit("shared-"), pmod(col("id") + 5, lit(10)))).as("text"))
    val a = ParaDedup.dedupParagraphs(docs.repartition(11), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).sortBy(_._1)
    val b = ParaDedup.dedupParagraphs(docs.coalesce(1), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    // each shared-k paragraph survives exactly once across the corpus
    val kept = a.flatMap(_._4.split("\n")).filter(_.startsWith("shared-"))
    assert(kept.length == 10 && kept.toSet.size == 10)
  }

  test("token-budget sample equals the exact global prefix under budget") {
    // 200 docs, adversarial partitioning (ids shuffled across input
    // partitions), verify against a driver-side exact computation
    val docs = spark.range(200).select(
      col("id").as("doc_id"),
      pmod(col("id") * 13 + 7, lit(50)).as("q"),
      (pmod(col("id") * 31, lit(90)) + 10).as("toks"))
      .repartition(7)
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ordered = rows.sortBy { case (id, q, _) => (-q, id) }
    val budget = rows.map(_._3).sum * 4 / 10
    val expected = ordered
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, q, t)) =>
        (id, q, t, cum + t)
      }.drop(1).takeWhile(_._4 <= budget)
      .map { case (id, _, _, cum) => (id, cum) }.toMap
    val got = Sampling.takeByTokenBudget(docs, "q", "toks", "doc_id",
      budget, partitions = 5)
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got.nonEmpty && got.size < 200) // budget actually binds
  }
}
