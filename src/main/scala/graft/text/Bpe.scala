package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * tokenizer-training half of a data pipeline (token counting against
  * a LEARNED vocabulary is t1/vc1; this is where the vocabulary comes
  * from). Classic BPE is presented as a sequential algorithm; the
  * distributed shape is:
  *
  *  - the corpus collapses to WORD TYPES once (groupBy word, count —
  *    one map-side-combined shuffle; all later rounds run on the
  *    type relation, ~vocabulary-scale);
  *  - each round: adjacent-pair counts weighted by word frequency
  *    (explode + groupBy), argmax by (count, pair) — a 1-row
  *    TakeOrdered collect (metadata-scale, the ONLY driver data);
  *  - the merge applies per word type as a greedy leftmost
  *    non-overlapping fold — a pure per-row higher-order function, no
  *    shuffle at all.
  *
  * Determinism: counts are exact integers; the argmax tiebreak is
  * (count desc, a, b); the greedy fold is the textbook leftmost rule
  * ("aaa" + merge(a,a) → ["aa","a"]).
  */
object Bpe {

  /** (word, freq) types from a documents relation. */
  def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "") // empty-text docs tokenize to [""]
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial symbol sequences: one character per symbol. */
  def initSymbols(types: DataFrame): DataFrame =
    types.withColumn("syms", split(col("word"), ""))

  /** Frequency-weighted adjacent-pair counts over (word, freq, syms). */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] as a, syms[i + 1] as b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** The round's winning merge: (a, b, cnt) by (cnt desc, a, b) —
    * TakeOrderedAndProject, 1 row.
    */
  def topMerge(pc: DataFrame): Option[(String, String, Long)] =
    pc.orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
      .collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** Greedy leftmost non-overlapping application of merge (a,b) to a
    * symbol array — per-row HOF fold, no shuffle.
    */
  def applyMerge(syms: Column, a: String, b: String): Column = {
    val emptyOut = typedlit(Seq.empty[String])
    val init = struct(emptyOut.as("out"),
      lit(null).cast("string").as("prev"))
    aggregate(
      syms,
      init,
      (acc, x) => {
        val out = acc.getField("out")
        val prev = acc.getField("prev")
        when(prev === lit(a) && x === lit(b),
          struct(concat(out, array(lit(a + b))).as("out"),
            lit(null).cast("string").as("prev")))
          .when(prev.isNull,
            struct(out.as("out"), x.as("prev")))
          .otherwise(
            struct(concat(out, array(prev)).as("out"), x.as("prev")))
      },
      acc => when(acc.getField("prev").isNotNull,
        concat(acc.getField("out"), array(acc.getField("prev"))))
        .otherwise(acc.getField("out")))
  }

  /** Sequential (rank-order) BPE encoding as a PURE Column pipeline:
    * fold [[applyMerge]] over the merge list — each merge is one
    * higher-order `aggregate` the codegen engine inlines, so the whole
    * encode stays inside WholeStageCodegen with zero UDFs and zero
    * shuffles beyond the final per-doc count. The right tool for
    * bounded merge lists (the plan grows with the list); for full
    * 30k-merge tokenizers use [[encode]].
    *
    * Sequential semantics: merge 1 is applied everywhere, then merge 2,
    * … — identical to rank-priority BPE whenever no later merge
    * creates an occurrence of an earlier pair (true of any prefix-built
    * list whose outputs are fresh symbols; BpeApplySpec pins the
    * divergence case).
    */
  def sequentialTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
    val symsN = merges.foldLeft(split(col("word"), ""): Column) {
      case (c, (a, b)) => applyMerge(c, a, b)
    }
    words.select(col("doc_id"), size(symsN).as("n"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n")).as("n_bpe_tokens"))
  }

  /** Rank-priority greedy encode of one word: repeatedly merge the
    * lowest-rank adjacent pair present (all its occurrences, leftmost
    * rule) until none applies — textbook BPE inference.
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var a = ""; var b = ""
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; a = syms(i); b = syms(i + 1) }
        i += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        done = syms.length < 2
      }
    }
    syms
  }

  /** Production-scale encode: per-doc token counts under a broadcast
    * rank map via mapPartitions (the merge table is metadata-scale —
    * 30k entries broadcast once; docs stream through partitions). The
    * genuinely imperative inner loop (priority scan per word) is why
    * this is not a Column expression.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(rank)
    docs.select(col(idCol).cast("long").as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val rk = bc.value
        it.map { case (id, toks) =>
          val ws = toks.filter(_.nonEmpty)
          val total = ws.iterator.map(w => encodeWord(w, rk).length.toLong).sum
          (id, ws.length.toLong, total)
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_tokens")
  }

  /** Learn `rounds` merges. Returns (merges in order, final symbol
    * relation). Each round collects exactly ONE row (the argmax).
    */
  def learn(docs: DataFrame, textCol: String, rounds: Int)
      : (Seq[(String, String, Long)], DataFrame) = {
    var syms = initSymbols(wordTypes(docs, textCol)).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    var r = 0
    while (r < rounds && !done) {
      topMerge(pairCounts(syms)) match {
        case Some((a, b, cnt)) =>
          merges += ((a, b, cnt))
          // r12: lazy mark — the next round's topMerge aggregate (or
          // the caller's first action) materializes every partition in
          // the same job it already runs (2 jobs/round → 1)
          syms = syms.withColumn("syms", applyMerge(col("syms"), a, b))
            .localCheckpoint(false)
        case None => done = true
      }
      r += 1
    }
    (merges.toSeq, syms)
  }
}
