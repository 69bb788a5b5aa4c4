package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extractive summarization by LexRank (Erkan & Radev 2004): build a
  * per-document sentence graph — an edge where two sentences share
  * enough distinct tokens — and rank sentences by PageRank centrality
  * over it; the top-central sentences ARE the summary. The corpus-
  * scale use is snippet/preview generation and dataset cards: one pass
  * summarizes every document independently.
  *
  * Integer portability: the same micro-unit damping arithmetic as
  * [[graft.graph.PageRank]], run over (doc, sentence) keys — order-
  * free integer sums, so a fixed iteration count mirrors exactly as
  * chained SQL CTEs.
  *
  * Scale shape: every relation is keyed by doc_id (+ sentence id) —
  * the per-doc graphs are independent and bounded (sentences per doc
  * is capped by construction: long docs window into ≤ len/sentLen
  * sentences), so the within-doc sentence pair join is bounded
  * quadratic in a SMALL constant, never corpus-quadratic. Iterations
  * are joins/aggregations partitioned on doc_id; the final top-k is a
  * doc-partitioned window.
  */
object LexRank {

  /** Top-k central sentences per doc. Output: (doc_id, sid, pr, rank,
    * sentence). Sentences are fixed `sentLen`-token windows of the
    * normalized text (the corpus has no punctuation; real deployments
    * plug a sentence splitter into the same shape).
    */
  def topSentences(docs: DataFrame, idCol: String, textCol: String,
      sentLen: Int = 10, minOverlap: Int = 2, iters: Int = 2,
      k: Int = 2): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val sent = docs
      .select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), ceil(size(col("toks")) / lit(sentLen.toDouble))
            .cast("int")),
          i => slice(col("toks"), (i - 1) * sentLen + 1, lit(sentLen))))
          .as(Seq("sid", "stoks")))
      // feeds tokens, nodes, and the final text — lazy cache, not an
      // eager localCheckpoint: each eager checkpoint is a scheduling
      // barrier (~0.2 s at the job floor), and four of them serialized
      // dominated this operator's wall time at sf0.1
      .cache()
    val st = sent.select(col("doc_id"), col("sid"),
      explode(array_distinct(col("stoks"))).as("t"))
    val fwd = st.select(col("doc_id"), col("sid").as("a"), col("t"))
      .join(st.select(col("doc_id"), col("sid").as("b"), col("t")),
        Seq("doc_id", "t"))
      .filter(col("a") < col("b"))
      .groupBy(col("doc_id"), col("a"), col("b"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minOverlap)
      .select(col("doc_id"), col("a"), col("b"))
    val e = fwd.unionByName(
        fwd.select(col("doc_id"), col("b").as("a"), col("a").as("b")))
      // the quadratic pair join feeds outdeg + every iteration — cache
      // (lazy) so it computes once without a barrier job
      .cache()
    // outdeg is iteration-invariant — attach it to the edge relation
    // ONCE (a doc-partitioned window over the cached edges, no extra
    // join inside the loop); each iteration then pays exactly one join
    // (edges × current pr) and one aggregate
    val eDeg = e.withColumn("outdeg",
      count(lit(1)).over(Window.partitionBy(col("doc_id"), col("a"))))
      .cache()
    val nodes = sent.select(col("doc_id"), col("sid"))
    var pr = nodes.withColumn("pr", lit(1000000L))
    (1 to iters).foreach { it =>
      val contrib = eDeg
        .join(pr.select(col("doc_id"), col("sid").as("a"), col("pr")),
          Seq("doc_id", "a"))
        .select(col("doc_id"), col("b").as("sid"),
          expr("pr div outdeg").as("c"))
        .groupBy(col("doc_id"), col("sid")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("doc_id", "sid"), "left")
        .select(col("doc_id"), col("sid"),
          expr("cast(150000 + (85 * coalesce(s, cast(0 as bigint)))" +
            " div 100 as bigint)").as("pr"))
      // lineage only needs cutting when iterations stack deep — a
      // barrier every 3rd round, not every round (the iters=2 default
      // pays zero barriers; long runs stay plan-bounded)
      if (it % 3 == 0 && it < iters) pr = pr.localCheckpoint(true)
    }
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("pr").desc, col("sid"))
    pr.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(sent, Seq("doc_id", "sid"))
      .select(col("doc_id"), col("sid"), col("pr"), col("rank"),
        array_join(col("stoks"), " ").as("sentence"))
  }
}
