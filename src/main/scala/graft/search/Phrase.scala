package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact phrase search over a positional inverted index — the lexical
  * complement to BM25 bag-of-words scoring (Q7): "search for this exact
  * multi-word expression" is the query the reference serves through its
  * keyword path (`core/bm25_search.py` tokenization surface) but cannot
  * answer positionally; a positional postings relation makes it one
  * equi-join per phrase term.
  *
  * Scale shape: postings partition by (id, pos) after a term-pushdown
  * scan — each phrase term contributes `postings.filter(term = t)`,
  * which Catalyst pushes into the parquet scan of a persisted postings
  * table. Terms join rarest-first (document frequencies of the ≤
  * phrase-length candidate terms are metadata-scale), so the running
  * intermediate is bounded by the rarest term's postings, not the
  * stopword's. No windows, no collects over corpus-sized relations.
  */
object Phrase {

  /** Positional postings (id, term, pos) — pos is 0-based token index. */
  def positionalPostings(docs: DataFrame, idCol: String,
      tokens: Column => Column, textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** Persist positional postings as the write-once index a deployment
    * probes (the `Bm25.writeIndexBucketed` pattern — round 6 rebuilt the
    * index per query and phrase stress grew superlinearly): BUCKETED by
    * id, the join key of every per-term (id, start) equi-join, so the
    * phrase joins read all sides pre-partitioned with zero Exchange;
    * SORTED by term within buckets, so each per-term pushdown filter
    * prunes at the parquet row-group level instead of scanning the full
    * postings. Registered as an external bucketed table `name` over
    * `path`; re-running overwrites, so a stale index is never served.
    */
  def writeIndex(postings: DataFrame, name: String, path: String,
      buckets: Int = 32): Unit =
    postings.repartition(buckets, col("id"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "id").sortBy("term")
      // absolute path: a relative `path` option resolves against the
      // session warehouse dir, not the working dir
      .option("path", new java.io.File(path).getAbsolutePath)
      .saveAsTable(name)

  def readIndex(spark: org.apache.spark.sql.SparkSession,
      name: String): DataFrame = spark.table(name)

  /** Pairwise term proximity: for documents containing BOTH terms, the
    * minimum token distance between any occurrence of `a` and any of
    * `b`, with occurrence counts and the 1/(1+dist) ranking bonus —
    * the positional ranking signal between bag-of-words BM25 (order-
    * blind) and [[phraseSearch]] (adjacency-exact).
    *
    * Scale shape: two term-pushdown scans of the persisted bucketed
    * postings, per-doc position sets collected IN-ROW (bounded by
    * document length), one Exchange-free id join, and the min-distance
    * is a bounded in-row fold — never a positions × positions row
    * explosion.
    */
  def proximityPairs(postings: DataFrame, a: String, b: String,
      k: Int = 20): DataFrame = {
    def leg(t: String, pc: String, nc: String) =
      postings.filter(col("term") === t)
        .groupBy(col("id"))
        .agg(sort_array(collect_set(col("pos"))).as(pc),
          count(lit(1)).cast("int").as(nc))
    leg(a, "pa", "n_a").join(leg(b, "pb", "n_b"), Seq("id"))
      .withColumn("min_dist",
        array_min(flatten(transform(col("pa"), p =>
          transform(col("pb"), q => abs(p - q))))).cast("int"))
      .select(col("id"), col("n_a"), col("n_b"), col("min_dist"),
        round(lit(1.0) / (lit(1) + col("min_dist")), 6).as("prox_score"))
      .orderBy(col("min_dist"), col("id"))
      .limit(k)
  }

  /** Docs containing the exact token sequence, with occurrence counts,
    * top-k by (count desc, id). Joins are ordered rarest-term-first;
    * each joined side is re-anchored to the phrase START position so
    * join order cannot change semantics.
    *
    * `postings` should be the persisted index ([[writeIndex]] +
    * [[readIndex]]): each per-term leg is then a term-pushdown scan of
    * the bucketed table and the (id, start) joins run Exchange-free. A
    * derived relation also works (specs use one) but re-runs its
    * derivation once per distinct term plus once for the df probe.
    */
  def phraseSearch(postings: DataFrame, phrase: Seq[String],
      k: Int = 20): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val relevant = postings.filter(col("term").isin(phrase.distinct: _*))
    // document frequencies of just the phrase terms: bounded collect
    // (≤ phrase.length rows), used ONLY to pick a join order
    val dfs = relevant
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = phrase.zipWithIndex
      .sortBy { case (t, i) => (dfs.getOrElse(t, 0L), i) }
    // one per-doc row per term leg: the set of phrase-START positions
    // this term is consistent with. Joining legs on id ALONE (the
    // bucket key — a compound (id, start) key makes the planner give up
    // on the bucketed layout) keeps every join Exchange-free off the
    // persisted index; the adjacency check is then a bounded in-row
    // set intersection (position sets are capped by document length).
    def leg(t: String, i: Int, n: Int): DataFrame =
      relevant.filter(col("term") === t)
        .groupBy(col("id"))
        .agg(collect_set(col("pos") - i).as(s"starts_$n"))
    val legs = order.zipWithIndex.map { case ((t, i), n) => leg(t, i, n) }
    val joined = legs.reduce((a, b) => a.join(b, Seq("id")))
    val inter = order.indices.tail.foldLeft(col("starts_0")) {
      (acc, n) => array_intersect(acc, col(s"starts_$n"))
    }
    joined.select(col("id"), size(inter).cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy(col("n_matches").desc, col("id")).limit(k)
  }
}
