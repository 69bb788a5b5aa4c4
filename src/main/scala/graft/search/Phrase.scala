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

  /** Docs containing the exact token sequence, with occurrence counts,
    * top-k by (count desc, id). Joins are ordered rarest-term-first;
    * each joined side is re-anchored to the phrase START position so
    * join order cannot change semantics.
    */
  def phraseSearch(postings: DataFrame, phrase: Seq[String],
      k: Int = 20): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    // ONE pass over the postings derivation: materialize just the
    // phrase terms' postings (the persisted-index access pattern — a
    // deployment reads these partitions off the inverted index; a
    // derived relation would otherwise re-run its explode once per
    // term plus once for the df probe)
    val relevant = postings
      .filter(col("term").isin(phrase.distinct: _*))
      .localCheckpoint(true)
    // document frequencies of just the phrase terms: bounded collect
    // (≤ phrase.length rows), used ONLY to pick a join order
    val dfs = relevant
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = phrase.zipWithIndex
      .sortBy { case (t, i) => (dfs.getOrElse(t, 0L), i) }
    def anchored(t: String, i: Int): DataFrame =
      relevant.filter(col("term") === t)
        .select(col("id"), (col("pos") - i).as("start"))
    val matched = order.tail.foldLeft(anchored(order.head._1, order.head._2)) {
      case (acc, (t, i)) => acc.join(anchored(t, i), Seq("id", "start"))
    }
    matched.groupBy(col("id")).agg(count(lit(1)).as("n_matches"))
      .orderBy(col("n_matches").desc, col("id")).limit(k)
  }
}
