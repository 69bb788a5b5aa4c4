package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Anchor-text aggregation over a link graph: for every link target,
  * the top-k anchor texts by frequency plus the total in-link count —
  * the web-pipeline signal that describes a page by what OTHER pages
  * call it (crawl pipelines attach it as a quality/relevance feature;
  * it's also the classic retrieval field). Input is one row per link
  * `(src, dst, anchor)`.
  *
  * Scale shape: anchors collapse to (dst, anchor) counts in ONE
  * map-side-combinable aggregate (corpus-scale link lists never hold
  * per-link rows past it), the top-k is a dst-partitioned window over
  * the already-collapsed counts, and the in-link total rides the same
  * partition — no joins, no broadcast of anything link-scale.
  */
object Anchors {

  /** (dst, rank, anchor, cnt, n_inlinks) — top `k` anchors per target,
    * count-desc with anchor-text tiebreak.
    */
  def topAnchors(links: DataFrame, k: Int): DataFrame = {
    val g = links.groupBy(col("dst"), col("anchor"))
      .agg(count(lit(1)).as("cnt"))
    val byDst = Window.partitionBy(col("dst"))
    val ranked = Window.partitionBy(col("dst"))
      .orderBy(col("cnt").desc, col("anchor"))
    g.withColumn("rank", row_number().over(ranked))
      .withColumn("n_inlinks", sum(col("cnt")).over(byDst))
      .filter(col("rank") <= k)
      .select(col("dst"), col("rank"), col("anchor"), col("cnt"),
        col("n_inlinks"))
  }
}
