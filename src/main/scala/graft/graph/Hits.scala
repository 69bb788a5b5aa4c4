package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg 1999) in integer micro-units — the
  * hubs-and-authorities dual of [[PageRank]]: authority measures being
  * pointed at by good hubs, hub measures pointing at good authorities.
  * On a link/citation graph the two rankings separate directories from
  * destinations, which PageRank's single score conflates.
  *
  * Integer portability: scores live in micro-units; each round computes
  * raw sums (order-free 64-bit integer adds) and then L1-normalizes by
  * integer division — `score * 1e6 div total` — so a fixed iteration
  * count is exactly mirrorable as chained SQL CTEs, no float drift.
  * All values are non-negative, so truncating `div` and floor `//`
  * agree across engines. After the first round totals are ≈1e6, so the
  * pre-division product stays < maxdeg × 1e12 — overflow-safe far past
  * any real in-degree.
  *
  * Scale shape: identical to [[PageRank.integerPageRank]] — edges and
  * nodes materialized once, each half-round is one equi-join keyed on
  * src (or dst) plus one aggregation, the L1 totals are scalar
  * broadcast cross-joins. No windows, no driver-side state; edges
  * bucketed by src/dst make the per-round joins co-located on a
  * cluster.
  */
object Hits {

  /** Micro-units per unit score. */
  val HitsUnit = 1000000L

  /** (node, hub, auth) after `iters` rounds over `edges(src, dst)`.
    * Duplicate edges collapse; each round updates authorities from
    * hubs, normalizes, then hubs from the NEW authorities (the
    * standard in-round ordering).
    */
  def integerHits(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var hub = nodes.withColumn("hub", lit(HitsUnit))
    var auth = nodes.withColumn("auth", lit(0L))
    (1 to iters).foreach { _ =>
      val araw = e
        .join(hub.select(col("node").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("ar"))
      val atot = araw.agg(sum(col("ar")).as("atot"))
      auth = nodes
        .join(araw.select(col("dst").as("node"), col("ar")), Seq("node"), "left")
        .crossJoin(broadcast(atot))
        .select(col("node"),
          expr(s"cast((coalesce(ar, cast(0 as bigint)) * $HitsUnit) " +
            "div greatest(atot, cast(1 as bigint)) as bigint)").as("auth"))
        .localCheckpoint(true)
      val hraw = e
        .join(auth.select(col("node").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hr"))
      val htot = hraw.agg(sum(col("hr")).as("htot"))
      hub = nodes
        .join(hraw.select(col("src").as("node"), col("hr")), Seq("node"), "left")
        .crossJoin(broadcast(htot))
        .select(col("node"),
          expr(s"cast((coalesce(hr, cast(0 as bigint)) * $HitsUnit) " +
            "div greatest(htot, cast(1 as bigint)) as bigint)").as("hub"))
        .localCheckpoint(true)
    }
    nodes.join(hub, Seq("node")).join(auth, Seq("node"))
  }
}
