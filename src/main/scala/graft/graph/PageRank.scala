package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in integer micro-units — entity importance
  * for the knowledge graph (complements hotspot/coupling analytics with
  * a pure link-structure signal).
  *
  * Everything is 64-bit integer arithmetic: ranks start at 1e6
  * micro-units, each out-edge carries `pr div outdeg`, and the damping
  * update is `150000 + (85 * sum) div 100`. Integer sums are order-free
  * across partitions AND engines, so a fixed iteration count is exactly
  * mirrorable as chained SQL CTEs — no float drift, no tolerance.
  * Dangling-node mass is dropped (the standard simplified variant);
  * ranks are comparable within a run, which is all importance ranking
  * needs.
  *
  * Scale shape: the edge list and node list are materialized once
  * (eager localCheckpoint); each iteration is one equi-join keyed on
  * src plus one aggregation keyed on dst — both shuffle-partitioned by
  * those keys, no windows, no driver-side state. On a cluster, edges
  * bucketed by src make the per-iteration join co-located.
  */
object PageRank {

  /** Micro-units per unit rank. */
  val PrUnit = 1000000L

  /** (node, pr) after `iters` integer damping iterations over
    * `edges(src, dst)`. Self-loops should be pre-filtered; duplicate
    * edges are collapsed.
    */
  def integerPageRank(edges: DataFrame, iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var pr = nodes.withColumn("pr", lit(PrUnit))
    (1 to iters).foreach { _ =>
      val contrib = e.join(outdeg, Seq("src"))
        .join(pr.select(col("node").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr("cast(150000 + (85 * coalesce(s, cast(0 as bigint))) div 100 as bigint)")
            .as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Personalized PageRank: the teleport mass lands ONLY on the seed
    * set, so ranks measure proximity TO THE SEEDS rather than global
    * importance — the standard related-entity ranking for "what is
    * close to this file/function in the graph" (the KG-boost and
    * related-chunks surfaces rank exactly this way). Identical integer
    * damping arithmetic to [[integerPageRank]]; the bounded seed set
    * compiles into the plan as literals.
    */
  def personalizedPageRank(edges: DataFrame, seeds: Seq[Long],
      iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val isSeed = col("node").isin(seeds: _*)
    val base = when(isSeed, lit(150000L)).otherwise(lit(0L))
    var pr = nodes.withColumn("pr",
      when(isSeed, lit(PrUnit)).otherwise(lit(0L)))
    (1 to iters).foreach { _ =>
      val contrib = e.join(outdeg, Seq("src"))
        .join(pr.select(col("node").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (base + expr("(85 * coalesce(s, cast(0 as bigint))) div 100"))
            .cast("long").as("pr"))
        .localCheckpoint(true)
    }
    pr
  }
}
