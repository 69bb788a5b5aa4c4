package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan, Albert
  * & Kumara 2007, "Near linear time algorithm to detect community
  * structures"): each node adopts the most frequent label among its
  * neighbors, ties broken by the smaller label — run for a FIXED number
  * of synchronous rounds so the result is a pure function of the graph
  * (asynchronous/random-order LPA is not reproducible; fixed-round
  * synchronous LPA with a total tie-break is, and mirrors as chained
  * SQL CTEs). Complements the connectivity family: cc1 finds connected
  * components, kc1 dense cores, lpa finds modularity-style communities
  * inside one component.
  *
  * Scale shape: one round = one equi-join (adjacency ⋈ labels on the
  * neighbor endpoint) + one count aggregate + one argmax window
  * PARTITIONED BY NODE. All hash-partitioned by node id; label state is
  * one row per node.
  */
object LabelProp {

  /** (node, label) after `rounds` synchronous updates over undirected
    * edges (a, b). Initial label = node id; isolated nodes keep their
    * own label (none exist after canonicalization unless degree 0).
    */
  def communities(edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = e.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(e.select(col("b").as("node"), col("a").as("nbr")))
      .localCheckpoint(eager = true)
    val nodes = adj.select(col("node")).distinct()
      .localCheckpoint(eager = true)
    var labels = nodes.withColumn("label", col("node"))
    val byNode = Window.partitionBy(col("node"))
      .orderBy(col("c").desc, col("label"))
    (1 to rounds).foreach { _ =>
      val counted = adj
        .join(labels.select(col("node").as("nbr"), col("label")), Seq("nbr"))
        .groupBy(col("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      labels = counted
        .withColumn("rk", row_number().over(byNode))
        .filter(col("rk") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint(eager = true)
    }
    labels
  }
}
