package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Topological link prediction over an undirected graph: score
  * non-adjacent node pairs by their shared neighborhood.
  *
  * The reference surfaces "related chunks" / suggestion-style edges from
  * its knowledge graph (`mcp_vector_search/core/relationships.py`,
  * `knowledge_graph.py` related-entity queries); common-neighbor scoring
  * is the classical topology-only version of that suggestion ranking,
  * and at corpus scale it is the cheap candidate generator run before
  * any embedding-based scorer.
  *
  * Scores:
  *  - `cn` — common-neighbor count (exact integer).
  *  - `ra_micro` — Resource Allocation index (Zhou, Lü & Zhang 2009,
  *    "Predicting missing links via local information"): Σ_u 1/deg(u)
  *    over common neighbors u, kept in exact integer pico-units
  *    (10^12 div deg — order-free integer sums, no float drift, and the
  *    DuckDB mirror is bit-identical). RA down-weights hub-mediated
  *    wedges harder than Adamic-Adar's 1/ln(deg) and needs no ln.
  *
  * Scale shape: wedges are enumerated by a self-join of the adjacency
  * relation on the CENTER node — hash-partitioned by center, no windows.
  * A hub of degree d contributes d² wedge pairs, which is inherent to
  * the measure, so `maxHubDeg` caps the centers enumerated (standard
  * practice: a >maxHubDeg hub contributes ≤ 10^12/maxHubDeg per pair —
  * noise — while costing quadratic work; the cap is the skew guard).
  * Existing edges are removed with one anti-join against the canonical
  * edge set.
  */
object LinkPredict {

  /** (x, y, cn, ra_micro) for non-adjacent pairs with ≥1 common
    * neighbor of degree ≤ maxHubDeg; x < y canonically.
    */
  def predictLinks(edges: DataFrame, maxHubDeg: Int = 10000): DataFrame = {
    val e = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // adjacency in both directions, center-degree attached once so the
    // wedge join needs no further degree lookup
    val adj = e.select(col("a").as("u"), col("b").as("v"))
      .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      .join(deg.withColumnRenamed("id", "u"), Seq("u"))
      .filter(col("deg") <= maxHubDeg)
    val wedges = adj.as("t1").join(adj.as("t2"),
        col("t1.u") === col("t2.u") && col("t1.v") < col("t2.v"))
      .select(col("t1.v").as("x"), col("t2.v").as("y"),
        expr("CAST(1000000000000 AS BIGINT) div t1.deg").as("w"))
    wedges
      .join(e.withColumnRenamed("a", "x").withColumnRenamed("b", "y"),
        Seq("x", "y"), "left_anti")
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).cast("long").as("cn"),
        sum(col("w")).cast("long").as("ra_micro"))
  }
}
