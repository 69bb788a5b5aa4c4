package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting and local clustering coefficients.
  *
  * Complements the KG analytics (coupling, cycles, PageRank): the
  * reference surfaces graph cohesion through its knowledge-graph stats
  * (`mcp_vector_search/core/knowledge_graph.py` stats/centrality
  * surface); triangle density is the standard cohesion measure a code
  * graph or a doc-link graph is profiled with at corpus scale.
  *
  * Scale shape (Suri & Vassilvitskii 2011, "Counting Triangles and the
  * Curse of the Last Reducer"): orient every undirected edge from the
  * endpoint that is EARLIER in the global (degree, id) total order to
  * the later one. Every node's out-adjacency is then bounded by
  * O(sqrt(|E|)) regardless of raw degree, so the wedge self-join never
  * sees a hub's quadratic neighborhood — the skew that kills the naive
  * adjacency self-join on a power-law graph. Each triangle is
  * enumerated exactly once (its vertices appear in order-sorted
  * position u < x < y). Three hash joins, no windows, no collects.
  */
object Triangles {

  /** Per-node triangle counts + local clustering coefficient.
    *
    * Input: undirected edges as columns (a, b) — duplicates, self-loops
    * and reversed copies tolerated. Output: (node, deg, triangles,
    * clustering) where clustering = 2·T / (deg·(deg−1)), rounded to 6
    * decimals (0.0 for deg < 2).
    */
  def nodeTriangles(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient by the (deg, id) total order; carry the head's order key so
    // the wedge join can sort neighbors without re-joining degrees
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val o = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
    // wedges (u; x, y) with ord(x) < ord(y); the closing edge, if
    // present, is oriented x -> y by construction
    val w = o.as("o1").join(o.as("o2"),
        col("o1.u") === col("o2.u") &&
          (struct(col("o1.dv"), col("o1.v")) <
            struct(col("o2.dv"), col("o2.v"))))
      .select(col("o1.u").as("u"), col("o1.v").as("x"), col("o2.v").as("y"))
    val tri = w.join(o.select(col("u").as("x"), col("v").as("y")),
      Seq("x", "y"), "left_semi")
    val perNode = tri
      .select(explode(array(col("u"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    deg.withColumnRenamed("id", "node")
      .join(perNode, Seq("node"), "left")
      .na.fill(0L, Seq("triangles"))
      .withColumn("clustering",
        when(col("deg") >= 2,
          round(col("triangles") * 2.0 / (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)))
      .select(col("node"), col("deg"), col("triangles"), col("clustering"))
  }

  /** Global triangle count + transitivity (3·T / #wedges) as one row. */
  def globalStats(edges: DataFrame): DataFrame = {
    val per = nodeTriangles(edges)
    per.agg(
      (sum(col("triangles")) / 3).cast("bigint").as("triangles"),
      coalesce(
        round(sum(col("triangles")) /
          sum(col("deg") * (col("deg") - 1) / 2.0), 6),
        lit(0.0)).as("transitivity"))
  }
}
