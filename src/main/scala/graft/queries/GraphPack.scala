package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Kg
import graft.tables.Tables

/** Knowledge-graph operator pack (SURVEY §2.3 J7/J8, §2.4 A17, §2.7):
  * the KG traversal primitives exercised over a graph derived from the
  * TPC-H star schema so each has a DuckDB oracle (recursive CTE for the
  * multi-hop reachability).
  *
  * Graph: supplier/customer -LOCATED_IN-> nation -PART_OF-> region.
  */
object GraphPack {

  /** Edge DataFrame (src, dst, rel_type) from the relational tables. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(s, d).select(
      concat(lit("N"), col("n_nationkey")).as("src"),
      concat(lit("R"), col("n_regionkey")).as("dst"),
      lit("PART_OF").as("rel_type"))
    val c = Tables.customer(s, d).select(
      concat(lit("C"), col("c_custkey")).as("src"),
      concat(lit("N"), col("c_nationkey")).as("dst"),
      lit("LOCATED_IN").as("rel_type"))
    val sup = Tables.supplier(s, d).select(
      concat(lit("S"), col("s_suppkey")).as("src"),
      concat(lit("N"), col("s_nationkey")).as("dst"),
      lit("LOCATED_IN").as("rel_type"))
    n.unionByName(c).unionByName(sup)
  }

  private val edgesSql =
    """edges AS (
      |  SELECT 'N' || n_nationkey AS src, 'R' || n_regionkey AS dst,
      |    'PART_OF' AS rel_type FROM nation
      |  UNION ALL
      |  SELECT 'C' || c_custkey, 'N' || c_nationkey, 'LOCATED_IN' FROM customer
      |  UNION ALL
      |  SELECT 'S' || s_suppkey, 'N' || s_nationkey, 'LOCATED_IN' FROM supplier)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A17: counts per relation type + distinct node counts.
    "g1_kg_stats" -> ((s, d) => {
      edges(s, d)
        .groupBy(col("rel_type"))
        .agg(
          count(lit(1)).as("n_edges"),
          countDistinct(col("src")).as("n_src"),
          countDistinct(col("dst")).as("n_dst"))
    }),

    // J7: undirected 1-hop neighborhood of one nation node.
    "g2_one_hop" -> ((s, d) => {
      import s.implicits._
      val seed = Seq("N7").toDF("id")
      Kg.oneHop(edges(s, d), seed)
        .orderBy(col("id"))
        .limit(200)
    }),

    // J8: min-distance reachability ≤2 hops from region ASIA, walking
    // edges in reverse (region ← nations ← customers/suppliers) via
    // iterative frontier joins; oracle = recursive CTE.
    "g3_two_hop_reach" -> ((s, d) => {
      import s.implicits._
      val seed = Seq("R2").toDF("id")
      Kg.minDist(edges(s, d), seed, maxHops = 2, reverse = true)
        .orderBy(col("dist"), col("id"))
        .limit(500)
    }))

  def oracles: Map[String, String] = Map(
    "g1_kg_stats" ->
      s"""WITH $edgesSql
         |SELECT rel_type, COUNT(*) AS n_edges,
         |  COUNT(DISTINCT src) AS n_src, COUNT(DISTINCT dst) AS n_dst
         |FROM edges GROUP BY rel_type""".stripMargin,

    "g2_one_hop" ->
      s"""WITH $edgesSql
         |SELECT DISTINCT id FROM (
         |  SELECT dst AS id FROM edges WHERE src = 'N7'
         |  UNION ALL
         |  SELECT src AS id FROM edges WHERE dst = 'N7')
         |ORDER BY id LIMIT 200""".stripMargin,

    "g3_two_hop_reach" ->
      s"""WITH RECURSIVE $edgesSql,
         |walk(id, dist) AS (
         |  SELECT 'R2', 0
         |  UNION ALL
         |  SELECT e.src, w.dist + 1 FROM edges e
         |  JOIN walk w ON e.dst = w.id WHERE w.dist < 2)
         |SELECT id, CAST(MIN(dist) AS INTEGER) AS dist FROM walk GROUP BY id
         |ORDER BY dist, id LIMIT 500""".stripMargin)
}
