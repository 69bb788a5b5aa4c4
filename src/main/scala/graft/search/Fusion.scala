package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion + rerank stages of the search pipeline.
  *
  * Semantics from the reference's `_hybrid_search` / RRF fusion
  * (`core/search.py:1613-1772`, k=60, alpha weighting, max-normalize)
  * and the heuristic rerank stage (`core/result_ranker.py:7-208`).
  * Both are pure column algebra over rank DataFrames — no state, no
  * driver work, shuffle only on the fused key.
  */
object Fusion {
  val RrfK = 60

  /** Assign 1-based ranks by descending score with a unique id tiebreak.
    * Single-partition window is fine only because inputs are pre-cut
    * top-N candidate sets (bounded); never call this on a full corpus.
    */
  def ranked(scores: DataFrame, idCol: String, scoreCol: String,
      topN: Int): DataFrame = {
    val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
    scores
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
  }

  /** Reciprocal-rank fusion of a vector rank list and a keyword rank list:
    * score = alpha/(k+rank_vec) + (1-alpha)/(k+rank_kw), a missing side
    * contributes 0, result max-normalized to [0,1].
    * Inputs: (id, rank) each. Output: (id, rrf_score).
    */
  def rrf(vecRanks: DataFrame, kwRanks: DataFrame, alpha: Double): DataFrame = {
    val v = vecRanks.select(col("id"), col("rank").as("rank_v"))
    val k = kwRanks.select(col("id"), col("rank").as("rank_k"))
    val fused = v.join(k, Seq("id"), "full_outer")
      .withColumn("rrf_raw",
        coalesce(lit(alpha) / (lit(RrfK) + col("rank_v")), lit(0.0)) +
          coalesce(lit(1 - alpha) / (lit(RrfK) + col("rank_k")), lit(0.0)))
    fused
      .withColumn("rrf_score",
        col("rrf_raw") / max(col("rrf_raw")).over(Window.partitionBy()))
      .select(col("id"), col("rrf_score"))
  }

  /** DuckDB mirror of rrf() over two rank CTEs named vr(id, rank) and
    * kr(id, rank).
    */
  def rrfSql(alpha: Double): String =
    s"""fused AS (SELECT COALESCE(vr.id, kr.id) AS id,
       |    COALESCE($alpha / ($RrfK + vr.rank), 0.0) +
       |    COALESCE(${1 - alpha} / ($RrfK + kr.rank), 0.0) AS rrf_raw
       |  FROM vr FULL OUTER JOIN kr ON vr.id = kr.id),
       |rrf AS (SELECT id, rrf_raw / (MAX(rrf_raw) OVER ()) AS rrf_score
       |  FROM fused)""".stripMargin
}
