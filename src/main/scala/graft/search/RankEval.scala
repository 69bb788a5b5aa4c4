package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation: NDCG@k, MRR, precision@k, recall@k per
  * query — the measurement side of the search stack (the reference
  * validates its retrieval the same way: `tests/test_search*.py` assert
  * rank positions of expected hits; RerankSpec already NDCG-scores the
  * rerank seam). As a first-class operator it turns any (query, id,
  * rank) relation — hybrid output, ANN output, an A/B candidate — into
  * comparable metrics over a relevance-judgment table.
  *
  * Determinism: the rank discount 1/log2(r+1) is precomputed on the
  * driver as MICRO-unit integer literals for ranks 1..k (k is
  * metadata-scale), so per-query DCG/IDCG are order-free integer sums;
  * the only float ops are final single divisions, rounded to 6
  * decimals. Oracle SQL can inline the identical literals.
  *
  * Scale shape: one broadcast of the k-row discount table, one shuffle
  * of results⋈qrels on (query_id, id), per-query aggregates; the IDCG
  * window is PARTITIONED by query_id. Nothing is proportional to corpus
  * size beyond the ranked-results relation itself.
  */
object RankEval {

  /** round(1e6 / log2(r+1)) for r = 1..k — shared by operator + oracle. */
  def discountMicros(k: Int): Seq[(Int, Long)] =
    (1 to k).map(r => r -> math.round(1e6 / (math.log(r + 1) / math.log(2))))

  /** Per-query metrics.
    *
    * @param results (query_id, id, rank) — rank 1-based, unique per query
    * @param qrels   (query_id, id, rel)  — integer gain, rel > 0 means relevant
    */
  def rankingMetrics(results: DataFrame, qrels: DataFrame, k: Int = 10): DataFrame = {
    val disc = typedlit(discountMicros(k).toMap)
    val rel = qrels.filter(col("rel") > 0)

    val inK = results.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "id"), "left")
      .na.fill(0L, Seq("rel"))
    val perQ = inK.groupBy(col("query_id")).agg(
      sum(col("rel") * element_at(disc, col("rank").cast("int")))
        .as("dcg_micro"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("hits"),
      min(when(col("rel") > 0, col("rank"))).as("first_hit"))

    // ideal ordering: gains desc (id tiebreak for a total order), top-k
    val iw = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("id"))
    val ideal = rel
      .withColumn("irank", row_number().over(iw))
      .filter(col("irank") <= k)
      .groupBy(col("query_id")).agg(
        sum(col("rel") * element_at(disc, col("irank").cast("int")))
          .as("idcg_micro"))
    val nRel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))

    def div6(n: Column, d: Column): Column =
      when(d > 0, round(n.cast("double") / d, 6)).otherwise(lit(0.0))
    perQ
      .join(ideal, Seq("query_id"), "left")
      .join(nRel, Seq("query_id"), "left")
      .na.fill(0L, Seq("idcg_micro", "n_rel"))
      .select(
        col("query_id"),
        col("n_rel"),
        col("hits"),
        div6(col("dcg_micro"), col("idcg_micro")).as("ndcg"),
        when(col("first_hit").isNotNull,
          round(lit(1.0) / col("first_hit"), 6)).otherwise(lit(0.0))
          .as("mrr"),
        round(col("hits") / lit(k.toDouble), 6).as("precision_at_k"),
        div6(col("hits"), col("n_rel")).as("recall_at_k"))
  }
}
