package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring (CCNet lineage): score each
  * document by the average log-probability of its tokens under the
  * corpus-wide unigram distribution. Low scores flag gibberish and
  * boilerplate; unusually high scores flag degenerate repetition of
  * the most common tokens.
  *
  * Determinism: a distributed `sum(double)` is order-dependent, so the
  * per-occurrence log-probability is QUANTIZED first —
  * `floor(ln(count/total) * 1e6)` micro-nats as a long — and the
  * per-document aggregate is an integer sum, reproducible under any
  * partitioning and any engine. The quantization error is bounded by
  * 1e-6 nat per token and is part of the operator's contract, not
  * noise.
  *
  * Scale: one explode pass builds the unigram table (map-side combined
  * groupBy); scoring joins occurrences back on the token key — a
  * hash-partitioned equi-join, NOT a broadcast, because a 100 TB
  * corpus's vocabulary does not fit an executor. Only the scalar
  * token total is broadcast.
  */
object UnigramLm {

  val MicroNats = 1e6

  /** One row per document with ≥1 token: `doc_id`, `n_tokens`,
    * `sum_micro_nats` (integer sum of quantized token log-probs),
    * `avg_logprob` (nats, rounded to 6).
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // the tokenized occurrences feed the unigram table, the scalar
    // total, AND the join back — cache once (the write-once tokenized-
    // corpus artifact, like the dedup flow's shingle table) instead of
    // paying the regex tokenization per branch
    val occ = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("t")).cache()
    val uni = occ.groupBy(col("t")).agg(count(lit(1)).as("cnt"))
    val total = occ.agg(count(lit(1)).as("total"))
    occ.join(uni, Seq("t"))
      .crossJoin(broadcast(total))
      .withColumn("qn",
        floor(log(col("cnt").cast("double") / col("total")) * MicroNats)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(col("qn")).as("sum_micro_nats"))
      .withColumn("avg_logprob",
        round(col("sum_micro_nats").cast("double") / col("n_tokens")
          / MicroNats, 6))
  }
}
