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
    // r11: aggregate to per-document (token, tf) pairs INSIDE each row
    // (native TokenTf — zero shuffle) before anything else, so every
    // downstream exchange moves distinct (doc, token) pairs weighted by
    // tf instead of raw occurrences (§2.3 aggregate before you
    // shuffle; on natural-language corpora the tf compression is the
    // point — repeated tokens collapse). The pair table feeds the
    // unigram rollup AND the join back — cache once (the write-once
    // tokenized-corpus artifact, like the dedup flow's shingle table)
    // instead of paying the regex tokenization per branch. Integer
    // equivalence: sum(qn·tf) over pairs = sum(qn) over occurrences,
    // count(occurrences) = sum(tf) — bit-identical outputs (un1
    // oracle + UnigramLmSpec).
    graft.functions.GraftFunctions.ensure("graft_term_tf",
      exprs => graft.functions.TokenTf(exprs.head))
    val tfp = docs.select(col(idCol).as("doc_id"),
        explode(call_function("graft_term_tf",
          TextFunctions.tokens(col(textCol)))).as("kv"))
      .select(col("doc_id"), col("kv.term").as("t"), col("kv.tf").as("tf"))
      .cache()
    val uni = tfp.groupBy(col("t")).agg(sum(col("tf")).as("cnt"))
    // scalar total: one cached-pair scan, no vocab exchange (re-rolling
    // it up from `uni` would re-derive the vocab aggregate unless the
    // runtime happens to reuse the exchange)
    val total = tfp.agg(sum(col("tf")).as("total"))
    tfp.join(uni, Seq("t"))
      .crossJoin(broadcast(total))
      .withColumn("qn",
        floor(log(col("cnt").cast("double") / col("total")) * MicroNats)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("int").as("n_tokens"),
        sum(col("qn") * col("tf")).as("sum_micro_nats"))
      .withColumn("avg_logprob",
        round(col("sum_micro_nats").cast("double") / col("n_tokens")
          / MicroNats, 6))
  }
}
