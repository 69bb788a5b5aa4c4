package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model quality scoring with add-one smoothing — the
  * conditional-probability upgrade of [[UnigramLm]] (CCNet/KenLM
  * lineage: documents whose token SEQUENCES are improbable under the
  * corpus model score low even when every individual token is common,
  * which is exactly the word-salad failure mode unigram scoring
  * misses).
  *
  * score(doc) = Σ ln P(w_i | w_{i-1}),
  * P(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V).
  *
  * Determinism: the same micro-nat trick as un1 — each occurrence's
  * log-prob is quantized to `floor(ln(p) * 1e6)` BEFORE the per-doc
  * integer sum, so the aggregate is order-free across partitions and
  * engines.
  *
  * Scale: bigram occurrences explode once; the bigram and context
  * count tables are corpus-scale keyed tables joined back on their
  * keys (hash joins, NOT broadcast — a 100 TB corpus's bigram table
  * dwarfs an executor). Only the scalar vocabulary size is broadcast.
  */
object BigramLm {

  /** One row per document with ≥2 tokens: `doc_id`, `n_bigrams`,
    * `sum_micro_nats`, `avg_logprob` (nats, rounded to 6).
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // toked feeds the bigram explode (consumed by the count table AND
    // the join back) plus the vocabulary scalar — cache once so the
    // regex tokenization pass runs once, not per branch
    val toked = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks")).cache()
    val bg = toked.filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] as w1, toks[i + 1] as w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt2"))
    // context counts roll up from the bigram table — a pass over the
    // (much smaller) distinct-bigram relation, not the occurrences
    val c1 = c2.groupBy(col("w1")).agg(sum(col("cnt2")).as("cnt1"))
    val vocab = toked.select(explode(col("toks")).as("t"))
      .agg(countDistinct(col("t")).as("vocab"))
    // r11: fold the context counts and the vocab scalar into ONE
    // per-bigram score table BEFORE touching the occurrence relation —
    // the old shape joined the doc-bigram occurrences to c2 on
    // (w1, w2) and then RE-SHUFFLED the whole joined occurrence
    // relation by w1 for the c1 join (two occurrence-scale exchanges;
    // §2.4). qn depends only on (cnt2, cnt1, vocab), so it computes on
    // the distinct-bigram table and the occurrences shuffle exactly
    // once. Identical inputs to the same expression ⇒ identical qn
    // (bg1 oracle green).
    val score = c2.join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("qn",
        floor(log((col("cnt2").cast("double") + 1) / (col("cnt1") + col("vocab")))
          * UnigramLm.MicroNats).cast("long"))
      .select(col("w1"), col("w2"), col("qn"))
    bg.join(score, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum(col("qn")).as("sum_micro_nats"))
      .withColumn("avg_logprob",
        round(col("sum_micro_nats").cast("double") / col("n_bigrams")
          / UnigramLm.MicroNats, 6))
  }
}
