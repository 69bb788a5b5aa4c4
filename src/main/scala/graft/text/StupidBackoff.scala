package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stupid Backoff bigram scoring (Brants et al. 2007, "Large Language
  * Models in Machine Translation"): score a FOREGROUND corpus under a
  * BACKGROUND corpus LM — `S(w2|w1) = cnt2/cnt1` when the background
  * saw the bigram, else `α · (cu(w2)+1)/(N+V)` (the add-one-smoothed
  * unigram leg; α = 0.4 per the paper). Unlike [[BigramLm]]'s
  * self-scoring, the two-corpus shape makes unseen bigrams REAL — the
  * operator the perplexity-filtering literature actually runs
  * (score web text under a trusted-domain LM, then threshold).
  *
  * Determinism: per-bigram scores quantize to integer micro-nats
  * (`floor(ln(·)·10^6)` — the un1/bg1 contract) so the distributed
  * per-doc sum is order-free; ln of the same IEEE doubles is engine-
  * identical, α·x is one double product both engines form the same
  * way.
  *
  * Scale shape: background count tables join back on their OWN keys
  * (hash joins — a 100 TB background vocabulary never broadcasts);
  * only the scalar (N, V) totals broadcast. One explode per side.
  */
object StupidBackoff {

  /** Per-foreground-doc scores: (doc_id, n_bigrams, n_backoffs,
    * sum_micro_nats, avg_logprob). `background`/`foreground`:
    * (idCol, textCol) tables.
    */
  def scoreDocs(background: DataFrame, foreground: DataFrame,
      idCol: String, textCol: String, alpha: Double = 0.4): DataFrame = {
    def bigrams(df: DataFrame): DataFrame = {
      val toked = df.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
        .filter(size(col("toks")) >= 2)
      toked.select(col("doc_id"),
        posexplode(expr("transform(sequence(1, size(toks) - 1), " +
          "i -> struct(toks[i - 1] AS w1, toks[i] AS w2))")))
        .select(col("doc_id"), col("col.w1").as("w1"), col("col.w2").as("w2"))
    }
    val bgBigrams = bigrams(background)
    val c2 = bgBigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("cnt2")).as("cnt1"))
    val occ = background.select(
      explode(TextFunctions.tokens(col(textCol))).as("t"))
    val uni = occ.groupBy(col("t")).agg(count(lit(1)).as("cu"))
    val tt = occ.agg(count(lit(1)).as("total"),
      countDistinct(col("t")).as("vocab"))
    val fg = bigrams(foreground)
    val qn = when(col("cnt2").isNotNull,
      floor(log(col("cnt2").cast("double") / col("cnt1")) * 1000000))
      .otherwise(floor(log(lit(alpha) *
        (coalesce(col("cu"), lit(0L)) + 1).cast("double") /
        (col("total") + col("vocab"))) * 1000000))
      .cast("long")
    fg
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .join(uni, fg("w2") === uni("t"), "left")
      .crossJoin(broadcast(tt))
      .select(col("doc_id"), qn.as("qn"),
        col("cnt2").isNull.cast("long").as("backed_off"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum(col("backed_off")).cast("long").as("n_backoffs"),
        sum(col("qn")).cast("long").as("sum_micro_nats"))
      .withColumn("avg_logprob",
        round(col("sum_micro_nats").cast("double") / col("n_bigrams")
          / 1000000.0, 6))
  }
}
