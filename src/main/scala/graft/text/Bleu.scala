package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BLEU-style n-gram overlap scoring between candidate/reference text
  * pairs (Papineni et al. 2002): modified (clipped) unigram and bigram
  * precision and their geometric mean. The eval-side complement of the
  * ranking metrics in `graft.search.RankEval` — generation/translation
  * eval, near-dup pair qualification, and decontamination audits all
  * consume exactly this overlap score.
  *
  * BLEU's brevity penalty needs `exp`, whose last-ulp behavior is not
  * an engine-portable contract — so the score here is the BP-free
  * bigram BLEU (candidate/reference lengths ride along; a caller that
  * wants BP applies it to the emitted lengths). Counts are exact
  * integers; the two precisions and their geometric mean are single
  * double divisions/sqrt on integer inputs, rounded to 6 — the same
  * determinism contract as the cosine gates.
  *
  * Scale shape: gram counting is explode → groupBy (pair, gram) — hash
  * partitioned, linear in corpus tokens; the clip join is an equi-join
  * on (pair, gram). No windows, no collects.
  */
object Bleu {

  /** Bigram array of a token array (positional, NOT distinct); empty
    * for arrays of fewer than 2 tokens (an unguarded sequence(2, size)
    * would descend and index out of bounds under ANSI mode).
    */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(2), size(toks)),
        i => concat_ws(" ", element_at(toks, i - 1), element_at(toks, i))))
      .otherwise(typedlit(Seq.empty[String]))

  /** Clipped matched count and total for one n-gram order. */
  private def precision(pairs: DataFrame, gramCol: String): DataFrame = {
    val cand = pairs.select(col("pair_id"),
        explode(col(s"cand_$gramCol")).as("g"))
      .groupBy(col("pair_id"), col("g"))
      .agg(count(lit(1)).as("cc"))
    val ref = pairs.select(col("pair_id"),
        explode(col(s"ref_$gramCol")).as("g"))
      .groupBy(col("pair_id"), col("g"))
      .agg(count(lit(1)).as("rc"))
    cand.join(ref, Seq("pair_id", "g"))
      .groupBy(col("pair_id"))
      .agg(sum(least(col("cc"), col("rc"))).cast("long").as(s"m_$gramCol"))
  }

  /** Score (pair_id, cand_toks, ref_toks) rows; both sides need ≥ 2
    * tokens. Output: (pair_id, cand_len, ref_len, p1, p2, bleu2) with
    * precisions rounded to 6.
    */
  def bleu2(pairs: DataFrame): DataFrame = {
    val base = pairs
      .filter(size(col("cand_toks")) >= 2 && size(col("ref_toks")) >= 2)
      .select(col("pair_id"),
        col("cand_toks").as("cand_g1"), col("ref_toks").as("ref_g1"),
        bigrams(col("cand_toks")).as("cand_g2"),
        bigrams(col("ref_toks")).as("ref_g2"),
        size(col("cand_toks")).as("cand_len"),
        size(col("ref_toks")).as("ref_len"))
      .cache() // four explode branches + the length channel share it
    val m1 = precision(base, "g1")
    val m2 = precision(base, "g2")
    base.select(col("pair_id"), col("cand_len"), col("ref_len"))
      .join(m1, Seq("pair_id"), "left").na.fill(0L, Seq("m_g1"))
      .join(m2, Seq("pair_id"), "left").na.fill(0L, Seq("m_g2"))
      .select(col("pair_id"), col("cand_len"), col("ref_len"),
        round(col("m_g1").cast("double") / col("cand_len"), 6).as("p1"),
        round(col("m_g2").cast("double") / (col("cand_len") - 1), 6)
          .as("p2"))
      .withColumn("bleu2", round(sqrt(col("p1") * col("p2")), 6))
  }
}
