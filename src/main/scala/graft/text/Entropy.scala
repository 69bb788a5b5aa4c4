package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.tokens

/** Token-entropy quality signals: Shannon entropy of the per-document
  * token distribution and the type-token ratio — the standard
  * low-information/boilerplate detectors (machine-generated spam sits
  * at the extremes: near-zero entropy for repeated junk, near-maximal
  * for random-word salad) beside rp1's repetition counters.
  *
  * Determinism: entropy = ln(n) − (Σ c·ln c)/n; the Σ term is quantized
  * to integer micro-nats PER TYPE before summation (the un1 trick), so
  * the distributed sum is order-free and engine-exact; the two ln calls
  * on small integer inputs agree across engines, and the final values
  * are rounded per the repo contract.
  *
  * 100 TB: one explode + two hash aggregates keyed by doc — map-side
  * combinable, no windows, no broadcast of anything corpus-sized.
  */
object Entropy {

  /** (doc_id, n_toks, n_types, entropy, ttr) per document. */
  def tokenEntropy(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val tc = docs
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
    tc.groupBy(col("doc_id"))
      .agg(
        sum(round(col("c") * log(col("c")) * 1e6).cast("long"))
          .as("clogc_micro"),
        sum(col("c")).as("n_toks"),
        count(lit(1)).as("n_types"))
      .select(col("doc_id"), col("n_toks"), col("n_types"),
        round(log(col("n_toks")) -
          (col("clogc_micro") / 1e6) / col("n_toks"), 6).as("entropy"),
        round(col("n_types") * lit(1.0) / col("n_toks"), 6).as("ttr"))
  }
}
