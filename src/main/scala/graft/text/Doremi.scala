package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429):
  * iteratively upweight the domains where the proxy model's excess
  * loss over a reference model is largest, so the final training
  * mixture spends its token budget where learning headroom is. This is
  * the standard mixture-optimization step between corpus curation
  * (mx1/mx2) and sampling (ir1/ws1).
  *
  * Integer-exact linearized update: the paper's exponentiated-gradient
  * step `w ← w·exp(η·excess)` is replaced by its first-order form
  * `w ← w + (w·η·excess)` computed entirely in integer micro-units
  * with documented division order — `exp` differs in the last ulp
  * across libm implementations, and the engine's oracle contract is
  * bit-equality, not approximation (the same trade lshp1 makes for
  * `pow`). Renormalization is integer too: `w·10⁶ div Σw`.
  *
  * Scale shape (100 TB): the corpus pays ONE map-side-combinable
  * aggregation (domain → count, Σ excess); every iteration after that
  * operates on the domain-cardinality table (bounded, tens of rows)
  * with a broadcast 1-row total — no corpus re-scan, no window, no
  * shuffle beyond the first groupBy.
  */
object Doremi {

  /** Per-domain mixture weights after `iters` linearized DoReMi steps.
    * `excessCol` is the per-document non-negative excess loss in
    * micro-units (proxy minus reference, clamped at 0 by the caller).
    * Output: (domain, n_docs, avg_excess_micro, weight_micro) where
    * weight_micro sums to ~10⁶ across domains (integer-division
    * remainder may leave a few micro short).
    */
  def domainWeights(docs: DataFrame, domainCol: String, excessCol: String,
      iters: Int = 2, etaMicro: Long = 100000L): DataFrame = {
    // cache() the domain table (tens of rows): it appears in several
    // plan subtrees — the |domains| crossJoin count plus every
    // iteration's total through w's lineage — and without the cache the
    // corpus groupBy can execute once per subtree (ADVICE r9; the
    // "corpus pays ONE aggregation" claim is this cache). Lazy cache,
    // not localCheckpoint: metadata-scale, no lineage growth.
    val perDomain = docs
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col(excessCol)).as("sum_excess"))
      .withColumn("avg_excess_micro", expr("sum_excess div n_docs"))
      .drop("sum_excess")
      .cache()
    // uniform start: 10^6 div |domains| (the 1-row count broadcasts)
    var w = perDomain
      .crossJoin(broadcast(perDomain.select(count(lit(1)).as("nd"))))
      .withColumn("weight_micro", expr("1000000L div nd"))
      .drop("nd")
    (1 to iters).foreach { _ =>
      val raw = w.withColumn("w_raw",
        expr(s"weight_micro + (((weight_micro * ${etaMicro}L) div 1000000) " +
          "* avg_excess_micro) div 1000000"))
      val tot = raw.agg(sum(col("w_raw")).as("tot"))
      w = raw.crossJoin(broadcast(tot))
        .withColumn("weight_micro", expr("(w_raw * 1000000) div tot"))
        .drop("w_raw", "tot")
    }
    // Materialize the metadata-scale result (tens of rows) so the
    // cached domain table can be released before returning: repeated
    // domainWeights calls in a long-lived session (ServeMain/MCP)
    // would otherwise accumulate cached frames in the block manager
    // (ADVICE r10). localCheckpoint also truncates the 2·iters-deep
    // crossJoin lineage the caller would re-optimize per action.
    val out = w.select(col("domain"), col("n_docs"),
      col("avg_excess_micro"), col("weight_micro"))
      .localCheckpoint(eager = true)
    perDomain.unpersist(blocking = false)
    out
  }
}
