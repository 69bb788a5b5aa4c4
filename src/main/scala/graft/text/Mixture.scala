package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temperature-weighted domain mixture — the sampling-weight schedule
  * multi-domain LLM corpora train under (Gopher / LLaMA style): domain
  * i's share of the token budget is n_i^alpha / sum_j n_j^alpha, with
  * alpha < 1 up-weighting small domains (alpha=1 is proportional,
  * alpha=0 uniform).
  *
  * Everything after the per-domain token count is integer-exact so the
  * gate hash-matches: the share n_i^alpha is quantized to micro-units
  * (floor(n^alpha * 1e6) — correctly-rounded IEEE pow on both engines,
  * and the 1e6 floor absorbs last-ulp drift long before it flips an
  * integer), the budget is apportioned by integer largest-remainder
  * (floor(B*s_i/S) + the leftover distributed by remainder desc), so
  * the output token targets sum to EXACTLY the budget.
  *
  * Scale: the per-domain count is one map-side-combinable aggregate
  * over the corpus; everything downstream runs on the DOMAIN relation
  * — tens of rows at any corpus size. The remainder rank is a
  * self-join count on that tiny relation, NOT a window: the plan
  * carries no WindowExec at all, so nothing here ever funnels corpus
  * rows through one partition.
  */
object Mixture {

  /** docs(domainCol, nTokensCol) → (domain, n_tokens, share_micro,
    * target_tokens) with sum(target_tokens) == budget exactly.
    */
  def temperatureTargets(docs: DataFrame, domainCol: String,
      nTokensCol: String, alpha: Double, budget: Long): DataFrame = {
    val perDomain = docs
      .groupBy(col(domainCol).as("domain"))
      .agg(sum(col(nTokensCol).cast("long")).as("n_tokens"))
    // micro-unit integer share; the integer sum is order-free.
    // alpha=0.5 routes through sqrt — IEEE-correctly-rounded on BOTH
    // engines, unlike pow (1-ulp licensed in libm) — so the micro
    // floor is bit-identical to the oracle by construction, not by
    // probability.
    val powed =
      if (alpha == 0.5) sqrt(col("n_tokens").cast("double"))
      else pow(col("n_tokens").cast("double"), lit(alpha))
    val shared = perDomain.withColumn("share_micro",
      floor(powed * 1e6).cast("long"))
    val tot = shared.agg(sum(col("share_micro")).as("s_total"))
    // integer `div`, NOT Column.divide: double division rounds the
    // quotient before the long cast truncates it, which can disagree
    // with the oracle's integer // by one on near-integer quotients
    val base = shared.crossJoin(broadcast(tot))
      .withColumn("floor_tokens",
        expr(s"(${budget}L * share_micro) div s_total"))
      .withColumn("rem", (lit(budget) * col("share_micro")) % col("s_total"))
      .localCheckpoint(true) // tiny; feeds three self-referencing sides
    val leftover = base.agg((lit(budget) - sum(col("floor_tokens")))
      .as("leftover"))
    // 1-based largest-remainder rank WITHOUT a window: count the
    // domains strictly ahead in (rem desc, domain asc) order.
    val ahead = base.select(col("domain").as("o_domain"),
      col("rem").as("o_rem"))
    val ranked = base.join(broadcast(ahead),
        col("o_rem") > col("rem") ||
          (col("o_rem") === col("rem") && col("o_domain") < col("domain")),
        "left_outer")
      .groupBy(col("domain"), col("n_tokens"), col("share_micro"),
        col("floor_tokens"), col("rem"))
      .agg((count(col("o_domain")) + 1).as("rrank"))
    ranked.crossJoin(broadcast(leftover))
      .withColumn("target_tokens",
        col("floor_tokens") +
          when(col("rrank") <= col("leftover"), 1L).otherwise(0L))
      .select(col("domain"), col("n_tokens"), col("share_micro"),
        col("target_tokens"))
  }
}
