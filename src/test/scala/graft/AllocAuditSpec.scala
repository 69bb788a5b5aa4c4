package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.dedup.SpanDedup
import graft.text.SpanCorruption

/** Allocation-shape audit (round-9 verdict #8): the span-dedup and
  * span-corruption plans must keep their de-bimodalized hot shapes —
  * no per-window gram-string build (slice + concat_ws + per-window
  * md5) in SpanDedup, no per-token md5 above the token explode in
  * SpanCorruption (the offset hash is per-block, below the Generate),
  * and one ReusedExchange feeding SpanDedup's second consumer instead
  * of a full tokenizer re-evaluation. Exact plan assertions, not
  * timing; AQE off so the static plan is inspected (PlanAuditSpec
  * convention).
  */
class AllocAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0L until 40L).map(i =>
    (i, s"tok${i % 7} alpha beta gamma delta ep zeta eta theta " +
      s"iota kappa tok${i % 5} mu nu xi omicron pi rho sigma tau " +
      "upsilon phi chi psi omega")).toDF("doc_id", "text")

  private def staticPlan(df: => org.apache.spark.sql.DataFrame): SparkPlan = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Every operator whose subtree STRICTLY contains a Generate (i.e.
    * runs at or after the explode output).
    */
  private def aboveGenerate(plan: SparkPlan): Seq[SparkPlan] =
    plan.collect {
      case p if !p.nodeName.contains("Generate") &&
          p.children.exists(c =>
            c.find(_.nodeName.contains("Generate")).isDefined) => p
    }

  test("dupSpanCoverage: window hashes come from the fused native " +
      "expression — no gram-string slice/concat_ws anywhere") {
    val plan = staticPlan(
      SpanDedup.dupSpanCoverage(docs, "doc_id", "text", 8)).toString
    assert(!plan.contains("slice("), plan)
    assert(!plan.contains("concat_ws"), plan)
    assert(plan.contains("graft_window_hashes"), plan)
  }

  test("removeDupSpans: occurrence scan has no gram-string build " +
      "(concat_ws remains only in the final per-doc text rebuild)") {
    val plan = staticPlan(
      SpanDedup.removeDupSpans(docs, "doc_id", "text", 8)).toString
    assert(!plan.contains("slice("), plan)
    assert(plan.contains("graft_window_hashes"), plan)
  }

  test("SpanCorruption.corrupt: no md5 at token-row granularity — the " +
      "block-offset hash lives below the explode") {
    val plan = staticPlan(SpanCorruption.corrupt(docs, "doc_id", "text"))
    val offenders = aboveGenerate(plan).filter(p =>
      p.expressions.mkString.toLowerCase.contains("md5"))
    assert(offenders.isEmpty,
      "md5 above the token Generate in: " +
        offenders.map(_.nodeName).mkString(", "))
    // and the hoisted per-block offs array is what post-explode rows read
    assert(plan.toString.contains("element_at(offs"), plan.toString)
  }

  test("dupSpanCoverage: gram aggregate map-side combines below its " +
      "exchange; no unpartitioned window; no join back to the base") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = staticPlan(SpanDedup.dupSpanCoverage(docs, "doc_id", "text", 8))
    // every shuffle over the occurrence stream has a partial aggregate
    // or the window's doc partitioning above it — and each partial
    // HashAggregate keyed by g sits BELOW its exchange (map-side
    // combine preserved; the r10 repartition experiment lost it)
    val partialBelowExchange = plan.collect {
      case e: ShuffleExchangeExec => e.child.collectFirst {
        case a: HashAggregateExec
          if a.groupingExpressions.map(_.name).contains("g") => a
      }.isDefined
    }
    assert(partialBelowExchange.contains(true),
      s"no partial gram aggregate below an exchange:\n$plan")
    assert(plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.isEmpty)
    // the sentinel-row design removed the old base join-back: the plan
    // has exactly ONE join (occ ⋈ dupGrams)
    val joins = plan.collect {
      case j if j.nodeName.contains("Join") => j
    }
    assert(joins.size == 1, s"expected 1 join, got ${joins.size}:\n$plan")
  }
}
