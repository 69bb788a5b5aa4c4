package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan audit over EVERY gate query: the two scale-killer shapes
  * the round-1 bench exposed must never reappear —
  *  - WindowExec with an empty partition spec (moves the whole input to
  *    one partition; the h1=64s bug), and
  *  - CartesianProductExec (all-pairs blowup; the d5=124s bug).
  * Typed traversal of the compiled plan, AQE off so the static plan is
  * inspected without executing the query.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("no single-partition window and no cartesian in any gate query plan") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan: SparkPlan = fn(spark, sfDir).queryExecution.executedPlan
          val globalWindows = plan.collectWithSubqueries {
            case w: WindowExec if w.partitionSpec.isEmpty => w
          }
          val cartesians = plan.collectWithSubqueries {
            case c: CartesianProductExec => c
          }
          (if (globalWindows.nonEmpty) Seq(s"$name: global window") else Nil) ++
            (if (cartesians.nonEmpty) Seq(s"$name: cartesian product") else Nil)
      }
      assert(offenders.isEmpty, offenders.mkString("; "))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("batch operators plan the intended scale shapes") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // every window in the batch gates must be PARTITIONED (per-plan /
      // per-qid top-k), and the small sides (query terms, idf, corpus,
      // rule tables) must broadcast — the corpus side never shuffles to
      // a single node
      Seq("hb1_hybrid_batch", "au1_claim_evidence").foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan
        val windows = plan.collectWithSubqueries { case w: WindowExec => w }
        assert(windows.nonEmpty, s"$name: expected partitioned windows")
        assert(windows.forall(_.partitionSpec.nonEmpty),
          s"$name: found an unpartitioned window")
        val broadcasts = plan.collectWithSubqueries {
          case b: BroadcastExchangeExec => b
        }
        assert(broadcasts.nonEmpty,
          s"$name: expected broadcast exchanges for the small sides")
      }
      // decontamination: the eval-set side broadcasts, the corpus
      // streams — the n-gram join must not shuffle on corpus size
      val dcPlan = SparkEntry.queries("dc1_decontaminate")(spark, sfDir)
        .queryExecution.executedPlan
      val dcBroadcasts = dcPlan.collectWithSubqueries {
        case b: BroadcastExchangeExec => b
      }
      assert(dcBroadcasts.nonEmpty,
        "dc1: expected the benchmark n-gram side to broadcast")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("gq1 rule filter is a pure map: zero exchanges in the plan") {
    import org.apache.spark.sql.execution.exchange.Exchange
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // every signal is a Column HOF over the token array — the plan
      // must contain no shuffle AND no broadcast: scan → project →
      // (sort for the gate's orderBy) only. The final orderBy is the
      // one allowed global operation (driver-side presentation sort).
      val plan = SparkEntry.queries("gq1_gopher_rules")(spark, sfDir)
        .queryExecution.executedPlan
      val exchanges = plan.collectWithSubqueries {
        case e: Exchange => e
      }
      // the gate's presentation orderBy plans one range exchange; the
      // OPERATOR itself must contribute none (no hash shuffle, no
      // broadcast, no aggregation exchange)
      import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
      val nonSort = exchanges.filterNot(
        _.outputPartitioning.isInstanceOf[RangePartitioning])
      assert(nonSort.isEmpty,
        s"gq1: expected a shuffle-free map, found: ${nonSort.map(_.nodeName)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q12 parses the props JSON exactly once per row") {
    import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, JsonToStructs}
    val df = SparkEntry.queries("q12_json_and_case")(spark, sfDir)
    val parses = df.queryExecution.optimizedPlan.collect { case node =>
      node.expressions.flatMap(_.collect {
        case g: GetJsonObject => g
        case j: JsonToStructs => j
      })
    }.flatten
    assert(parses.size == 1,
      s"expected exactly one JSON parse in the optimized plan, got ${parses.size}")
  }
}
