package graft

import org.apache.spark.sql.functions._

import graft.dedup.Decontaminate

/** The size-gated routes of semanticContaminated must agree: the
  * broadcast nested-loop (small benchmark) and the IVF probe route
  * (benchmark too large to broadcast) implement ONE contract.
  */
class SemanticRouteSpec extends SparkSpec {
  import spark.implicits._

  private def flagged(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_hits", "bench_id", "sim")
      .as[(Long, Int, Long, Double)].collect().sortBy(_._1).toSeq

  test("forced IVF route agrees exactly with broadcast on a small bench") {
    // below the 4096 KMeans threshold the IVF degenerates to one
    // cluster — the routes must agree bit-for-bit
    val bench = (0L until 40L).map(i =>
      (i, Array(1.0f + i * 0.01f, 0.2f * (i % 3), 0.5f, 0.1f)))
      .toDF("bid", "bvec")
    val corpus = (100L until 160L).map(j =>
      (j, Array(1.0f + (j % 40) * 0.01f, 0.2f * (j % 3), 0.5f, 0.1f)))
      .toDF("cid", "cvec")
    val viaBroadcast = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999)
    val viaIvf = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999,
      benchBroadcastLimit = 0L)
    assert(flagged(viaBroadcast).nonEmpty)
    assert(flagged(viaBroadcast) === flagged(viaIvf))
  }

  test("multi-cluster IVF route finds every planted copy and agrees") {
    // 3 tight axis clusters, 12600 bench rows -> clusterCount = 3:
    // real pruning (a probe scans ~1/3 of the bench), planted corpus
    // copies sit at sim ~1 inside their own cluster
    val bench = (0L until 12600L).map { i =>
      val cl = (i % 3).toInt
      val v = Array(0.0f, 0.0f, 0.0f, ((i / 3) % 7).toFloat * 0.01f)
      v(cl) = 1.0f
      (i, v)
    }.toDF("bid", "bvec")
    val corpus = (0L until 50L).map { j =>
      if (j % 5 == 0) {
        val src = (j * 7) % 12600
        val cl = (src % 3).toInt
        val v = Array(0.0f, 0.0f, 0.0f, ((src / 3) % 7).toFloat * 0.01f)
        v(cl) = 1.0f
        (j, v)
      } else (j, Array(0.5f, 0.5f, 0.5f, 0.9f)) // ~0.4 to every cluster
    }.toDF("cid", "cvec")
    val viaIvf = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.9,
      benchBroadcastLimit = 1000L, nprobes = 2)
    val viaBroadcast = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.9)
    val planted = (0L until 50L).filter(_ % 5 == 0).toSet
    assert(flagged(viaIvf).map(_._1).toSet === planted)
    assert(flagged(viaIvf) === flagged(viaBroadcast))
  }

  test("route override and benchCount hint drive the route (ADVICE r8)") {
    val bench = (0L until 40L).map(i =>
      (i, Array(1.0f + i * 0.01f, 0.2f * (i % 3), 0.5f, 0.1f)))
      .toDF("bid", "bvec")
    val corpus = (100L until 160L).map(j =>
      (j, Array(1.0f + (j % 40) * 0.01f, 0.2f * (j % 3), 0.5f, 0.1f)))
      .toDF("cid", "cvec")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString
    // exact FORCED below a zero limit: no cluster probe in the plan —
    // the explicit way to demand exactness without raising the limit
    val exact = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999,
      benchBroadcastLimit = 0L, route = "exact")
    assert(!planOf(exact).contains("cluster_id"))
    // ivf FORCED on a tiny bench: cluster probe present
    val ivf = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999,
      route = "ivf")
    assert(planOf(ivf).contains("cluster_id"))
    // auto + benchCount hint: the hint (not an executed count job)
    // drives the choice — a huge claimed bench routes to IVF even
    // though the actual bench is 40 rows
    val hinted = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999,
      benchCount = Some(Decontaminate.BenchBroadcastLimit + 1))
    assert(planOf(hinted).contains("cluster_id"))
    // one contract: all routes agree on the degenerate 1-cluster bench
    assert(flagged(exact).nonEmpty)
    assert(flagged(exact) === flagged(ivf))
    assert(flagged(exact) === flagged(hinted))
    intercept[IllegalArgumentException] {
      Decontaminate.semanticContaminated(
        corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999,
        route = "bogus")
    }
  }

  test("auto-route bench count is memoized per bench plan (VERDICT r8 #6)") {
    Decontaminate.benchCountMemoClear()
    val bench = (0L until 10L).map(i =>
      (i, Array(1.0f, 0.0f, 0.0f, 0.1f * i))).toDF("bid", "bvec")
    val corpus = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("cid", "cvec")
    Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999).collect()
    assert(Decontaminate.benchCountMemoSize === 1)
    // second call over the SAME bench: no new memo entry (stable route,
    // no second sizing job)
    Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.9).collect()
    assert(Decontaminate.benchCountMemoSize === 1)
    // a DIFFERENT bench gets its own entry
    Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench.limit(5), "bid", "bvec",
      tau = 0.9).collect()
    assert(Decontaminate.benchCountMemoSize === 2)
  }

  test("an injected (persisted-style) index forces the IVF route") {
    val bench = (0L until 30L).map(i =>
      (i, Array((i % 5).toFloat, 1.0f, 0.0f, 0.0f))).toDF("bid", "bvec")
    val corpus = Seq((1L, Array(2.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("cid", "cvec")
    val idx = graft.ann.Ivf.build(
      bench.select(col("bid").as("bench_id"), col("bvec").as("bvec")),
      "bench_id", "bvec")
    val out = Decontaminate.semanticContaminated(
      corpus, "cid", "cvec", bench, "bid", "bvec", tau = 0.999,
      benchIndex = Some(idx))
    val rows = flagged(out)
    assert(rows.map(_._1) === Seq(1L))    // exact copy of bench id 2 family
    assert(rows.head._2 === 6)            // 30/5 exact matches at sim 1
  }
}
