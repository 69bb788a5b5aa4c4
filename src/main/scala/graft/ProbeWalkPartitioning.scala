package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement probe (r12, committed as evidence): the big-walk
  * pre-partitioned edge checkpoint (r11) vs the r12 fix that
  * materializes that checkpoint with AQE disabled so its
  * HashPartitioning actually survives into the LogicalRDD (see
  * `Kg.minDist` — with AQE on, `Dataset.localCheckpoint` copies
  * `outputPartitioning` from the `AdaptiveSparkPlanExec` wrapper, a
  * LeafExecNode whose default is `UnknownPartitioning(0)`, so every
  * hop re-exchanged the full edge relation).
  *
  * Seconds on this host swing 2x+ under steal bursts, so the primary
  * metric is per-variant TOTAL SHUFFLE WRITE BYTES (SparkListener task
  * metrics) — deterministic for a fixed fixture. Variants interleave
  * in one JVM; both use the same shuffle_hash hints, so the only delta
  * is whether the edge side's partitioning is visible to the planner.
  *
  * Usage: `runMain graft.ProbeWalkPartitioning [nNodes]` (default 1M —
  * the x100 walk-stress fixture size, ~2M edges, 8 hops).
  *
  * MEASURED OUTCOME (this sandbox, local[32], 1M nodes / 2M edges,
  * reached-set identical at 980000 both variants): per-walk shuffle
  * write 237.3 MB (broken: UnknownPartitioning, per-hop edge
  * Exchange) vs 49.3 MB (fixed: HashPartitioning preserved) — 4.8x
  * fewer shuffled bytes; warm seconds 11.3-13.4 vs 11.0-11.1 (the
  * gate-scale walk is job-latency-bound, so the bytes, which grow
  * with |E|, are the 100 TB argument). Output committed as
  * `plans/r12/walk_partitioning_probe_output.txt`.
  */
object ProbeWalkPartitioning {
  /** The minDist hop loop, with the edge-materialization strategy as a
    * parameter (everything else identical to `Kg.minDist`'s big path).
    */
  def walk(e: DataFrame, seeds: DataFrame, maxHops: Int): Long = {
    val s0 = seeds.select(col("id"), lit(0).as("dist"))
      .localCheckpoint(eager = true)
    var acc = s0
    var frontier = acc
    var hop = 1
    var growing = true
    while (growing && hop <= maxHops) {
      val frontierSide = frontier.hint("shuffle_hash")
      val accSide = acc.select("id").hint("shuffle_hash")
      val next = e.join(frontierSide, e("walk_from") === frontierSide("id"))
        .select(col("walk_to").as("id"))
        .distinct()
        .join(accSide, Seq("id"), "left_anti")
        .select(col("id"), lit(hop).as("dist"))
      val p = next.localCheckpoint(eager = false)
      growing = p.count() > 0
      frontier = p
      acc = acc.unionByName(frontier)
      hop += 1
    }
    acc.groupBy("id").agg(min("dist").as("dist")).count()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("probe-walk-partitioning")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nShuffle = cpus.toInt
    // the x100 walk-stress graph: a chain plus hash-scattered skips
    val ids = spark.range(n)
    val chain = ids.filter(col("id") < n - 1).select(
      concat(lit("v"), col("id")).as("walk_from"),
      concat(lit("v"), col("id") + 1).as("walk_to"))
    val skip = ids.select(
      concat(lit("v"), col("id")).as("walk_from"),
      concat(lit("v"), pmod(col("id") * 7 + 13, lit(n))).as("walk_to"))
    val edges = chain.unionByName(skip).localCheckpoint(eager = true)
    val seeds = ids.filter(col("id") % 100 === 0)
      .select(concat(lit("v"), col("id")).as("id"))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          Option(te.taskMetrics).foreach(m =>
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten))
      })
    def drained(): Long = {
      var prev = -1L
      var cur = shuffleBytes.get()
      while (prev != cur) { Thread.sleep(200); prev = cur; cur = shuffleBytes.get() }
      cur
    }
    def matEdges(aqeOffForCheckpoint: Boolean): DataFrame =
      if (aqeOffForCheckpoint) {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try edges.repartition(nShuffle, col("walk_from"))
          .localCheckpoint(eager = true)
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      } else edges.repartition(nShuffle, col("walk_from"))
        .localCheckpoint(eager = true)
    def run(tag: String, aqeOff: Boolean): Unit = {
      val e = matEdges(aqeOff)
      println("[probe] " + tag + " edge LogicalRDD partitioning: " +
        e.queryExecution.optimizedPlan.collect {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.outputPartitioning.toString
        }.mkString(","))
      val b0 = drained()
      val t0 = System.nanoTime()
      val reached = walk(e, seeds, maxHops = 8)
      val sec = (System.nanoTime() - t0) / 1e9
      val mb = (drained() - b0) / 1e6
      println(f"[probe] $tag reached=$reached shuffle_write_mb=$mb%.1f sec=$sec%.3f")
    }
    // warm both paths once, then interleave the recorded trials
    run("warm_r11broken", aqeOff = false)
    run("warm_r12fixed", aqeOff = true)
    (1 to 2).foreach { i =>
      run(s"r11broken_$i", aqeOff = false)
      run(s"r12fixed_$i", aqeOff = true)
    }
    spark.stop()
  }
}
