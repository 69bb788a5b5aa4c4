package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): run every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, print ONE JSON line with per-query seconds.
  *
  * A small warmup action runs first so the first measured query does not
  * pay JVM/codegen/session initialization (the driver compares against
  * the reference's steady-state numbers, BASELINE.md).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every input table + exercise codegen/shuffle machinery
    graft.tables.Tables.names.foreach { t =>
      try graft.tables.Tables(spark, sfDir, t).limit(1).count()
      catch { case _: Throwable => }
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // Reference harness semantics (BASELINE.md): 3 timed runs per query,
    // report the median — for EVERY query, no run-once shortcut. A query
    // that throws is reported visibly in an "errors" field (and on
    // stderr), never silently recorded as a fast success.
    def once(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          // keep errors SHORT: the driver tails the bench output, and 12
          // long stack prefixes once truncated away all 121 timings
          Some(e.toString.replaceAll("\\s+", " ").take(80))
        }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // SPARK_GRAFT_ONLY=<regex> restricts to matching query names (and
    // implies stress off) — for targeted perf iteration; the driver
    // never sets it, so recorded rounds always cover everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.findFirstIn(n).isDefined)
    }
    val results = selected.map { case (name, fn) =>
      val runs = Seq(once(fn), once(fn), once(fn))
      val median = runs.map(_._1).sorted.apply(1)
      // the min distinguishes host-load contamination (median >> min)
      // from a real regression (median ≈ min, both high) — three rounds
      // of load-skewed driver numbers motivated recording it
      val minT = runs.map(_._1).min
      val err = runs.flatMap(_._2).headOption
      err.foreach(e => System.err.println(s"[bench] $name FAILED: $e"))
      (name, median, minT, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""
    def j3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + j3(v) }
      .mkString("{", ",", "}")
    val qmins = results.map { case (k, _, m, _) => "\"" + k + "\":" + j3(m) }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Scale-stress recording (SPARK_GRAFT_STRESS=0 disables): the seven
    // heaviest operator families at two sizes 10× apart, so the round
    // artifact captures wall-time GROWTH, not just absolute speed.
    // Kept OUT of "total"/"queries" — it measures scaling, not the
    // per-query baseline comparison.
    val stress =
      if (sys.env.get("SPARK_GRAFT_STRESS").contains("0"))
        """{"skipped":"SPARK_GRAFT_STRESS=0"}"""
      else if (only.nonEmpty) """{"skipped":"SPARK_GRAFT_ONLY set"}"""
      else {
        // drop the gate queries' persisted caches (dedup/IVF/ancestry
        // indexes) first: stress builds its own corpora, and measuring
        // it against a memory-starved session inflates variance
        spark.catalog.clearCache()
        // a stress failure must be VISIBLE in the artifact — an empty
        // {} here once read as "stress silently not recorded" in a
        // committed round artifact
        try Stress.runDefault(spark)
          .map { case (k, v) => "\"" + k + "\":" + j3(v) }
          .mkString("{", ",", "}")
        catch { case e: Throwable =>
          val msg = e.toString.replaceAll("\\s+", " ").take(160)
          System.err.println(s"[bench] stress failed: $msg")
          s"""{"error":${jstr(msg)}}"""
        }
      }

    val fullLine = s"""{"metric":"total","value":${j3(total)},"unit":"sec","queries":$qs,"queries_min":$qmins,"errors":$errs,"stress":$stress,"sf":"$sfDir"}"""
    // compact recap BEFORE the full line: the driver tail-captures the
    // bench log, so the LAST line is the one that reliably survives —
    // round 6 printed full-then-compact and the full per-query map was
    // truncated upstream ("parsed": null). The full line also lands in
    // BENCH_LOCAL.json so it is never at the mercy of log capture.
    val slow = results.sortBy(-_._2).take(30)
      .map { case (k, v, _, _) => "\"" + k + "\":" + j3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total_compact","value":${j3(total)},"unit":"sec","n_queries":${results.size},"n_errors":${results.count(_._4.nonEmpty)},"top30":$slow,"sf":"$sfDir"}""")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LOCAL.json")),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: $e")
    }
    println(fullLine)
    spark.stop()
  }
}
