package graft

/** Pure guard logic for Bench's artifact fields (growth ratios,
  * inversion flags, trial-spread flags, drift normalization, the
  * regression guard) — extracted so BenchGuardsSpec can plant a real
  * inversion/regression and prove it still flags after the
  * floor-awareness rules below.
  *
  * Floor rules (round-9 verdict): at sf0.1 many stress points sit at
  * Spark's ~0.2–1 s job floor where run jitter dominates, so
  * (a) an inversion (small factor slower than large) is only flagged
  * when at least one point clears [[FloorSec]] — r9 shipped
  * `ph1: x10 0.978 > x100 0.587`, pure floor noise that buries real
  * signals; and (b) a trial-spread (bimodality) flag likewise requires
  * the slow trial to clear the floor.
  */
object BenchGuards {

  /** Points under this are job-floor-dominated; pairs entirely below it
    * carry no growth/inversion signal.
    */
  val FloorSec = 1.5

  /** Trial max/min above this flags a bimodal stress row. */
  val SpreadRatio = 2.5

  /** Stress-row key prefix marking a per-trial measurement. */
  val TrialPrefix = "t:"

  private val famRe = "^x(\\d+)_(.+)$".r

  /** Split raw stress rows into (headline rows, trials-by-row-name). */
  def splitTrials(rows: Seq[(String, Double)])
      : (Seq[(String, Double)], Map[String, Seq[Double]]) = {
    val (t, head) = rows.partition(_._1.startsWith(TrialPrefix))
    val trials = t.flatMap { case (k, v) =>
      // t:<row>:<i>
      val body = k.stripPrefix(TrialPrefix)
      val cut = body.lastIndexOf(':')
      if (cut > 0) Some((body.substring(0, cut), body.substring(cut + 1), v))
      else None
    }.groupBy(_._1).map { case (row, vs) =>
      row -> vs.sortBy(_._2.toInt).map(_._3)
    }
    (head, trials)
  }

  /** (family, smallFactor, smallVal, bigFactor, bigVal, ratio) per
    * stress family with ≥2 factor points.
    */
  def growth(head: Seq[(String, Double)])
      : Seq[(String, Int, Double, Int, Double, Double)] =
    head.flatMap { case (k, v) =>
      famRe.findFirstMatchIn(k).map(m => (m.group(2), m.group(1).toInt, v))
    }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .flatMap { case (fam, rows) =>
        val sorted = rows.sortBy(_._2)
        if (sorted.size < 2) None
        else {
          val (_, fs, vs) = sorted.head
          val (_, fb, vb) = sorted.last
          Some((fam, fs, vs, fb, vb, if (vs > 0) vb / vs else Double.NaN))
        }
      }

  /** Floor-aware inversions: small-factor point slower than the large
    * one by >0.2 s AND at least one point above the job floor.
    */
  def inversions(g: Seq[(String, Int, Double, Int, Double, Double)])
      : Seq[(String, Int, Double, Int, Double, Double)] =
    g.filter { case (_, _, vs, _, vb, _) =>
      vs > vb + 0.2 && math.max(vs, vb) >= FloorSec
    }

  /** Bimodality/contention tripwire: rows whose WARM-trial spread
    * (max/min over trials 2..n) exceeds [[SpreadRatio]] with the slow
    * trial above the floor. The FIRST trial is excluded — it absorbs
    * the scale-specific JIT/codegen warmup inside the fresh stress JVM
    * (measured r10: trial 1 ran 1.5–4.5× slow on EVERY family, which
    * would make the flag cry wolf on every clean run), while a real
    * mode flip or mid-run contention event still lands in trials 2..n
    * often enough to flag — and the adjudication is then the recorded
    * trials array itself. Returns (row, warm min, warm max).
    */
  def spreadFlags(trials: Map[String, Seq[Double]])
      : Seq[(String, Double, Double)] =
    trials.toSeq.sortBy(_._1).flatMap { case (row, ts) =>
      val warm = ts.drop(1)
      if (warm.size < 2) None
      else {
        val mn = warm.min
        val mx = warm.max
        if (mx >= FloorSec && mn > 0 && mx / mn > SpreadRatio)
          Some((row, mn, mx))
        else None
      }
    }

  /** Host-drift estimate for threshold scaling: the median min/prev
    * ratio over the JOB-FLOOR cohort (snapshot prev ≤ 0.5 s) — those
    * gates measure scheduling+host state, not data-path code, so a
    * uniform CODE slowdown cannot inflate the estimate and mask itself
    * (the round-9 guard took the median over ALL gates, which a
    * uniform real regression could raise up to its own magnitude).
    * Falls back to the all-gates median when fewer than
    * [[MinDriftCohort]] floor gates have snapshot entries. Clamped to
    * [1.0, 2.0].
    */
  val MinDriftCohort = 20

  def drift(minsWithPrev: Seq[(Double, Double)]): Double = {
    def median(xs: Seq[Double]): Option[Double] = {
      val s = xs.sorted
      if (s.isEmpty) None else Some(s(s.size / 2))
    }
    val ratios = minsWithPrev.collect {
      case (m, prev) if prev > 0.05 => (m / prev, prev)
    }
    val floorCohort = ratios.collect { case (r, prev) if prev <= 0.5 => r }
    val all = ratios.map(_._1)
    val est =
      if (floorCohort.size >= MinDriftCohort) median(floorCohort)
      else if (all.size >= MinDriftCohort) median(all)
      else None
    est.map(r => math.min(2.0, math.max(1.0, r))).getOrElse(1.0)
  }

  /** True when the ALL-gates median ratio itself exceeds the alert
    * bound — a uniform slowdown (host or code) that threshold scaling
    * would otherwise absorb silently; surfaced as `drift_alert`.
    */
  val DriftAlertRatio = 1.6

  def driftAlert(minsWithPrev: Seq[(Double, Double)]): Boolean = {
    val rs = minsWithPrev.collect {
      case (m, prev) if prev > 0.05 => m / prev
    }.sorted
    rs.size >= MinDriftCohort && rs(rs.size / 2) > DriftAlertRatio
  }

  /** A STRESS-section quality row: `x<factor>_..._recall`. Only these
    * carry recall VALUES and guard in the inverted direction. Gate
    * timings whose names merely end in `_recall` (ar1_ann_recall,
    * dre1_dedup_recall — they TIME a recall-measuring query) are
    * ordinary timings: the round-10 suffix-only routing excluded them
    * from the timing guard and shipped a 0.16 s timing IMPROVEMENT as a
    * `recall_drops` false alarm in BENCH_r10.json (r10 verdict #1).
    */
  private[graft] def isQualityRow(k: String): Boolean =
    k.matches("x\\d+_.*_recall")

  /** Per-gate regression guard vs the committed snapshot: min grew past
    * 1.5×·drift AND +0.3 s. Returns worst-first, capped at 10. Stress
    * quality rows ([[isQualityRow]]) are excluded — their guard
    * direction is inverted ([[recallDrops]]); gate timings face this
    * guard regardless of name.
    */
  def regressions(guarded: Seq[(String, Double)],
      snapshot: Map[String, Double], drift: Double)
      : Seq[(String, Double, Double)] =
    guarded.filterNot(r => isQualityRow(r._1)).flatMap { case (k, m) =>
      snapshot.get(k).collect {
        case prev if prev > 0 && m > prev * 1.5 * drift &&
            m > prev * drift + 0.3 =>
          (k, prev, m)
      }
    }.sortBy { case (_, p, m) => -(m / p) }.take(10)

  /** Quality-row guard, direction INVERTED from the timing guard: a
    * stress `x*_..._recall` row that DROPS more than 0.05 below its
    * snapshot flags (a recall collapse would otherwise be invisible —
    * the timing guard only fires on increases, and recall values sit
    * under every floor). Returns (row, prev, now).
    */
  def recallDrops(guarded: Seq[(String, Double)],
      snapshot: Map[String, Double]): Seq[(String, Double, Double)] =
    guarded.filter(r => isQualityRow(r._1)).flatMap { case (k, v) =>
      snapshot.get(k).collect { case prev if v < prev - 0.05 =>
        (k, prev, v)
      }
    }.sortBy { case (_, p, v) => v - p }
}
