package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench guard logic is pure so the round-9 verdict's asks are
  * provable: a planted REAL inversion still flags after the
  * floor-awareness rule, floor noise does not, trial bimodality flags
  * from data, and a uniform code slowdown cannot scale its own drift
  * thresholds.
  */
class BenchGuardsSpec extends AnyFunSuite {

  test("splitTrials separates headline rows from t: rows by index") {
    val rows = Seq("x3_d3" -> 2.0, "t:x3_d3:2" -> 2.5, "t:x3_d3:1" -> 2.0,
      "x30_d3" -> 15.0, "t:x30_d3:1" -> 15.0)
    val (head, trials) = BenchGuards.splitTrials(rows)
    assert(head == Seq("x3_d3" -> 2.0, "x30_d3" -> 15.0))
    assert(trials("x3_d3") == Seq(2.0, 2.5))
    assert(trials("x30_d3") == Seq(15.0))
  }

  test("floor noise inversion is suppressed, a real inversion flags") {
    // ph1-shaped noise: both points under the floor → no flag
    val noise = BenchGuards.growth(Seq("x10_ph1" -> 0.978, "x100_ph1" -> 0.587))
    assert(BenchGuards.inversions(noise).isEmpty)
    // a real inversion: small factor 6s, large 2s → flags
    val real = BenchGuards.growth(Seq("x3_d3" -> 6.0, "x30_d3" -> 2.0))
    assert(BenchGuards.inversions(real).map(_._1) == Seq("d3"))
    // normal growth never flags
    val ok = BenchGuards.growth(Seq("x3_d3" -> 2.0, "x30_d3" -> 15.0))
    assert(BenchGuards.inversions(ok).isEmpty)
  }

  test("growth computes big/small ratio per family") {
    val g = BenchGuards.growth(Seq("x3_sa1" -> 2.0, "x30_sa1" -> 8.0,
      "x10_solo" -> 1.0))
    assert(g.map(x => (x._1, x._6)) == Seq(("sa1", 4.0)))
  }

  test("spread flags mode flips among WARM trials; JIT-slow first " +
      "trials and floor rows stay quiet") {
    val trials = Map(
      "x30_sa1" -> Seq(22.7, 4.8, 26.4),   // bimodal in warm trials → flag
      "x30_d3" -> Seq(28.9, 7.2, 7.4),     // slow FIRST trial only → quiet
      "x30_pd1" -> Seq(2.9, 2.6, 7.6),     // contention spike at t3 → flag
      "x30_ok" -> Seq(15.0, 16.1, 15.5),   // tight → quiet
      "x10_ph1" -> Seq(1.8, 0.9, 0.3))     // wide but warm-max under floor
    val f = BenchGuards.spreadFlags(trials)
    assert(f.map(_._1) == Seq("x30_pd1", "x30_sa1"))
    val sa1 = f.find(_._1 == "x30_sa1").get
    assert(sa1._2 == 4.8 && sa1._3 == 26.4)
  }

  test("drift comes from the floor cohort; a uniform code slowdown " +
      "cannot mask itself but raises drift_alert") {
    // 25 floor gates steady at 1.0×, 25 heavy gates uniformly 2× slower
    // (a real regression): floor-cohort drift stays 1.0 → the heavy
    // gates face unscaled thresholds; the all-gates median (1.0 here)
    // stays calm.
    val steadyFloor = (1 to 25).map(i => (0.2, 0.2))
    val slowHeavy = (1 to 25).map(i => (4.0, 2.0))
    assert(BenchGuards.drift(steadyFloor ++ slowHeavy) == 1.0)
    // r9's real shape: EVERYTHING ~1.2× (host) → drift 1.2
    val host = (1 to 40).map(i => (1.2 * (i % 5 + 1) * 0.1, (i % 5 + 1) * 0.1))
    val d = BenchGuards.drift(host)
    assert(d > 1.15 && d < 1.25)
    // uniform 2× on every gate incl. floor: drift clamps at 2.0 but the
    // alert fires so it cannot pass silently
    val uniform = (1 to 40).map(i => (2.0 * (i % 5 + 1) * 0.1, (i % 5 + 1) * 0.1))
    assert(BenchGuards.driftAlert(uniform))
    assert(!BenchGuards.driftAlert(host))
  }

  test("recall rows guard in the inverted direction: drops flag, " +
      "timing logic never sees them") {
    val snap = Map("x10_a3ivf_recall" -> 1.0, "x10_a3ivf_probe" -> 0.6)
    // a recall collapse flags as a drop...
    val drops = BenchGuards.recallDrops(
      Seq("x10_a3ivf_recall" -> 0.3, "x10_a3ivf_probe" -> 0.6), snap)
    assert(drops == Seq(("x10_a3ivf_recall", 1.0, 0.3)))
    // ...and never as a timing regression even if it rose (excluded)
    assert(BenchGuards.regressions(
      Seq("x10_a3ivf_recall" -> 2.0), snap, 1.0).isEmpty)
    // small jitter under 0.05 stays quiet
    assert(BenchGuards.recallDrops(
      Seq("x10_a3ivf_recall" -> 0.96), snap).isEmpty)
  }

  test("GATE timings named *_recall are timings, not quality rows " +
      "(r10 name-collision): they face the regression guard and never " +
      "reach recallDrops") {
    val snap = Map("dre1_dedup_recall" -> 0.843, "ar1_ann_recall" -> 0.4)
    // a timing IMPROVEMENT on a gate named *_recall is NOT a recall
    // drop (the BENCH_r10.json false alarm: 0.843 -> 0.683 s)
    assert(BenchGuards.recallDrops(
      Seq("dre1_dedup_recall" -> 0.683), snap).isEmpty)
    // a real 10x slowdown on such a gate MUST flag as a regression
    // (the r10 blind spot)
    val r = BenchGuards.regressions(
      Seq("dre1_dedup_recall" -> 8.4, "ar1_ann_recall" -> 0.41), snap, 1.0)
    assert(r.map(_._1) == Seq("dre1_dedup_recall"))
    // stress quality rows keep the inverted routing
    assert(BenchGuards.isQualityRow("x10_a3ivf_recall"))
    assert(BenchGuards.isQualityRow("x100_dre1_recall"))
    assert(!BenchGuards.isQualityRow("dre1_dedup_recall"))
    assert(!BenchGuards.isQualityRow("ar1_ann_recall"))
    assert(!BenchGuards.isQualityRow("x10_a3ivf_probe"))
  }

  test("regression guard flags 1.5x+0.3s growth, worst first, scaled by drift") {
    val snap = Map("a" -> 1.0, "b" -> 0.2, "c" -> 2.0)
    val now = Seq("a" -> 1.2, "b" -> 0.9, "c" -> 7.0)
    val r = BenchGuards.regressions(now, snap, drift = 1.0)
    assert(r.map(_._1) == Seq("b", "c"))
    // drift 2.0 absorbs the 3.5x c row? 7.0 > 2*1.5*2.0=6.0 → still flags
    val r2 = BenchGuards.regressions(now, snap, drift = 2.0)
    assert(r2.map(_._1) == Seq("b", "c"))
    // a mild 1.4x row never flags
    assert(BenchGuards.regressions(Seq("a" -> 1.4), snap, 1.0).isEmpty)
  }
}
