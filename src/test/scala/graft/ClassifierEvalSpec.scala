package graft

import graft.analyze.ClassifierEval

class ClassifierEvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Int)]): Double =
    ClassifierEval.rocAuc(rows.toDF("score", "label"), "score", "label")
      .select("auc").as[Double].head()

  test("perfect separation gives AUC 1, inverted gives 0, random-ish 0.5") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
    assert(auc(perfect) === 1.0)
    assert(auc(perfect.map { case (s, l) => (s, 1 - l) }) === 0.0)
    val interleaved = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0))
    assert(auc(interleaved) === 0.75)
  }

  test("ties are averaged: all-equal scores give AUC 0.5 exactly") {
    assert(auc(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0))) === 0.5)
  }

  test("single-class input fails fast instead of emitting null rates") {
    Seq(Seq((0.9, 1), (0.1, 1)), Seq((0.9, 0), (0.1, 0))).foreach { rows =>
      val e = intercept[Exception] { auc(rows) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("both classes required")),
        s"unexpected failure: $e")
    }
  }

  test("ROC endpoints: lowest threshold has tpr=fpr=1") {
    val out = ClassifierEval.rocAuc(
        Seq((0.1, 0), (0.5, 1), (0.9, 1)).toDF("score", "label"),
        "score", "label")
      .orderBy("score")
      .select("tpr", "fpr").as[(Double, Double)].collect()
    assert(out.head === ((1.0, 1.0)))
  }

  test("AUC matches a brute-force pair count on a tied fixture") {
    val rows = Seq((0.3, 1), (0.3, 0), (0.7, 1), (0.1, 0), (0.9, 0),
      (0.7, 0), (0.2, 1))
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val brute = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum /
      (pos.size * neg.size)
    assert(math.abs(auc(rows) - brute) < 1e-6)
  }

  private def cal(rows: Seq[(Double, Int)], bins: Int = 10) =
    ClassifierEval.calibration(rows.toDF("score", "label"),
        "score", "label", bins)
      .select("bin", "n", "n_pos", "pos_rate", "avg_score", "ece")
      .as[(Int, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq

  test("perfectly calibrated scores give zero-gap bins and tiny ECE") {
    // bin 0.25: half positive; bin 0.75: three quarters positive
    val rows = Seq((0.25, 0), (0.25, 1), (0.25, 0), (0.25, 1),
      (0.75, 1), (0.75, 1), (0.75, 1), (0.75, 0))
    val got = cal(rows)
    assert(got.map(_._1) === Seq(2, 7))
    assert(got(0)._4 === 0.5 && got(0)._5 === 0.25)
    assert(got(1)._4 === 0.75 && got(1)._5 === 0.75)
    // bin 7's gap is 0; bin 2's gap 0.25 → ece = 0.25/2
    assert(got.head._6 === 0.125)
  }

  test("anti-calibrated scores show a large ECE; score 1.0 lands in the top bin") {
    val rows = Seq((1.0, 0), (1.0, 0), (0.05, 1), (0.05, 1))
    val got = cal(rows)
    assert(got.map(_._1) === Seq(0, 9))
    assert(got.head._6 === 0.975)
  }
}
