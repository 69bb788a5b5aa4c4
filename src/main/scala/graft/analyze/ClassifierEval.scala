package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.Sampling

/** Exact binary-classifier evaluation at corpus scale: the ROC curve
  * over distinct score thresholds and the exact AUC via the
  * tie-averaged Mann-Whitney rank-sum — how a quality classifier
  * (ql1/lr1) gets measured before it gates a corpus.
  *
  * Distributed shape: scores collapse to ONE row per distinct value
  * (bounded by score precision, not corpus size), the global cumulative
  * counts come from the shared two-pass prefix sum (never a
  * single-partition window), and totals/rank-sums are scalar aggregates
  * broadcast back. All rank arithmetic is 64-bit integer (doubled ranks
  * make tie-averages integral); AUC divides once at the end:
  * AUC = (2·Σ R_pos − P(P+1)) / (2PN).
  */
object ClassifierEval {

  /** Per-distinct-score ROC rows (ascending score) with the global AUC
    * on every row: (score, n, n_pos, tpr, fpr, auc). `tpr`/`fpr` are
    * the rates of predicting positive at threshold "score ≥ this row".
    */
  def rocAuc(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"))
    val withCumN = Sampling
      .globalRunningSum(g, Seq(col("score").asc), "n")
      .withColumnRenamed("cum", "cum_n")
    val withCums = Sampling
      .globalRunningSum(withCumN, Seq(col("score").asc), "n_pos")
      .withColumnRenamed("cum", "cum_pos")
      // doubled tie-averaged rank of this score group times its
      // positive count — integral, order-free
      .withColumn("_r2c",
        col("n_pos") * (lit(2) * (col("cum_n") - col("n")) + col("n") + 1))
    val totals = withCums.agg(
      sum(col("n")).as("_nn"),
      sum(col("n_pos")).as("_pp"),
      sum(col("_r2c")).as("_r2"))
    withCums.crossJoin(broadcast(totals))
      .withColumn("_neg", col("_nn") - col("_pp"))
      .select(
        col("score"), col("n"), col("n_pos"),
        round((col("_pp") - (col("cum_pos") - col("n_pos"))) /
          col("_pp").cast("double"), 6).as("tpr"),
        round((col("_neg") - ((col("cum_n") - col("cum_pos")) -
          (col("n") - col("n_pos")))) / col("_neg").cast("double"), 6)
          .as("fpr"),
        // fail FAST on a single-class eval frame instead of silently
        // emitting null/NaN rates that round() would propagate into a
        // green-looking gate: the guard rides the auc expression (so
        // column pruning can't drop it) and raises at execution time
        round(when(col("_pp") > 0 && col("_neg") > 0,
            (col("_r2") - col("_pp") * (col("_pp") + 1)) /
              (lit(2.0) * col("_pp") * col("_neg")))
          .otherwise(raise_error(concat(
            lit("rocAuc: both classes required, got n_pos="),
            col("_pp").cast("string"), lit(" n_neg="),
            col("_neg").cast("string")))), 6).as("auc"))
  }

  /** Reliability diagram + expected calibration error: scores in [0,1]
    * fall into `bins` fixed-width bins; each bin reports observed
    * positive rate vs mean predicted score, and every row carries the
    * n-weighted ECE — the number that says whether the quality
    * classifier's scores can be used as probabilities (thresholding
    * and importance-weighting both assume they can).
    *
    * Determinism: per-bin counts are integers; scores are quantized to
    * micro-units before summing (order-free); pos_rate / avg_score are
    * single divisions of integers; the per-bin |gap| re-quantizes so
    * the ECE numerator Σ n·gap_micro is again an exact integer sum.
    *
    * Scale: one map-side-combinable groupBy on the bin id (≤ `bins`
    * groups), one broadcast of the 1-row totals. Runs at scan speed
    * next to the scoring pass.
    */
  def calibration(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    val per = scored
      .select(
        least(floor(col(scoreCol) * bins).cast("int"), lit(bins - 1))
          .as("bin"),
        col(labelCol).cast("long").as("y"),
        round(col(scoreCol) * 1e6).cast("long").as("sm"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        sum(col("sm")).as("ssum"))
      .withColumn("pos_rate", col("n_pos").cast("double") / col("n"))
      .withColumn("avg_score",
        col("ssum").cast("double") / col("n") / 1e6)
      .withColumn("gap_micro",
        round(abs(col("pos_rate") - col("avg_score")) * 1e6).cast("long"))
    val tot = per.agg(sum(col("n")).as("nn"),
      sum(col("n") * col("gap_micro")).as("gsum"))
    per.crossJoin(broadcast(tot))
      .select(col("bin"), col("n").cast("long").as("n"),
        col("n_pos").cast("long").as("n_pos"),
        round(col("pos_rate"), 6).as("pos_rate"),
        round(col("avg_score"), 6).as("avg_score"),
        round(col("gsum").cast("double") / col("nn") / 1e6, 6).as("ece"))
  }
}
