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
        round((col("_r2") - col("_pp") * (col("_pp") + 1)) /
          (lit(2.0) * col("_pp") * col("_neg")), 6).as("auc"))
  }
}
