package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mutual-information feature ranking: MI(token-presence; label) over a
  * labeled corpus — the classic feature-selection step before training
  * a lexical quality/domain classifier ([[QualityClassifier]],
  * [[LogisticTrain]]): it names the tokens that carry signal, and a
  * sudden change in the top-MI list between snapshots is itself a
  * drift alarm.
  *
  * MI = Σ_{i,j∈{0,1}} (n_ij/N) · ln(N·n_ij / (n_i·n_j)) over the
  * presence × label contingency table, with 0·ln0 = 0.
  *
  * Determinism: all four cells derive from two integer counts per
  * token (docs containing it, positives containing it) plus the two
  * scalar totals; each cell's log-term is quantized to micro-nats and
  * weighted by the integer cell count, so the per-token MI numerator
  * is exact integer math. Ratios go through double BEFORE the product
  * with N (N·n_ij can overflow 64 bits at corpus scale; the double
  * ratio cannot).
  *
  * Scale: one distinct-token explode, one map-side-combinable groupBy
  * keyed on the token, a broadcast of the 1-row totals, and a top-k —
  * the vocabulary never broadcasts and nothing is all-pairs.
  */
object FeatureSelection {

  /** Top-k tokens by MI with the binary `labelCol`. Output: (t, n_t,
    * n_t1, mi_micro, mi) ordered mi desc then token.
    */
  def tokenLabelMi(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, topK: Int = 20): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"),
        col(labelCol).cast("long").as("y"),
        explode(array_distinct(TextFunctions.tokens(col(textCol))))
          .as("t"))
    val per = dt.groupBy(col("t"))
      .agg(count(lit(1)).as("n_t"), sum(col("y")).as("n_t1"))
    val tot = docs.agg(count(lit(1)).as("nn"),
      sum(col(labelCol).cast("long")).as("n1"))

    def cell(nij: org.apache.spark.sql.Column,
        ni: org.apache.spark.sql.Column,
        nj: org.apache.spark.sql.Column) =
      when(nij > 0,
        nij * floor(log((nij.cast("double") / ni) *
          (col("nn").cast("double") / nj)) * UnigramLm.MicroNats)
          .cast("long"))
        .otherwise(lit(0L))

    per.crossJoin(broadcast(tot))
      .withColumn("n10", col("n_t") - col("n_t1"))
      .withColumn("n01", col("n1") - col("n_t1"))
      .withColumn("n00", col("nn") - col("n_t") - col("n1") + col("n_t1"))
      .withColumn("mi_micro",
        cell(col("n_t1"), col("n_t"), col("n1")) +
          cell(col("n10"), col("n_t"), col("nn") - col("n1")) +
          cell(col("n01"), col("nn") - col("n_t"), col("n1")) +
          cell(col("n00"), col("nn") - col("n_t"), col("nn") - col("n1")))
      .select(col("t"), col("n_t"), col("n_t1"), col("mi_micro"),
        round(col("mi_micro").cast("double") / col("nn")
          / UnigramLm.MicroNats, 6).as("mi"))
      .orderBy(col("mi").desc, col("t"))
      .limit(topK)
  }
}
