package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-grouped training batches (the `group_by_length` trainer
  * option every large-scale fine-tuning stack ships): sort documents
  * by token length, cut into fixed-count batches, and measure the
  * padding waste `max_len·n_docs − Σ len` per batch — the quantity
  * length grouping exists to minimize (padding tokens are compute
  * burned on masked positions).
  *
  * Scale shape (100 TB): the global length order comes from the shared
  * two-pass prefix sum ([[Sampling.globalRunningSum]] — range
  * partition, per-partition window, broadcast offsets), never a
  * single-partition `Window.orderBy`; batch stats are one map-side
  * combinable aggregate keyed by batch_id. Deterministic under any
  * input partitioning: the order key is (n_tokens, doc_id) with the
  * unique id as tiebreak.
  */
object LengthBatches {

  /** Per-batch stats after length-sorted batching: (batch_id, n_docs,
    * max_len, sum_tokens, pad_waste), batch_id 0-based in length
    * order. The last batch may be short.
    */
  def lengthBatches(docs: DataFrame, idCol: String, lenCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val pos = Sampling.globalRunningSum(
      docs.select(col(idCol).as("doc_id"),
        col(lenCol).cast("int").as("n_tokens"))
        .withColumn("one", lit(1)),
      Seq(col("n_tokens").asc, col("doc_id").asc), "one")
    pos
      .withColumn("batch_id", expr(s"(cum - 1) div ${batchSize}L"))
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"))
      .withColumn("pad_waste",
        col("max_len").cast("long") * col("n_docs") - col("sum_tokens"))
  }
}
