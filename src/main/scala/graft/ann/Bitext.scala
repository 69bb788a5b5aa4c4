package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining (Artetxe & Schwenk 2019,
  * "Margin-based Parallel Corpus Mining with Multilingual Sentence
  * Embeddings", arXiv:1811.01136): score a candidate cross-set pair
  * (x, y) not by raw cosine but by the RATIO of cos(x, y) to the mean
  * of each side's k-NN cosines — the normalization that cancels hubness
  * (a y close to everything scores high cosine against every x; its
  * margin stays ~1). The standard miner for aligning translation pairs,
  * near-duplicate doc pairs across sources, or query↔doc pairs before
  * training data export.
  *
  * Determinism: cosines come from the portable float fold
  * ([[graft.functions.VectorFunctions]], bit-identical in the oracle);
  * each cosine is quantized to integer micro-units BEFORE any sum, so
  * the k-NN denominators are order-free integer sums and the margin is
  * one integer division — ratio(x,y) · 10^6 exactly, engine-portable.
  * The ratio uses SHIFTED cosines (cos + 1 ∈ [0, 2]): every term is
  * positive, so truncating and flooring integer division agree across
  * engines, and the hub-cancelling ratio semantics are preserved (a
  * monotone per-(x,y-denominator) transform of the paper's margin).
  *
  * Scale shape: candidates come from the forward top-k only (never
  * all-pairs); the backward denominators are computed ONLY for the
  * bounded candidate target set (≤ |X|·k ids). The gate exercises the
  * brute-force scorer; at corpus scale both k-NN passes swap in the
  * IVF/LSH index ([[Ivf]], [[Knn.hyperplaneBucketTopK]]) — the margin
  * arithmetic is identical either way.
  */
object Bitext {

  val Micro = 1000000L

  private def micro(simCol: String) =
    round(col(simCol) * Micro, 0).cast("long")

  /** Margin-scored candidate pairs from source set X to target set Y.
    * x: (xid, vec); y: (yid, vec); ids must be disjoint. Output:
    * (xid, yid, cos_micro, margin_ppm) for the forward top-k candidate
    * pairs, with s = cos_micro + 10^6 (the shift) and
    * margin_ppm = 2k·s·10^6 div (Σ topk s_x + Σ topk s_y).
    */
  def marginPairs(x: DataFrame, y: DataFrame, k: Int): DataFrame = {
    val xq = x.select(col("xid").as("qid"), col("vec").as("qvec"))
    val fwd = Knn.bruteForceTopK(y, "yid", "vec", xq, "qid", "qvec", k)
      .withColumn("cos_micro", micro("sim"))
      .select(col("qid").as("xid"), col("id").as("yid"), col("cos_micro"))
    val fwdC = fwd.cache() // feeds candidates, denomX, and the y probe set
    val denomX = fwdC.groupBy(col("xid"))
      .agg(sum(col("cos_micro") + Micro).as("dx"))
    val yProbe = fwdC.select(col("yid")).distinct()
      .join(y, Seq("yid"))
      .select(col("yid").as("qid"), col("vec").as("qvec"))
    val bwd = Knn.bruteForceTopK(x, "xid", "vec", yProbe, "qid", "qvec", k)
      .withColumn("cos_micro", micro("sim"))
    val denomY = bwd.groupBy(col("qid").as("yid"))
      .agg(sum(col("cos_micro") + Micro).as("dy"))
    fwdC
      .join(denomX, Seq("xid"))
      .join(denomY, Seq("yid"))
      .select(col("xid"), col("yid"), col("cos_micro"),
        expr(s"((cos_micro + $Micro) * ${2 * k} * $Micro) div (dx + dy)")
          .as("margin_ppm"))
  }
}
