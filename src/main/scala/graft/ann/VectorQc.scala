package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-ANN embedding sanity screen — the hygiene pass a vector store
  * runs before any index build: dimension check, NaN components, zero
  * vectors, L2 norm. A single bad row poisons cosine ordering (NaN
  * compares unpredictably inside top-k heaps) and a zero vector makes
  * every similarity 0/undefined, so the screen runs at ingest, not at
  * query time. (The reference trusts its model output; at 100 TB with
  * heterogeneous producers that trust is a gate, not an assumption.)
  *
  * One codegen projection — no shuffle, no UDF. The squared-norm fold
  * is sequential over the array in BOTH engines, so norm_micro is
  * hash-comparable; NaN rows report norm_micro = -1 (a NaN never casts
  * to an integer in either engine).
  */
object VectorQc {

  def screen(vecs: DataFrame, idCol: String, vecCol: String,
      expectedDim: Int): DataFrame = {
    val v = col(vecCol)
    val sq = aggregate(v, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    vecs.select(col(idCol).as("vec_id"),
        size(v).as("dim"),
        size(filter(v, x => isnan(x))).as("n_nan"),
        sq.as("_sq"))
      .withColumn("norm_micro",
        when(col("n_nan") > 0, lit(-1L))
          .otherwise(round(sqrt(col("_sq")) * 1e6).cast("long")))
      .withColumn("verdict",
        when(col("dim") =!= expectedDim, "bad_dim")
          .when(col("n_nan") > 0, "nan")
          .when(col("norm_micro") === 0L, "zero")
          .otherwise("keep"))
      .drop("_sq")
  }
}
