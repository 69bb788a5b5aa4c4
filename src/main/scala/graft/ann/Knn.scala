package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, VectorFunctions}

/** Approximate/exact nearest-neighbor search over an embedding column.
  *
  * - `bruteForceTopK`: exact cosine top-k. The query side is a handful of
  *   rows → broadcast; the corpus never shuffles; final top-k is a
  *   TakeOrdered (no global sort). This is the correctness oracle for
  *   every approximate variant (reference falls back to exact scan the
  *   same way, `core/vectors_backend.py:793-804`).
  * - `hyperplaneBucketTopK`: sign-LSH scale path — bucket corpus + query
  *   by the sign pattern of dot products with `nBits` pseudo-random
  *   hyperplanes (derived deterministically from the portable hash), probe
  *   matching buckets only. At 100 TB the corpus is written partitioned by
  *   bucket so a probe prunes partitions at the scan.
  * - IVF (KMeans centroid) variant lives in graft.ann.Ivf.
  */
object Knn {

  /** Exact top-k neighbors for each query row.
    * queries: (qid, qvec); corpus: (id, vec). Output: (qid, id, sim, rank).
    */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        VectorFunctions.norm2(col(vecCol)).as("n2"))
      .crossJoin(broadcast(
        queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"),
          VectorFunctions.norm2(col(qvecCol)).as("qn2"))))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", VectorFunctions.cosinePre(
        col("vec"), col("qvec"), col("n2"), col("qn2")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (bit, dim):
    * hash60 mapped to [-1, 1). Computed driver-side — the planes are
    * plan-time constants, so no per-row hashing.
    */
  def planeComponent(bit: Int, dim: Int): Double =
    PortableHash.hash60Local(s"${bit}_$dim", "plane").toDouble /
      (1L << 59).toDouble - 1.0

  /** Sign-LSH bucket id of a vector column (nBits-bit int). Plane vectors
    * are literal arrays; each bit costs one zip_with fold per row.
    */
  def signBucket(vec: Column, nBits: Int, dim: Int): Column = {
    val bits = (0 until nBits).map { b =>
      val plane = typedlit((0 until dim).map(i => planeComponent(b, i)))
      val dot = aggregate(
        zip_with(vec, plane, (x, p) => x.cast("double") * p),
        lit(0.0d), (acc, x) => acc + x)
      when(dot > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucketed ANN with multi-probe: the query also probes every bucket
    * at Hamming distance ≤ `probeRadius` from its own (flip each bit) —
    * the standard multi-probe LSH recall fix: a near neighbor on the
    * wrong side of ONE hyperplane is still found. probeRadius=0 is
    * single-bucket; radius 1 probes 1+nBits buckets (still prunes the
    * corpus to (1+nBits)/2^nBits on average).
    */
  def hyperplaneBucketTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nBits: Int, dim: Int = 64, probeRadius: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", signBucket(col("vec"), nBits, dim))
    val flips: Seq[Long] =
      if (probeRadius <= 0) Seq(0L)
      else 0L +: (0 until nBits).map(b => 1L << b)
    val q = queries.select(col(qidCol).as("qid"), col(qvecCol).as("qvec"))
      .withColumn("bucket0", signBucket(col("qvec"), nBits, dim))
      .withColumn("flip", explode(typedlit(flips)))
      .withColumn("bucket", col("flip").bitwiseXOR(col("bucket0")))
      .drop("bucket0", "flip")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", VectorFunctions.cosine(col("vec"), col("qvec")))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("sim"), col("rank"))
  }
}
