package graft.embed

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-to-document embedding aggregation: mean-pool the chunk vectors
  * of each group into one document-level vector, the standard way a
  * training / retrieval pipeline derives doc embeddings before
  * doc-level ANN, clustering, or near-dup.
  *
  * Determinism contract: float sums are order-dependent, so each
  * component is quantized to integer micro-units FIRST and the
  * per-(group, dim) sum is exact 64-bit integer math — order-free
  * across partitions AND engines (the same trick as un1's micro-nat
  * sums). The mean is then one double division plus one float cast
  * from exact integers, so the pooled vector is bit-identical to the
  * DuckDB mirror.
  *
  * Scale shape (100 TB): ONE map-side-combinable aggregate keyed by
  * the group alone — `dim` per-component `sum` columns (the same
  * shape as the minhash signature aggregate: 64 aggregate columns, no
  * row explosion), so each input row contributes dim longs to its
  * partition-local partial and exactly one combined row per group
  * crosses the single Exchange. No posexplode (×dim row blow-up), no
  * second shuffle for re-assembly — the pooled array is built from
  * the aggregate columns in the same projection.
  */
object Pooling {

  /** Micro-units per float component (quantization step 1e-6). */
  val QuantScale = 1000000L

  /** One row per group: (grp, n_chunks, embedding float[dim]) where
    * embedding[i] = float(sum(floor(e_i * 1e6)) / (n_chunks * 1e6)).
    * `dim` is the fixed vector width.
    *
    * Ragged input fails LOUDLY at this operator's boundary (ADVICE
    * r9): components read through null-safe `get()` (no bare ANSI
    * INVALID_ARRAY_INDEX from inside the aggregate), a
    * `min(coalesce(size, -1))` rides the SAME aggregate (the coalesce
    * catches NULL vectors, which `min` alone would skip while
    * n_chunks counted the row), and the output projection asserts it —
    * so the per-row hot path stays one fused codegen stage (a per-row
    * pre-agg filter measured +70% on the x100 pooling stress) while a
    * short vector still fails the job with the operator and contract
    * named, never a silently skewed mean.
    */
  def meanPool(chunks: DataFrame, groupCol: String, vecCol: String,
      dim: Int): DataFrame = {
    val sumCols = (0 until dim).map { i =>
      sum(floor(get(col(vecCol), lit(i)).cast("double") * QuantScale)
        .cast("long")).as(s"s$i")
    } :+ min(coalesce(size(col(vecCol)), lit(-1))).as("_min_sz")
    chunks
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_chunks"), sumCols: _*)
      .filter(assert_true(col("_min_sz") >= dim,
        lit(s"meanPool: ragged embedding (size < dim=$dim) — " +
          "filter or fix widths upstream (VectorQc)")).isNull)
      .select(col("grp"), col("n_chunks"),
        array((0 until dim).map(i =>
          (col(s"s$i").cast("double") / (col("n_chunks") * QuantScale))
            .cast("float")): _*).as("embedding"))
  }

  /** DuckDB mirror of `meanPool` as a CTE chain ending in
    * `pooled(grp, n_chunks, embedding)`. `src` must provide (grp,
    * embedding); `dim` is the fixed vector width.
    */
  def meanPoolSql(src: String, dim: Int): String =
    s"""px AS (SELECT grp, CAST(i AS INTEGER) AS pos,
       |    embedding[CAST(i AS INTEGER) + 1] AS e
       |  FROM (SELECT grp, embedding, unnest(range(0, $dim)) AS i FROM $src)),
       |pq AS (SELECT grp, pos,
       |    CAST(sum(CAST(floor(CAST(e AS DOUBLE) * $QuantScale) AS BIGINT))
       |      AS BIGINT) AS sq,
       |    CAST(count(*) AS BIGINT) AS n_chunks
       |  FROM px GROUP BY grp, pos),
       |pooled AS (SELECT grp, n_chunks,
       |    list(CAST(CAST(sq AS DOUBLE) / (n_chunks * $QuantScale) AS FLOAT)
       |      ORDER BY pos) AS embedding
       |  FROM pq GROUP BY grp, n_chunks)""".stripMargin
}
