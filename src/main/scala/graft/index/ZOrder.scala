package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional data layout.
  *
  * The persisted index stores ([[IndexStore]], the IVF cluster layout in
  * `graft.ann.IvfDisk`) already partition-prune on ONE key. Z-ordering
  * is the standard lakehouse technique for making parquet min/max
  * statistics selective on TWO correlated filter dimensions at once
  * (e.g. `lang` × document length, or time × source): interleave the
  * bits of both keys into one Morton code, cluster files by that code,
  * and a scan filtering EITHER dimension skips most files. At 100 TB
  * this is a pure write-side transform — one shuffle at layout time,
  * zero cost at read time — and it composes with the existing pruned
  * scans.
  *
  * Determinism: the Morton code is exact integer bit arithmetic
  * (mirrored verbatim in SQL); fixed-width bucket assignment
  * (`zvalue · buckets div 2^(2·bits)`) avoids sampling-based range
  * boundaries so the bucket ids are reproducible anywhere. The
  * file-writer variant uses `repartitionByRange` (boundaries sampled,
  * but inter-file ordering and therefore min/max disjointness is
  * guaranteed) — spec-checked, not oracled.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of x (even positions) and y
    * (odd positions). Inputs must be non-negative and < 2^bits.
    */
  def interleave2(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { k =>
      shiftright(x, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k)) +
        shiftright(y, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1))
    }.reduce(_ + _)

  /** Attach `zvalue` (Morton code of xCol, yCol masked to `bits` bits)
    * and `zbucket` (fixed-width bucket over the code space).
    */
  def withZOrder(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 10, buckets: Int = 16): DataFrame = {
    val mask = (1L << bits) - 1
    val z = interleave2(col(xCol).bitwiseAND(lit(mask)),
      col(yCol).bitwiseAND(lit(mask)), bits)
    df.withColumn("zvalue", z)
      .withColumn("zbucket",
        expr(s"(zvalue * $buckets) div ${1L << (2 * bits)}").cast("int"))
  }

  /** Write `df` clustered by the Morton code: range-partitioned into
    * `files` output files, sorted within each, so every file carries a
    * disjoint zvalue interval (tight parquet min/max on BOTH source
    * columns).
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String,
      yCol: String, bits: Int = 10, files: Int = 8): Unit =
    withZOrder(df, xCol, yCol, bits, buckets = files)
      .repartitionByRange(files, col("zvalue"))
      .sortWithinPartitions(col("zvalue"))
      .write.mode("overwrite").parquet(path)
}
