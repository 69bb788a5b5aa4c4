package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Count-min sketch over a key column — the fixed-memory frequency
  * sketch (Cormode & Muthukrishnan 2005) a 100 TB pipeline uses when
  * the exact per-key count table itself would be too large to hold:
  * heavy-hitter detection, frequency-capped sampling, join-skew
  * pre-detection.
  *
  * The sketch is `depth` rows of `width` counters; key k increments
  * counter (i, h_i(k) mod width) for each seed row i, and the
  * estimate is the MIN over rows — always an over-estimate, with
  * error ≤ total/width at probability 1 - 2^-depth. Both the build
  * and the probe are pure relational plans:
  *
  *   - build: one posexplode of the depth bucket ids per occurrence,
  *     then a map-side-combinable groupBy (depth × width rows out,
  *     CONSTANT in corpus size — that is the point of a sketch)
  *   - probe: the candidate relation re-derives its depth buckets and
  *     equi-joins the sketch (broadcast — it is tiny by construction),
  *     then min() per key
  *
  * Hashing is [[PortableHash]] so the DuckDB oracle rebuilds the
  * identical sketch bit-for-bit: collisions and over-estimates are
  * deterministic and REPRODUCED, not approximated, by the mirror.
  */
object CountMin {

  /** depth-row bucket array for a key: hash60(seed=i, key) % width. */
  private def bucketArr(key: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(i =>
      pmod(PortableHash.hash60(key, i), lit(width)).cast("int")): _*)

  /** (k, buckets) for each DISTINCT key — the md5-chain portable hash
    * runs once per vocabulary entry, not per occurrence; occurrence-
    * scale relations equi-join this back (AQE broadcasts it when the
    * vocabulary is small — the UnigramLm vocabulary-join shape).
    */
  private def keyBuckets(keys: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame =
    keys.select(col(keyCol).as("k")).distinct()
      .select(col("k"), bucketArr(col("k"), depth, width).as("_buckets"))

  /** Build the sketch: (row_id, bucket, cnt), depth×width max rows.
    *
    * `occurrences` is one row per key occurrence (pre-weighted input:
    * pass a `weight` column name to sum instead of count). Counter
    * increments are associative, so the occurrence relation is first
    * collapsed to per-key totals — ONE map-side-combined shuffle of the
    * occurrence rows; the md5-chain portable hash and the ×depth
    * explode then run at vocabulary scale, not occurrence scale.
    */
  def build(occurrences: DataFrame, keyCol: String, depth: Int, width: Int,
      weightCol: Option[String] = None): DataFrame =
    buildFromCounts(keyTotals(occurrences, keyCol, weightCol), depth, width)

  /** Per-key occurrence totals: (k, w) — the vocabulary-scale relation
    * both the sketch build and a heavy-hitter probe derive from.
    */
  private def keyTotals(occurrences: DataFrame, keyCol: String,
      weightCol: Option[String]): DataFrame = {
    val w = weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    occurrences.select(col(keyCol).as("k"), w.as("w"))
      .groupBy(col("k")).agg(sum(col("w")).as("w"))
  }

  /** Sketch from a pre-aggregated (k, w) relation. */
  private def buildFromCounts(keyCounts: DataFrame, depth: Int,
      width: Int): DataFrame =
    keyCounts
      .select(posexplode(bucketArr(col("k"), depth, width))
        .as(Seq("row_id", "bucket")), col("w"))
      .groupBy(col("row_id"), col("bucket"))
      .agg(sum(col("w")).as("cnt"))

  /** Estimate counts for `candidates` (one row per distinct key):
    * (key..., est) where est = min over sketch rows. The sketch side
    * is broadcast — depth×width rows regardless of corpus size.
    */
  def estimate(candidates: DataFrame, keyCol: String, sketch: DataFrame,
      depth: Int, width: Int): DataFrame = {
    val probed = keyBuckets(candidates, keyCol, depth, width)
      .select(col("k"), posexplode(col("_buckets"))
        .as(Seq("row_id", "bucket")))
    probed.join(broadcast(sketch), Seq("row_id", "bucket"))
      .groupBy(col("k"))
      .agg(min(col("cnt")).as("est"))
      .withColumnRenamed("k", keyCol)
  }

  /** Heavy hitters: estimated count ≥ threshold, top-k by (est desc,
    * key) — TakeOrderedAndProject, never a global window. The
    * candidate set is the distinct-key relation (vocabulary-scale); at
    * 100 TB one would feed a sampled candidate set instead, the probe
    * plan is identical.
    */
  def heavyHitters(occurrences: DataFrame, keyCol: String, depth: Int,
      width: Int, minEst: Long, k: Int): DataFrame = {
    // one occurrence-scale shuffle total: the cached vocab relation
    // feeds BOTH the sketch build and the candidate probe
    val totals = keyTotals(occurrences, keyCol, None).cache()
    val sketch = buildFromCounts(totals, depth, width)
    val cands = totals.select(col("k").as(keyCol))
    estimate(cands, keyCol, sketch, depth, width)
      .filter(col("est") >= minEst)
      .orderBy(col("est").desc, col(keyCol))
      .limit(k)
  }
}
