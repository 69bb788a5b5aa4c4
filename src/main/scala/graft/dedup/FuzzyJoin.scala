package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy entity resolution: match a dirty feed against a clean
  * reference by edit distance, with prefix blocking so the comparison
  * space is per-block, never all-pairs — the record-linkage analogue of
  * the MinHash banding used for document near-dups ([[Dedup]]), at the
  * string/entity granularity (catalog reconciliation, author/name
  * normalization, dirty-metadata joins before training-data export).
  *
  * Scale shape: candidates come from an equi-join on the block key
  * (hash-partitioned); `maxBlock` drops degenerate blocks (the empty-
  * prefix / stop-prefix skew guard, same policy as the blank-paragraph
  * key exemption in [[ParaDedup]]); best-match selection is one window
  * PARTITIONED by the dirty id. Edit distance is Spark's codegen'd
  * `levenshtein` — unit-cost classic DP, identical in the oracle
  * engine — so distances and verdicts are exact integers.
  */
object FuzzyJoin {

  /** Best fuzzy match per `right` row. left: (lid, name);
    * right: (rid, name). Output: (rid, lid, dist, n_cands) — the
    * lowest-distance left match (ties broken by lid), plus how many
    * candidates survived the threshold (an ER ambiguity signal).
    *
    * Dirty rows whose block was DROPPED by the `maxBlock` skew guard
    * get no output row here — indistinguishable from "no match within
    * maxDist". Callers that must tell the two apart use
    * [[blockedBestMatchFlagged]], which emits every dirty row with an
    * explicit `blocked` verdict; this shape keeps the match-only
    * output lean for the common pipeline case.
    *
    * Blocking key = first `blockLen` chars, plus the last `suffixLen`
    * chars when `suffixLen` > 0. Prefix-only blocking is right for
    * end-truncated dirt; prefix+suffix blocking — the standard
    * two-sided key — cuts block sizes by the suffix's cardinality and
    * is right for internal corruption (both ends survive an interior
    * edit). With short prefixes over a skewed name distribution,
    * prefix-only blocks grow with the corpus, so the suffix leg is the
    * scale lever (bench-measured: 17.7 s → sub-second on the er1 gate
    * at sf0.1).
    */
  def blockedBestMatch(left: DataFrame, right: DataFrame,
      blockLen: Int = 2, maxDist: Int = 2,
      maxBlock: Int = 100000, suffixLen: Int = 0): DataFrame = {
    def bk(name: org.apache.spark.sql.Column) =
      if (suffixLen > 0)
        concat(substring(name, 1, blockLen),
          substring(name, -suffixLen, suffixLen))
      else substring(name, 1, blockLen)
    val l = left.select(col("lid"), col("name").as("lname"),
      bk(col("name")).as("bk"))
    val blockSizes = l.groupBy(col("bk"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBlock)
      .select(col("bk"))
    val r = right.select(col("rid"), col("name").as("rname"),
      bk(col("name")).as("bk"))
    val cand = r
      .join(blockSizes, Seq("bk"), "left_semi")
      .join(l, Seq("bk"))
      .withColumn("dist", levenshtein(col("lname"), col("rname")))
      .filter(col("dist") <= maxDist)
    val byRid = Window.partitionBy(col("rid"))
    val best = Window.partitionBy(col("rid"))
      .orderBy(col("dist"), col("lid"))
    cand
      .withColumn("n_cands", count(lit(1)).over(byRid))
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("rid"), col("lid"), col("dist"),
        col("n_cands").cast("long").as("n_cands"))
  }

  /** [[blockedBestMatch]] with one row per DIRTY input row, so dropped
    * blocks are visible instead of silent: matched rows carry their
    * best match and `blocked = false`; rows whose block exceeded
    * `maxBlock` carry null lid/dist and `blocked = true`; rows whose
    * block survived but had no candidate within `maxDist` carry null
    * lid/dist and `blocked = false` (a genuine no-match). One extra
    * left join against the (already computed) block verdict + the
    * match result — both keyed joins, no new shuffles of the catalog.
    */
  def blockedBestMatchFlagged(left: DataFrame, right: DataFrame,
      blockLen: Int = 2, maxDist: Int = 2,
      maxBlock: Int = 100000, suffixLen: Int = 0): DataFrame = {
    def bk(name: org.apache.spark.sql.Column) =
      if (suffixLen > 0)
        concat(substring(name, 1, blockLen),
          substring(name, -suffixLen, suffixLen))
      else substring(name, 1, blockLen)
    val matches = blockedBestMatch(left, right, blockLen, maxDist,
      maxBlock, suffixLen)
    val oversize = left.select(bk(col("name")).as("bk"))
      .groupBy(col("bk")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBlock)
      .select(col("bk"), lit(true).as("blocked"))
    right.select(col("rid"), bk(col("name")).as("bk"))
      .join(oversize, Seq("bk"), "left")
      .withColumn("blocked", coalesce(col("blocked"), lit(false)))
      .join(matches, Seq("rid"), "left")
      .select(col("rid"), col("lid"), col("dist"),
        coalesce(col("n_cands"), lit(0L)).as("n_cands"), col("blocked"))
  }
}
