package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.tables.Tables

/** Per-JVM registry of persisted MinHash-LSH dedup artifacts over the
  * documents table — shingles and banded signatures are corpus-derived
  * index state (indexing-time cost, paid once per corpus like the BM25
  * and IVF indexes), while near-dup queries pay only the band equi-join
  * and the candidate-routed Jaccard verify.
  *
  * Cluster-scale layout (and the local one — same code): the two tables
  * are BUCKETED by their probe-join keys — bands by (band, band_val), so
  * an ingest batch's band probe (`Dedup.incrementalNearDups`) reads the
  * corpus side pre-partitioned with zero Exchange (only the small batch
  * side shuffles to align), and shingles by doc_id, so the
  * candidate-routed Jaccard verify's two shingle joins read the
  * corpus-sized shingle table Exchange-free.
  */
object DedupCache {
  final case class DedupIndex(shingles: DataFrame, bands: DataFrame)

  private val cache = scala.collection.concurrent.TrieMap[String, DedupIndex]()

  /** Build+persist once per (JVM, sfDir, params), then serve the on-disk
    * bucketed tables. The first call in a JVM always rebuilds
    * (overwrite), so a stale index from an earlier run is never served.
    */
  def persisted(spark: SparkSession, sfDir: String, shingleK: Int,
      numHashes: Int, rowsPerBand: Int): DedupIndex =
    cache.getOrElseUpdate(s"$sfDir|$shingleK|$numHashes|$rowsPerBand", {
      val h = java.lang.Long.toHexString(
        graft.functions.PortableHash.hash60Local("dedup",
          s"$sfDir|$shingleK|$numHashes|$rowsPerBand"))
      // absolute path: a relative `path` option resolves against the
      // session warehouse dir, not the working dir
      val path = new java.io.File(s"target/dedup/$h").getAbsolutePath
      val buckets = 32
      val sh = Dedup.docShingles(
        Tables.documents(spark, sfDir), "text", "doc_id", shingleK)
      sh.repartition(buckets, col("doc_id"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "doc_id").sortBy("doc_id")
        .option("path", s"$path/shingles")
        .saveAsTable(s"dedup_${h}_shingles")
      val shDisk = spark.table(s"dedup_${h}_shingles")
      Dedup.lshBands(Dedup.minhashSignatures(shDisk, numHashes), rowsPerBand)
        .repartition(buckets, col("band"), col("band_val"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(buckets, "band", "band_val").sortBy("band", "band_val")
        .option("path", s"$path/bands")
        .saveAsTable(s"dedup_${h}_bands")
      DedupIndex(shDisk, spark.table(s"dedup_${h}_bands"))
    })
}
