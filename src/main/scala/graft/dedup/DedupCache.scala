package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.Tables

/** Per-JVM registry of persisted MinHash-LSH dedup artifacts over the
  * documents table — shingles and banded signatures are corpus-derived
  * index state (indexing-time cost, paid once per corpus like the BM25
  * and IVF indexes), while near-dup queries pay only the band equi-join
  * and the candidate-routed Jaccard verify. On a cluster the two tables
  * would be bucketed by doc_id / (band, band_val) so the verify and
  * candidate joins co-locate without a shuffle.
  */
object DedupCache {
  final case class DedupIndex(shingles: DataFrame, bands: DataFrame)

  private val cache = scala.collection.concurrent.TrieMap[String, DedupIndex]()

  /** Build+persist once per (JVM, sfDir, params), then serve the on-disk
    * tables. The first call in a JVM always rebuilds (overwrite), so a
    * stale index from an earlier run is never served.
    */
  def persisted(spark: SparkSession, sfDir: String, shingleK: Int,
      numHashes: Int, rowsPerBand: Int): DedupIndex =
    cache.getOrElseUpdate(s"$sfDir|$shingleK|$numHashes|$rowsPerBand", {
      val path = s"target/dedup/${java.lang.Long.toHexString(
        graft.functions.PortableHash.hash60Local("dedup",
          s"$sfDir|$shingleK|$numHashes|$rowsPerBand"))}"
      val sh = Dedup.docShingles(
        Tables.documents(spark, sfDir), "text", "doc_id", shingleK)
      sh.write.mode("overwrite").parquet(s"$path/shingles")
      val shDisk = spark.read.parquet(s"$path/shingles")
      Dedup.lshBands(Dedup.minhashSignatures(shDisk, numHashes), rowsPerBand)
        .write.mode("overwrite").parquet(s"$path/bands")
      DedupIndex(shDisk, spark.read.parquet(s"$path/bands"))
    })
}
