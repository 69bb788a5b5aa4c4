package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.tables.Tables

/** Per-JVM registry of persisted PQ indexes over the embeddings table —
  * same lifecycle as IvfCache: the codebook fit + encoded-codes write is
  * indexing-time cost paid once per corpus; queries open the at-rest
  * codes table (8× smaller than the float vectors) and pay only the ADC
  * scan + the k·refine exact rerank.
  */
object PqCache {
  final case class PqIndex(codes: DataFrame, vectors: DataFrame,
      cb: Pq.Codebook)

  private val cache = scala.collection.concurrent.TrieMap[String, PqIndex]()

  /** Codebook of the most recent fit in this JVM — the a6 oracle
    * generator interpolates these literals into its DuckDB mirror (the
    * fit isn't SQL-expressible; the fitted codebook is just data).
    */
  @volatile private var last: Option[Pq.Codebook] = None
  def lastCodebook: Option[Pq.Codebook] = last

  def persisted(spark: SparkSession, sfDir: String,
      m: Int = 8, ksub: Int = 16): PqIndex = {
    val idx = cache.getOrElseUpdate(sfDir, {
      val path = s"target/pq/${java.lang.Long.toHexString(
        graft.functions.PortableHash.hash60Local("pq", sfDir))}"
      val emb = Tables.embeddings(spark, sfDir)
      val cb = Pq.fit(emb, "embedding", m, ksub)
      // codes at rest: (id, codes) only — the float vectors stay in the
      // base table and are joined back just for the k·refine rerank
      Pq.encode(emb.select("vec_id", "embedding"), "embedding", cb)
        .select("vec_id", "codes")
        .write.mode("overwrite").parquet(path)
      PqIndex(spark.read.parquet(path),
        emb.select("vec_id", "embedding"), cb)
    })
    last = Some(idx.cb) // track the most recent fit, as documented
    idx
  }
}
