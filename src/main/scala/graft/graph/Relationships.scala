package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Knn
import graft.functions.VectorFunctions
import graft.index.IndexStore

/** Precomputed `related_chunks` table (`core/relationships.py:34-473`):
  * the reference computes, at INDEX time, each chunk's semantic top-N
  * (ANN search per chunk, limit 6 incl. self, search threshold 0.3,
  * link threshold 0.2, keep 5 — `:273-324`) and the caller relation
  * (chunks whose extracted calls contain a named chunk's name,
  * `:353-473`), so the visualizer starts instantly.
  *
  * Spark-first: the per-chunk ANN loop becomes ONE bucketed self-join —
  * sign-LSH buckets with multi-probe on the query side, cosine only
  * within candidate buckets, per-chunk top-k via a PARTITIONED window —
  * and the caller scan becomes an explode + equi-join on the already-
  * extracted `calls` arrays (the AST work happened at parse time).
  * Neither side broadcasts: both relations are corpus-scale, so the
  * bucket join shuffles on the band key and the name join on the name —
  * the banding keeps candidate pairs near-linear, never all-pairs.
  */
object Relationships {

  /** Directed semantic top-N per chunk over the vectors table
    * (`chunk_id`, embedding col). Mirrors the reference's thresholds:
    * candidates below `searchThreshold` never surface (database.search
    * threshold), surfaced links below `linkThreshold` are dropped
    * (subsumed by the former at default settings — kept for fidelity),
    * then top-`topN` by (sim desc, id asc).
    */
  def semanticLinks(vectors: DataFrame, idCol: String = "chunk_id",
      vecCol: String = "embedding", topN: Int = 5,
      searchThreshold: Double = 0.3, linkThreshold: Double = 0.2,
      nBits: Int = 4, dim: Int = 64): DataFrame = {
    val c = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", Knn.signBucket(col("vec"), nBits, dim))
    val flips: Seq[Long] = 0L +: (0 until nBits).map(b => 1L << b)
    val q = c.select(col("id").as("qid"), col("vec").as("qvec"),
        col("bucket").as("bucket0"))
      .withColumn("flip", explode(typedlit(flips)))
      .withColumn("bucket", col("flip").bitwiseXOR(col("bucket0")))
      .drop("bucket0", "flip")
    // corpus ⋈ corpus on bucket: shuffle join (NO broadcast — both sides
    // are corpus-scale), candidates only, exact cosine inside
    val scored = c.join(q, Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", VectorFunctions.cosine(col("vec"), col("qvec")))
      .filter(col("sim") >= searchThreshold)
      // multi-probe can surface one pair via several buckets — dedup
      // BEFORE ranking so a duplicate can't occupy two top-k slots
      .groupBy(col("qid"), col("id")).agg(max(col("sim")).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN && col("sim") >= linkThreshold)
      .select(col("qid").as("chunk_id"), col("id").as("related_id"),
        lit("semantic").as("kind"), col("sim").cast("double").as("score"))
  }

  /** Caller links: for every NAMED chunk (function/method/class —
    * `relationships.py:366-369`), the chunks whose `calls` array
    * mentions the name (`:392-443`; the AST call extraction is the
    * chunker's job here). One explode + equi-join on the name.
    */
  def callerLinks(chunks: DataFrame): DataFrame = {
    val named = chunks
      .filter(col("chunk_type").isin("function", "method", "class") &&
        col("name").isNotNull && col("name") =!= "")
      .select(col("chunk_id").as("callee_id"), col("name"))
    val callSites = chunks
      .select(col("chunk_id").as("caller_id"), explode(col("calls")).as("name"))
      .distinct()
    callSites.join(named, Seq("name"))
      .filter(col("caller_id") =!= col("callee_id"))
      .select(col("callee_id").as("chunk_id"), col("caller_id").as("related_id"),
        lit("caller").as("kind"), lit(1.0).as("score"))
  }

  /** The persisted artifact: semantic ∪ caller, written once per index
    * build (staging+swap like every index table).
    */
  def build(chunks: DataFrame, vectors: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    semanticLinks(vectors, vecCol = vecCol).unionByName(callerLinks(chunks))

  def write(spark: SparkSession, related: DataFrame, path: String): Unit =
    IndexStore.overwriteSafe(spark, related, path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
