package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed chunks/vectors tables + the incremental set algebra
  * (SURVEY §2.1 S4-S7, §2.3 J3-J5, §1.3).
  *
  * The reference mutates rows in place (embedding_status state machine,
  * DELETE ... IN batches, UPDATE file_path on moves). Re-expressed here
  * as idempotent snapshot algebra over immutable tables: every "update"
  * is an anti-join + union + atomic overwrite of the affected partition
  * set. That is the only pattern that scales: at 100 TB there is no
  * row-level UPDATE, only partition rewrite, and every operation below
  * is a pure DataFrame → DataFrame function until the final write.
  */
object IndexStore {

  def write(df: DataFrame, path: String, partitions: Int = 0): Unit = {
    val out = if (partitions > 0) df.repartition(partitions) else df
    out.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Overwrite `path` with a plan that may READ from `path`: write to a
    * staging dir first, then swap. Depending on `.cache()` retention to
    * make read-and-overwrite safe is a race (the write job may recompute
    * a partition from the source being deleted); staging + rename makes
    * the update atomic-ish and self-consistent regardless of caching.
    */
  def overwriteSafe(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(path + "._staging")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    fs.delete(hp, true)
    fs.rename(staging, hp)
    spark.catalog.refreshByPath(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Additive schema evolution on read (`vectors_backend.py:182-215`
    * `_evolve_schema_if_needed`): columns in `target` missing from the
    * stored table are added as typed nulls; columns whose type CHANGED
    * are rejected (the reference only ever adds, never mutates);
    * existing columns beyond `target` are preserved. A round-1 table is
    * therefore readable by a round-3 reader without a rewrite.
    */
  def readEvolved(spark: SparkSession, path: String,
      target: org.apache.spark.sql.types.StructType): DataFrame = {
    val df = read(spark, path)
    val existing = df.schema.map(f => f.name -> f.dataType).toMap
    val conflicts = target.fields.flatMap { f =>
      existing.get(f.name).collect {
        case dt if dt != f.dataType => s"${f.name}: $dt -> ${f.dataType}"
      }
    }
    require(conflicts.isEmpty,
      s"schema evolution is additive-only; type changes rejected: ${conflicts.mkString(", ")}")
    target.fields.filterNot(f => existing.contains(f.name))
      .foldLeft(df)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))
  }

  /** Evolve-on-write: append `rows` to the table at `path`, widening
    * BOTH sides to the union schema with typed nulls (additive-only —
    * type changes rejected as in `readEvolved`). Missing table → plain
    * write.
    */
  def appendEvolved(spark: SparkSession, rows: DataFrame, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      rows.write.mode(SaveMode.Overwrite).parquet(path)
    } else {
      val stored = readEvolved(spark, path, rows.schema)
      val newCols = stored.columns.filterNot(rows.columns.contains)
      val widened = newCols.foldLeft(rows)((d, c) =>
        d.withColumn(c, lit(null).cast(stored.schema(c).dataType)))
      overwriteSafe(spark, stored.unionByName(widened), path)
    }
  }

  /** S4 compaction: rewrite a table into ~targetBytes files (the
    * reference compacts every ~20k appended rows,
    * `chunks_backend.py:553-605`; here it is one repartition rewrite,
    * to be scheduled after heavy append phases).
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val size = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val parts = math.max(1, (size / targetBytes).toInt)
    val df = spark.read.parquet(path).repartition(parts).cache()
    df.count()
    df.write.mode(SaveMode.Overwrite).parquet(path)
    df.unpersist()
  }

  /** Upsert semantics of `vectors_backend.py:482-677` (delete same ids,
    * then append) without the delete: keep stored rows whose key is not
    * in the incoming batch, union the batch.
    */
  def upsert(stored: DataFrame, incoming: DataFrame, key: String): DataFrame =
    stored.join(incoming.select(key).distinct(), Seq(key), "left_anti")
      .unionByName(incoming)

  /** Delete-by-file-set (`chunks_backend.py:943-1007`): one anti-join, no
    * IN-batching needed.
    */
  def deleteByFiles(stored: DataFrame, staleFiles: DataFrame): DataFrame =
    stored.join(staleFiles.select("file_path").distinct(), Seq("file_path"), "left_anti")

  /** Change detection (J4, `indexer.py:581-639`): disk files whose hash is
    * absent or different in the stored table. Output = disk rows to
    * (re)index.
    */
  def changedFiles(disk: DataFrame, stored: DataFrame): DataFrame = {
    // aggregate to ONE row per stored file (a duplicate would fan out the
    // disk row and double-chunk the file); a file with MIXED stored
    // hashes (torn partial update) always reindexes
    val storedHash = stored.groupBy(col("file_path")).agg(
      org.apache.spark.sql.functions.max(col("file_hash")).as("stored_hash"),
      countDistinct(col("file_hash")).as("n_hashes"))
    disk.join(storedHash, Seq("file_path"), "left")
      .filter(col("stored_hash").isNull || col("n_hashes") > 1 ||
        col("stored_hash") =!= col("file_hash"))
      .drop("stored_hash", "n_hashes")
  }

  /** Deleted files (stored paths no longer on disk). */
  def deletedFiles(disk: DataFrame, stored: DataFrame): DataFrame =
    stored.select("file_path").distinct()
      .join(disk.select("file_path").distinct(), Seq("file_path"), "left_anti")

  /** File-move detection (J5, `indexer.py:594-618`): a stored path that
    * vanished whose hash reappears at a new disk path. Output:
    * (old_path, new_path, file_hash) — apply as a metadata-only path
    * rewrite (S7), skipping re-embedding.
    */
  def movedFiles(disk: DataFrame, stored: DataFrame): DataFrame = {
    val gone = deletedFiles(disk, stored)
      .join(stored.select(col("file_path"), col("file_hash")).distinct(), Seq("file_path"))
      .select(col("file_path").as("old_path"), col("file_hash"))
    val fresh = changedFiles(disk, stored)
      .select(col("file_path").as("new_path"), col("file_hash"))
    gone.join(fresh, Seq("file_hash"))
      .select(col("old_path"), col("new_path"), col("file_hash"))
  }

  /** In-place path rewrite for moves (S7 semantics) as a column rewrite. */
  def applyMoves(stored: DataFrame, moves: DataFrame): DataFrame =
    stored
      .join(moves.select(col("old_path").as("file_path"), col("new_path")),
        Seq("file_path"), "left")
      .withColumn("file_path", coalesce(col("new_path"), col("file_path")))
      .drop("new_path")

  /** Unembedded chunks (J3, `vectors_backend.py:1355-1397`): in chunks
    * table but not in vectors table — this replaces the reference's
    * embedding_status state machine entirely.
    */
  def unembedded(chunks: DataFrame, vectors: DataFrame): DataFrame =
    chunks.join(vectors.select("chunk_id").distinct(), Seq("chunk_id"), "left_anti")
}
