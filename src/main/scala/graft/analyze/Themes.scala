package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.HashEmbedder
import graft.functions.VectorFunctions

/** A18 story theme clustering (`story/analyzer.py:146-233`): the
  * reference runs 10 sequential semantic searches — one per fixed theme
  * query — and builds a SemanticCluster per theme (top-10 at threshold
  * 0.4; files and snippets from the top-5; confidence from the average
  * score).
  *
  * Here all 10 theme queries embed driver-side into ONE broadcast table
  * and a single pass over the vectors scores every (theme, chunk) pair —
  * one job instead of 10, and the per-theme top-k is a theme-partitioned
  * window (every partition is a theme: no single-partition funnel).
  */
object Themes {

  /** `story/analyzer.py:155-166`, verbatim. */
  val ThemeQueries: Seq[String] = Seq(
    "error handling and validation",
    "data models and schemas",
    "API endpoints and routing",
    "database operations and queries",
    "authentication and authorization",
    "testing and test utilities",
    "configuration and settings",
    "logging and monitoring",
    "file I/O and data processing",
    "CLI and user interface")

  /** One row per theme: files (top-5 distinct, sorted), snippets, result
    * count, avg score, confidence bucket (HIGH > 0.7, MEDIUM > 0.5).
    */
  def codeThemes(spark: SparkSession, vectors: DataFrame,
      limit: Int = 10, threshold: Double = 0.4): DataFrame = {
    import spark.implicits._
    val qdf = ThemeQueries.zipWithIndex.map { case (q, i) => (i.toLong, q) }
      .toDF("qid", "theme")
    val qvecs = HashEmbedder.embed(qdf, "qid", "theme")
      .withColumnRenamed("vector", "qvec")
      .withColumnRenamed("id", "qid")
      .join(qdf, Seq("qid"))
      .select(col("theme"), col("qvec"))

    val w = Window.partitionBy(col("theme"))
      .orderBy(col("sim").desc, col("chunk_id"))
    val top = vectors
      .crossJoin(broadcast(qvecs))
      .withColumn("sim", VectorFunctions.cosine(col("vector"), col("qvec")))
      .filter(col("sim") >= threshold)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= limit)

    top.groupBy(col("theme"))
      .agg(
        sort_array(slice(array_distinct(collect_list(
          struct(col("rank"), col("file_path")))), 1, 5))
          .getField("file_path").as("ranked_files"),
        collect_list(when(col("rank") <= 5,
          concat(col("file_path"), lit(": "),
            substring(regexp_replace(col("content"), "\n", " "), 1, 100))))
          .as("code_snippets"),
        count(lit(1)).as("n_results"),
        avg(col("sim")).as("avg_score"))
      .withColumn("files", array_sort(array_distinct(col("ranked_files"))))
      .drop("ranked_files")
      .withColumn("confidence",
        when(col("avg_score") > 0.7, "HIGH")
          .when(col("avg_score") > 0.5, "MEDIUM")
          .otherwise("LOW"))
  }
}
