package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Codebase profiler → auto-optimization preset
  * (`core/codebase_profiler.py:17-340`): extension distribution, size
  * category by file count (<1k small, <10k medium, <50k large, else
  * enterprise), dominant-type detection (docs >30%, .py >60%, js-family
  * >60%, .java >60%, else mixed), and the per-size preset
  * (batch_size/parallel/code-only/cache). The reference samples the
  * first 1000 files to stay under 2 s on one core; a distributed count
  * needs no sampling — `profile` is exact at any size.
  */
object Profiler {

  val DocExts: Seq[String] = Seq(".md", ".txt", ".rst", ".adoc", ".org")
  val JsExts: Seq[String] = Seq(".js", ".ts", ".tsx", ".jsx")

  private def extOf(path: Column): Column =
    lower(regexp_extract(path, "(\\.[^./]+)$", 1))

  /** Per-extension profile rows with the global size/type/preset columns
    * attached: (ext, n_files, pct, size_category, codebase_type,
    * batch_size). One groupBy + one broadcast of a 1-row aggregate.
    */
  def profile(files: DataFrame, pathCol: String): DataFrame = {
    val counts = files.select(extOf(col(pathCol)).as("ext"))
      .groupBy(col("ext")).agg(count(lit(1)).as("n_files"))
    val stats = counts.agg(
      sum(col("n_files")).as("total_files"),
      sum(when(col("ext").isin(DocExts: _*), col("n_files")).otherwise(0L))
        .as("doc_files"),
      sum(when(col("ext") === ".py", col("n_files")).otherwise(0L))
        .as("py_files"),
      sum(when(col("ext").isin(JsExts: _*), col("n_files")).otherwise(0L))
        .as("js_files"),
      sum(when(col("ext") === ".java", col("n_files")).otherwise(0L))
        .as("java_files"))
    val sized = stats.select(
      col("total_files"),
      when(col("total_files") < 1000, "small")
        .when(col("total_files") < 10000, "medium")
        .when(col("total_files") < 50000, "large")
        .otherwise("enterprise").as("size_category"),
      when(col("doc_files") * 100.0 / col("total_files") > 30.0,
          "documentation")
        .when(col("py_files") * 100.0 / col("total_files") > 60.0, "python")
        .when(col("js_files") * 100.0 / col("total_files") > 60.0,
          "javascript")
        .when(col("java_files") * 100.0 / col("total_files") > 60.0, "java")
        .otherwise("mixed").as("codebase_type"))
      .withColumn("batch_size",
        when(col("size_category") === "small", 16)
          .when(col("size_category") === "medium", 32)
          .when(col("size_category") === "large", 64)
          .otherwise(128))
    counts.crossJoin(broadcast(sized))
      .select(col("ext"), col("n_files"),
        round(col("n_files") * 100.0 / col("total_files"), 1).as("pct"),
        col("size_category"), col("codebase_type"), col("batch_size"))
  }
}
