package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engineer quality profiles (`cli/commands/analyze_engineers.py:24-268`):
  * blame-attribute each function to the author of its first line, count
  * severity-weighted quality issues, and score per engineer. The
  * reference shells out `git blame -L start,start` once PER FUNCTION and
  * loops files on one core; here attribution is one equi-join of the
  * function table against the blame relation, and everything downstream
  * is a pair of aggregations.
  *
  * Weights and thresholds mirror `EngineerProfile.quality_score`:
  * complexity>10 ×2, >20 ×5 (both fire for very-complex), length>50 ×1,
  * >100 ×3, nesting>4 ×2, params>5 ×1; score = max(0, 100 −
  * issues-per-kloc × 10) on blame-owned lines, 100 when no lines.
  */
object Engineers {

  /** functions: (chunk_id, file_path, start_line, complexity, func_len,
    * nesting, params); blame: (file_path, line, author); changes:
    * (commit_hash, author). Profiles keep authors with ≥ minCommits.
    */
  def profiles(functions: DataFrame, blame: DataFrame, changes: DataFrame,
      minCommits: Int = 1): DataFrame = {
    val base = changes.groupBy(col("author"))
      .agg(countDistinct(col("commit_hash")).as("n_commits"))
      .filter(col("n_commits") >= minCommits)
    val owned = blame.groupBy(col("author"))
      .agg(count(lit(1)).as("total_lines"))
    val attributed = functions.as("f")
      .join(blame.as("b"),
        col("f.file_path") === col("b.file_path") &&
          col("b.line") === col("f.start_line"))
      .select(col("b.author").as("author"), col("f.complexity"),
        col("f.func_len"), col("f.nesting"), col("f.params"))
    val fx = attributed.groupBy(col("author")).agg(
      count(lit(1)).as("n_functions"),
      sum(
        when(col("complexity") > 10, 2).otherwise(0) +
          when(col("complexity") > 20, 5).otherwise(0) +
          when(col("func_len") > 50, 1).otherwise(0) +
          when(col("func_len") > 100, 3).otherwise(0) +
          when(col("nesting") > 4, 2).otherwise(0) +
          when(col("params") > 5, 1).otherwise(0)).as("issues"),
      sum(col("complexity")).as("sum_cx"))
    base
      .join(owned, Seq("author"), "left")
      .join(fx, Seq("author"), "left")
      .select(
        col("author"), col("n_commits"),
        coalesce(col("total_lines"), lit(0L)).as("total_lines"),
        coalesce(col("n_functions"), lit(0L)).as("n_functions"),
        coalesce(col("issues"), lit(0L)).as("issues"),
        when(coalesce(col("n_functions"), lit(0L)) > 0,
          round(col("sum_cx").cast("double") / col("n_functions"), 1))
          .otherwise(lit(0.0)).as("avg_complexity"),
        when(coalesce(col("total_lines"), lit(0L)) === 0, lit(100.0))
          .otherwise(round(greatest(lit(0.0),
            lit(100.0) -
              coalesce(col("issues"), lit(0L)).cast("double")
                / col("total_lines") * 1000.0 * 10.0), 1))
          .as("quality_score"))
  }
}
