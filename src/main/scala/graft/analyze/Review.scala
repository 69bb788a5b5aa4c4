package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Review-tool data plane (`mcp/review_handlers.py:602-730`): the
  * substantial-change classifier that gates the reference's LLM code
  * review — research-backed thresholds (>20 lines, >2 files), the
  * security-sensitive path patterns, and the structural-change diff
  * indicators. The LLM review itself is model-bound (same seam as Q10 /
  * the audit judge); everything before it is rule algebra.
  *
  * Batched: the reference classifies ONE staged change set per call;
  * here a whole table of change sets (one row per (change_id, file))
  * classifies in one plan — per-change aggregates, no driver loop.
  */
object Review {

  /** `_is_security_sensitive_file` — fnmatch `*pat*` ≡ substring. */
  val SensitivePatterns: Seq[String] = Seq(
    "auth", "login", "password", "security", "crypto", "database", "db",
    "sql", "query", "session", "validation", "sanitiz", "permission",
    "role")

  def securitySensitive(path: Column): Column =
    SensitivePatterns.map(p => lower(path).contains(p)).reduce(_ || _)

  /** `_has_structural_changes` added-line indicators. */
  val StructuralIndicators: Seq[String] = Seq(
    "+def ", "+class ", "+import ", "+from ", "+async def", "+@",
    "+interface", "+extends", "+function", "+const ", "+let ", "+var ")

  def structuralChange(diff: Column): Column =
    StructuralIndicators.map(i => diff.contains(i)).reduce(_ || _)

  /** Classify change sets: input one row per (change_id, file_path,
    * insertions, deletions, diff). Reference semantics
    * (`_analyze_staged_changes`): line counts come from the FULL diff
    * stats (pre-filter), the file count from the skip-filtered set
    * capped at `maxFiles` (capped in deterministic path order — the
    * Python cap inherits git's listing order), and the reason string
    * follows the precedence lines > files > security > structural.
    * Security/structural probes run only over the kept files.
    */
  def classifyChanges(changes: DataFrame, skipSuffixes: Seq[String],
      maxFiles: Int): DataFrame = {
    val skip = skipSuffixes.map(s => col("file_path").endsWith(s))
      .reduceOption(_ || _).getOrElse(lit(false))
    val w = Window.partitionBy(col("change_id")).orderBy(col("file_path"))
    val kept = changes.filter(!skip)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxFiles)
    val keptAgg = kept.groupBy(col("change_id")).agg(
      count(lit(1)).as("files_changed"),
      max(securitySensitive(col("file_path")).cast("int")).as("any_sec"),
      max(structuralChange(col("diff")).cast("int")).as("any_struct"))
    val lines = changes.groupBy(col("change_id")).agg(
      sum(col("insertions")).as("lines_added"),
      sum(col("deletions")).as("lines_deleted"))
    lines.join(keptAgg, Seq("change_id"), "left")
      .na.fill(0L, Seq("files_changed", "any_sec", "any_struct"))
      .withColumn("total_lines", col("lines_added") + col("lines_deleted"))
      .withColumn("is_substantial",
        col("total_lines") > 20 || col("files_changed") > 2 ||
          col("any_sec") === 1 || col("any_struct") === 1)
      .withColumn("reason",
        when(col("total_lines") > 20,
          concat(col("total_lines"), lit(" lines changed")))
          .when(col("files_changed") > 2,
            concat(col("files_changed"), lit(" files modified")))
          .when(col("any_sec") === 1, lit("security-sensitive files modified"))
          .when(col("any_struct") === 1, lit("structural changes detected"))
          .otherwise(concat(lit("only "), col("total_lines"),
            lit(" lines in "), col("files_changed"), lit(" files"))))
      .select(col("change_id"), col("is_substantial"), col("reason"),
        col("files_changed"), col("lines_added"), col("lines_deleted"),
        col("total_lines"))
  }
}
