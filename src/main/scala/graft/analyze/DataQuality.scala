package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (Deequ lineage) — the
  * guardrail stage a production pipeline runs before promoting a batch:
  * every constraint yields a violation COUNT, the pipeline gates on
  * all-zeros, and non-zero counts point at the offending rule rather
  * than a downstream mystery.
  *
  * Each helper returns the VIOLATING rows as a DataFrame (inspectable
  * on failure); `summarize` folds any number of named checks into one
  * (check, violations) table. Scale: every check is a single scan,
  * aggregation, or anti-join over the checked table — no collects, no
  * windows; the summary unions K scalar aggregates.
  */
object DataQuality {

  /** Rows whose key occurs more than once (all copies returned). */
  def duplicateKeys(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val dups = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
      .drop("_n")
    df.join(dups, keyCols)
  }

  /** FK rows with no matching dimension row (orphans). */
  def orphans(fact: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String): DataFrame =
    fact.join(dim.select(col(pkCol).as(fkCol)).distinct(),
      Seq(fkCol), "left_anti")

  /** Rows where `c` is null. */
  def nulls(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  /** Rows violating an arbitrary row-level predicate (pass the
    * EXPECTED invariant; violations are its negation or null).
    */
  def violating(df: DataFrame, invariant: Column): DataFrame =
    df.filter(!coalesce(invariant, lit(false)))

  /** One row per named check: (check, violations). */
  def summarize(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, viol) =>
      viol.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("check"), col("violations"))
    }.reduce(_ unionByName _)
}
