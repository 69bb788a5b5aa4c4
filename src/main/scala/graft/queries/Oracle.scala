package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers shared by every oracle-checked query.
  *
  * The driver hash-compares Spark output against a DuckDB run of the oracle
  * SQL. Double aggregation order differs between engines (and between Spark
  * runs), so any `sum(double)` is a hash hazard. The test data carries
  * 2-decimal money values, so we sum the exactly-representable integer
  * `round(x * 10^scale)` (order-independent, exact) and divide once at the
  * end. Both Spark and DuckDB round half-away-from-zero, and a scaled
  * 2-decimal value is never an exact .5 in binary, so the rounding agrees.
  *
  * At 100 TB the same pattern holds (long sums overflow only past ~9e18;
  * for wider data switch the accumulator to DecimalType — still exact).
  */
object Oracle {
  /** Order-independent exact sum of a fixed-decimal double column. */
  def moneySum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")) / f
  }

  /** Same, as DuckDB SQL text. */
  def moneySumSql(expr: String, scale: Int = 2): String = {
    val f = s"1e$scale"
    s"SUM(CAST(round(($expr) * $f) AS BIGINT)) / $f"
  }

  /** Order-independent exact average of a fixed-decimal double column. */
  def moneyAvg(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f).cast("long")) / f / count(c)
  }

  def moneyAvgSql(expr: String, scale: Int = 2): String = {
    val f = s"1e$scale"
    s"SUM(CAST(round(($expr) * $f) AS BIGINT)) / $f / COUNT($expr)"
  }
}
