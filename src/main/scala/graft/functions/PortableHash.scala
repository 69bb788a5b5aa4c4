package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded 60-bit hash computed identically by Spark and DuckDB.
  *
  * MinHash/SimHash/LSH need a deterministic hash both engines agree on
  * (Spark's `hash`/`xxhash64` and DuckDB's `hash` are different algorithms).
  * We use the low 60 bits of the little-endian interpretation of MD5 digest
  * bytes 8..15 — exactly DuckDB's `md5_number_lower(x) % 2^60` — rebuilt on
  * the Spark side from the md5 hex string with byte-pair swaps + `conv`.
  * 60 bits (not 64) so the value always fits a signed long, in both engines,
  * with no overflow edge cases.
  *
  * All-column-expression (no UDF): stays inside codegen'd projections, no
  * serialization, safe at 100 TB. If profiling shows the md5+substring chain
  * hot, swap in a custom Catalyst Expression with the same contract.
  */
object PortableHash {
  val Mask60: Long = (1L << 60) - 1

  /** hash60 with a literal seed. */
  def hash60(value: Column, seed: Int): Column = hash60(lit(seed), value)

  /** hash60 with a column seed: H(concat(seed, ':', value)). */
  def hash60(seed: Column, value: Column): Column = {
    val h = md5(concat(seed.cast("string"), lit(":"), value))
    // digest bytes 15..8 → little-endian hex string (16 chars),
    // drop the top nibble → 15 hex chars = low 60 bits.
    val le = concat((15 to 8 by -1).map(i => substring(h, 2 * i + 1, 2)): _*)
    conv(substring(le, 2, 15), 16, 10).cast("long")
  }

  /** DuckDB SQL computing the identical value. */
  def hash60Sql(seedExpr: String, valueExpr: String): String =
    s"CAST(md5_number_lower(concat(CAST($seedExpr AS VARCHAR), ':', $valueExpr)) " +
      s"% 1152921504606846976::UBIGINT AS BIGINT)"

  /** Driver-side Scala mirror of hash60 — for plan-time constants
    * (e.g. LSH hyperplanes) and tests. Must stay bit-identical to the
    * Column version.
    */
  def hash60Local(seed: String, value: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed:$value".getBytes("UTF-8"))
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v & Mask60
  }
}
