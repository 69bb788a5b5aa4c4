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

  /** hash60 with a column seed: H(concat(seed, ':', value)), computed
    * by the native [[Md5Low60]] codegen expression (one digest per
    * call; the earlier md5-hex → substring×8 → conv chain allocated a
    * dozen objects per call and dominated shingle-scale plans).
    */
  def hash60(seed: Column, value: Column): Column = {
    GraftFunctions.ensure("graft_md5low60", exprs => Md5Low60(exprs.head))
    call_function("graft_md5low60",
      concat(seed.cast("string"), lit(":"), value))
  }

  /** DuckDB SQL computing the identical value. */
  def hash60Sql(seedExpr: String, valueExpr: String): String =
    s"CAST(md5_number_lower(concat(CAST($seedExpr AS VARCHAR), ':', $valueExpr)) " +
      s"% 1152921504606846976::UBIGINT AS BIGINT)"

  private[functions] val Mask53 = (1L << 53) - 1

  /** The local form of ONE rotate-xor combine step — the single source
    * of truth for the fold recipe; the Column ([[combine60]]), SQL
    * ([[windowHash60Sql]]) and native ([[TokenWindows.hashes]]) forms
    * must all stay bit-identical to this.
    */
  def combine60Local(h: Long, t: Long): Long =
    ((((h & Mask53) << 7) | (h >>> 53)) ^ t) & Mask60

  /** One order-sensitive combine step over ALREADY-hashed 60-bit
    * values: rotate-left-7 within 60 bits, then XOR the next hash in.
    * Pure bitwise arithmetic — no string materialization, no overflow
    * (safe under ANSI mode), identical in Spark and DuckDB. Used to
    * hash token n-gram windows WITHOUT building the gram string: the
    * per-window `concat_ws` + md5 build was an allocation-heavy codegen
    * stage with a bimodal GC-bound slow mode at stress scale (round-9
    * verdict: x30 spans 4.8 s fast mode / 22–27 s slow mode).
    */
  def combine60(h: Column, next: Column): Column =
    shiftleft(h.bitwiseAND(lit(Mask53)), 7)
      .bitwiseOR(shiftrightunsigned(h, 53))
      .bitwiseXOR(next)

  /** 60-bit hash of the n-element window of `hashes` starting at
    * 1-based `start`: rotate-xor fold over the pre-hashed elements.
    * With md5-uniform inputs the rot-7 multipliers (order 60, coprime)
    * keep windows order-sensitive and collision odds at the birthday
    * bound of 60 bits.
    */
  def windowHash60(hashes: Column, start: Column, n: Int): Column =
    (0 until n).foldLeft(lit(0L): Column)((h, j) =>
      combine60(h, element_at(hashes, start + j)))

  /** DuckDB SQL computing the identical window hash over a BIGINT list
    * expression and a 1-based start variable.
    */
  def windowHash60Sql(listExpr: String, startVar: String, n: Int): String =
    (0 until n).foldLeft("0::BIGINT")((h, j) =>
      s"xor(((($h) & $Mask53) << 7) | (($h) >> 53), " +
        s"$listExpr[$startVar+$j])")

  /** All n-token window hashes (seed "tok") of an array<string> column
    * in one native pass — [[TokenWindowHashes]], bit-identical to
    * `windowHash60(transform(toks, hash60("tok", _)), i, n)` for every
    * 1-based start i. The n is baked into the registered function name
    * so plans with different window sizes never cross-resolve.
    */
  def tokenWindowHashes(toks: Column, n: Int): Column = {
    val fn = s"graft_window_hashes_$n"
    GraftFunctions.ensure(fn, exprs => TokenWindowHashes(exprs.head, n))
    call_function(fn, toks)
  }

  /** Driver-side mirror of [[windowHash60]] for tests. */
  def windowHash60Local(hashes: Seq[Long]): Long =
    hashes.foldLeft(0L)(combine60Local)

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
