package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.TextFunctions.tokens

/** Winnowing fingerprints (Schleimer, Wilkerson, Aiken — "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003): slide a
  * window of `w` consecutive k-gram hashes over each document and keep
  * the minimum hash per window (rightmost on ties). Guarantees every
  * match of length ≥ w+k-1 shares a selected fingerprint, while keeping
  * ~2/(w+1) of all gram hashes — the density/recall trade the rolling
  * sha-fingerprint (t5) cannot make. The reference's near-dup layer
  * stops at MinHash over distinct shingles; winnowing adds the
  * POSITIONAL fingerprint family used for plagiarism/clone detection.
  *
  * Tie-break without nested window functions: window aggregates cannot
  * reference another window's result per frame row, so "min hash, then
  * rightmost position" is encoded arithmetically into ONE key —
  * `h40 * 2^20 + (2^20-1-pos)` — whose frame MIN is exactly the
  * winnowing selection. 40-bit hash + 20-bit position = 60 bits, exact
  * in a signed long in both Spark and DuckDB (positions are bounded by
  * 2^20 grams per document — ~1M tokens; longer docs should be
  * pre-split, which the chunker already does upstream).
  *
  * 100 TB notes: one codegen projection per gram plus ONE window
  * partitioned by doc_id — no shuffle beyond the per-doc hash
  * partition, no cross-doc state. Selected fingerprints then feed the
  * usual banded equi-join (`Dedup`), never all-pairs.
  */
object Winnow {
  val PosBits = 20
  val PosCap: Long = 1L << PosBits
  val HashMod: Long = 1L << 40

  /** Positional k-grams: (doc_id, pos, gram), pos 0-based; docs with
    * fewer than k tokens drop (no winnowable window).
    */
  def positionalGrams(docs: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("toks")) - k),
          i => array_join(slice(col("toks"), i + 1, lit(k)), " "))))
      .withColumnRenamed("col", "gram")

  /** Winnowing selection: distinct (doc_id, pos, fp) where fp is the
    * 40-bit gram hash selected by some window of `w` consecutive grams.
    */
  def fingerprints(docs: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int): DataFrame = {
    require(w >= 1, "window must be >= 1")
    val grams = positionalGrams(docs, textCol, idCol, k)
      .withColumn("h40",
        PortableHash.hash60(lit("wn"), col("gram")) % HashMod)
      .withColumn("key",
        col("h40") * PosCap + (lit(PosCap - 1) - col("pos")))
    val frame = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    val part = Window.partitionBy("doc_id")
    grams
      .withColumn("sel_key", min(col("key")).over(frame))
      .withColumn("n_grams", count(lit(1)).over(part))
      // only full windows select (the winnowing guarantee needs w rows)
      .filter(col("pos") <= col("n_grams") - w)
      // decode with bit ops — a double division would lose precision
      // above 2^53 and corrupt the upper hash bits
      .select(col("doc_id"),
        (lit(PosCap - 1) - col("sel_key").bitwiseAND(lit(PosCap - 1)))
          .as("pos"),
        shiftright(col("sel_key"), PosBits).as("fp"))
      .distinct()
  }
}
