package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Deterministic train/val/test split assignment for corpus assembly.
  *
  * Assignment is `hash60(seed, key) % buckets` cut by cumulative split
  * weights — a pure per-row projection: no shuffle, no global state,
  * stable under corpus growth (a document's split never changes when
  * other documents are added, unlike rank- or sample-based splits).
  *
  * Leakage safety: `keyCol` should be the GROUPING key that correlated
  * documents share — source domain, URL host, or the dup-cluster
  * representative from [[graft.dedup.Dedup.resolveClusters]] — so
  * near-duplicates land in the SAME split and never straddle the
  * train/eval boundary. Keying by doc id gives a plain iid split.
  *
  * Cross-engine exact: the bucket is [[PortableHash.hash60]] (≡ DuckDB
  * `md5_number_lower`), so the assignment — not just the proportions —
  * is bit-identical in the oracle.
  */
object Splits {

  /** The bucket column for a key: hash60(seed, key) % buckets. */
  def bucket(key: Column, buckets: Int, seed: Int): Column =
    PortableHash.hash60(key.cast("string"), seed) % buckets

  /** Input rows plus `split_bucket` and `split`. `splits` are
    * (name, weight) pairs in bucket units; weights must sum to
    * `buckets` so every bucket is owned by exactly one split.
    */
  def assign(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
      buckets: Int = 10000, seed: Int = 42): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == buckets,
      s"split weights must sum to $buckets")
    val b = bucket(col(keyCol), buckets, seed)
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val chain = splits.zip(cuts).dropRight(1)
      .foldLeft(None: Option[Column]) { case (acc, ((name, _), cut)) =>
        Some(acc.fold(when(b < cut, name))(_.when(b < cut, name)))
      }
    val split = chain.fold(lit(splits.head._1))(_.otherwise(splits.last._1))
    df.withColumn("split_bucket", b).withColumn("split", split)
  }

  /** DuckDB mirror of the `split` expression for `keyExpr`. */
  def assignSql(keyExpr: String, splits: Seq[(String, Int)],
      buckets: Int = 10000, seed: Int = 42): String = {
    val b = s"(${PortableHash.hash60Sql(seed.toString, s"CAST($keyExpr AS VARCHAR)")} % $buckets)"
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val whens = splits.zip(cuts).dropRight(1)
      .map { case ((name, _), cut) => s"WHEN $b < $cut THEN '$name'" }
      .mkString(" ")
    if (whens.isEmpty) s"'${splits.head._1}'"
    else s"CASE $whens ELSE '${splits.last._1}' END"
  }
}
