package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Every query in the engine takes `(SparkSession, sfDir)` and loads its
  * inputs through here so the scan is a plain parquet relation Catalyst can
  * push filters/projections into. Nothing is cached at this layer: at 100 TB
  * a table does not fit in memory, so operators must stream from the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader only surfaces as a nanos-since-epoch long
    * (`spark.sql.legacy.parquet.nanosAsLong`). Normalize to a micros
    * TimestampType column here (truncation, matching DuckDB's
    * `CAST(ts AS TIMESTAMP)` ns→us truncation) so downstream operators
    * see a real timestamp.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
