package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Tolerant JSONL corpus reading. At 100 TB some lines are always
  * broken — truncated uploads, encoding damage, concatenation seams —
  * and a FAILFAST read throws away the whole batch for one bad byte.
  * This splits the read into parsed rows and a quarantine of raw
  * malformed lines, so ingestion keeps its throughput AND an audit
  * trail (count the quarantine, alert on a ratio, reprocess later).
  */
object Jsonl {

  /** (good, quarantine): `good` has exactly `schema`'s columns;
    * `quarantine` is one `raw_line` string column with the original
    * bytes of every line that failed to parse. The parsed frame is
    * cached: Spark cannot filter on the corrupt-record column of a
    * streaming-parsed JSON scan without materializing it first, and
    * both outputs derive from one pass.
    */
  def readTolerant(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema must not already contain _corrupt")
    val withCorrupt = StructType(
      schema.fields :+ StructField("_corrupt", StringType, nullable = true))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .cache()
    (raw.filter(col("_corrupt").isNull).drop("_corrupt"),
      raw.filter(col("_corrupt").isNotNull)
        .select(col("_corrupt").as("raw_line")))
  }
}
