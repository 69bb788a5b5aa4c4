package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.index.IndexStore

/** Additive schema evolution (`vectors_backend.py:182-215`): an old
  * (round-1) table remains readable and appendable after the reader's
  * StructType gained columns; type changes are rejected.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("evolve").toString + "/t"

  private val v3Schema = StructType(Seq(
    StructField("chunk_id", StringType),
    StructField("file_path", StringType),
    StructField("subproject_name", StringType),
    StructField("boost_factor", DoubleType)))

  test("round-1 table reads under the round-3 schema with typed nulls") {
    val path = tmp()
    Seq(("c1", "a.py"), ("c2", "b.py")).toDF("chunk_id", "file_path")
      .write.parquet(path)
    val out = IndexStore.readEvolved(spark, path, v3Schema)
    assert(out.columns.toSet ==
      Set("chunk_id", "file_path", "subproject_name", "boost_factor"))
    assert(out.schema("boost_factor").dataType == DoubleType)
    assert(out.filter(col("subproject_name").isNull).count() == 2)
    // stored columns beyond the target survive
    val out2 = IndexStore.readEvolved(spark, path,
      StructType(Seq(StructField("chunk_id", StringType))))
    assert(out2.columns.toSet == Set("chunk_id", "file_path"))
  }

  test("type changes are rejected, not silently cast") {
    val path = tmp()
    Seq(("c1", 3)).toDF("chunk_id", "score").write.parquet(path)
    val bad = StructType(Seq(StructField("score", StringType)))
    val e = intercept[IllegalArgumentException] {
      IndexStore.readEvolved(spark, path, bad)
    }
    assert(e.getMessage.contains("score"))
  }

  test("appendEvolved widens both sides to the union schema") {
    val path = tmp()
    Seq(("c1", "a.py")).toDF("chunk_id", "file_path").write.parquet(path)
    // round-3 writer has a new column; the stored table lacks it
    IndexStore.appendEvolved(spark,
      Seq(("c3", "c.py", "web")).toDF("chunk_id", "file_path", "subproject_name"),
      path)
    // an even newer writer misses a column the table now has
    IndexStore.appendEvolved(spark,
      Seq(("c4", "d.py")).toDF("chunk_id", "file_path"), path)
    val out = spark.read.parquet(path)
    assert(out.count() == 3)
    assert(out.filter(col("subproject_name") === "web").count() == 1)
    assert(out.filter(col("subproject_name").isNull).count() == 2)
  }
}
