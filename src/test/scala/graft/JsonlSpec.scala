package graft

import java.nio.file.Files

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ingest.Jsonl

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("tolerant JSONL read splits parsed rows from quarantined lines") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("part.jsonl")
    Files.writeString(f,
      """{"doc_id": 1, "text": "alpha"}
        |{"doc_id": 2, "text": "beta"}
        |{"doc_id": }
        |this is not json at all
        |{"doc_id": 3, "text": "gamma"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (good, bad) = Jsonl.readTolerant(spark, f.toString, schema)
    val rows = good.as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    val quarantined = bad.as[String].collect().toSet
    // the original bytes of every broken line survive for the audit trail
    assert(quarantined == Set("{\"doc_id\": }", "this is not json at all"))
    Files.delete(f); Files.delete(dir)
  }
}
