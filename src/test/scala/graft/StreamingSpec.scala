package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.util.Comparator

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.search.SearchEngine
import graft.streaming.WatchStream
import graft.streaming.WatchStream.FileEvent

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def withTempDir[T](f: Path => T): T = {
    val dir = Files.createTempDirectory("graft-stream")
    try f(dir)
    finally Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
  }

  test("debounce keeps only the last event per file") {
    val t = (m: Long) => new Timestamp(m)
    val batch = Seq(
      FileEvent("/a.py", "created", t(1000)),
      FileEvent("/a.py", "modified", t(2000)),
      FileEvent("/a.py", "deleted", t(3000)),
      FileEvent("/b.py", "created", t(1500))).toDF()
    val out = WatchStream.latestEventPerFile(batch).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("/a.py" -> "deleted", "/b.py" -> "created"))
  }

  test("event stream drives incremental reindex through foreachBatch") {
    withTempDir { dir =>
      implicit val sqlCtx = spark.sqlContext
      val repo = dir.resolve("repo"); Files.createDirectories(repo)
      val fileA = repo.resolve("a.py")
      val fileB = repo.resolve("b.py")
      Files.writeString(fileA, "def alpha():\n    return 1\n")
      Files.writeString(fileB, "def beta():\n    return 2\n")
      val chunksPath = dir.resolve("chunks").toString
      val vectorsPath = dir.resolve("vectors").toString
      new SearchEngine(spark).indexRepo(repo.toString, chunksPath, vectorsPath)

      val events = MemoryStream[FileEvent]
      val q = WatchStream.start(events.toDF(), chunksPath, vectorsPath,
        Trigger.ProcessingTime("100 milliseconds"))
      try {
        // modify a, delete b — with intermediate noise that debounce drops
        Files.writeString(fileA, "def alpha():\n    return 99\n")
        Files.delete(fileB)
        events.addData(
          FileEvent(fileA.toString, "modified", new Timestamp(1L)),
          FileEvent(fileB.toString, "modified", new Timestamp(2L)),
          FileEvent(fileB.toString, "deleted", new Timestamp(3L)))
        q.processAllAvailable()
      } finally q.stop()

      val after = spark.read.parquet(chunksPath).collect()
      val names = after.map(_.getAs[String]("name")).toSet
      assert(names == Set("alpha"))
      assert(after.head.getAs[String]("content").contains("99"))
      val vecs = spark.read.parquet(vectorsPath)
      assert(vecs.count() == 1)
    }
  }

  test("stale file count for search-triggered reindex") {
    withTempDir { dir =>
      val repo = dir.resolve("repo"); Files.createDirectories(repo)
      Files.writeString(repo.resolve("a.py"), "def alpha():\n    return 1\n")
      val chunksPath = dir.resolve("chunks").toString
      val vectorsPath = dir.resolve("vectors").toString
      new SearchEngine(spark).indexRepo(repo.toString, chunksPath, vectorsPath)
      assert(WatchStream.staleFileCount(spark, repo.toString, chunksPath) == 0)
      Files.writeString(repo.resolve("a.py"), "def alpha():\n    return 2\n")
      Files.writeString(repo.resolve("new.py"), "def nu():\n    return 3\n")
      assert(WatchStream.staleFileCount(spark, repo.toString, chunksPath) == 2)
    }
  }

  test("windowed event-rate aggregation with watermark (streamed parquet)") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
        "value DOUBLE, props STRING")
      .format("parquet")
      .option("pathGlobFilter", "events.parquet")
      .load("/root/testdata/sf0.001")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = WatchStream.eventRates(stream, "1 day", "1 day")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("rates").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT count(*) FROM rates").head().getLong(0)
      assert(rows > 0)
    } finally q.stop()
  }
}
