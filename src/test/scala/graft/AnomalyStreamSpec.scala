package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.AnomalyStream
import graft.streaming.AnomalyStream.SeriesPoint

class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit private def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  test("streamed z-scores equal the batch rollingZ over the same rows") {
    val rows = Seq(
      ("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 8L), ("a", 4L, 40L),
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L))
    val batch = graft.analyze.RollingStats
      .rollingZ(rows.toDF("key", "period", "value"), "key", "period",
        "value", 3, tieCol = "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap

    val in = MemoryStream[SeriesPoint]
    val q = AnomalyStream.scoreStream(in.toDS(), window = 3)
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      // split across micro-batches: state must carry the ring over
      in.addData(SeriesPoint("a", 1L, 10L), SeriesPoint("a", 2L, 12L),
        SeriesPoint("b", 1L, 5L))
      q.processAllAvailable()
      in.addData(SeriesPoint("a", 3L, 8L), SeriesPoint("a", 4L, 40L),
        SeriesPoint("b", 2L, 5L), SeriesPoint("b", 3L, 5L))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("anomaly_out").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(streamed == batch)
    assert(streamed(("a", 4L))._3 > 1.0) // the spike is flagged
  }

  test("ring state is bounded by the window") {
    val frame = Seq(1L, 2L, 3L)
    val s = AnomalyStream.score("k", 9L, 3L, frame)
    assert(s.win_n == 3L && s.mean == 2.0 && s.z == 1.0)
  }
}
