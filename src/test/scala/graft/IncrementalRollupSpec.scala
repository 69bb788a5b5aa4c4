package graft

import org.apache.spark.sql.functions._

import graft.util.IncrementalRollup

class IncrementalRollupSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val ms = Seq("v")

  private val base = Seq(
    ("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v")
  // delta mutates an existing key AND introduces a new one
  private val delta = Seq(
    ("a", 1L), ("c", 99L)).toDF("k", "v")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("merge of partials is bit-identical to the full recompute") {
    val merged = IncrementalRollup.merge(
      IncrementalRollup.rollup(base, keys, ms),
      IncrementalRollup.rollup(delta, keys, ms), keys, ms)
    val full = IncrementalRollup.rollup(base.unionByName(delta), keys, ms)
    assert(asMap(merged) == asMap(full))
    assert(asMap(merged)("a") == ((3L, 31L, 1L, 20L)))
    assert(asMap(merged)("c") == ((1L, 99L, 99L, 99L)))
  }

  test("non-integral measure columns fail fast (no silent truncating cast)") {
    val doubles = Seq(("a", 1.5), ("b", 2.25)).toDF("k", "v")
    val ex = intercept[IllegalArgumentException] {
      IncrementalRollup.rollup(doubles, keys, ms)
    }
    assert(ex.getMessage.contains("v:double"))
  }

  test("merging an empty delta is the identity") {
    val r = IncrementalRollup.rollup(base, keys, ms)
    val merged = IncrementalRollup.merge(r, r.limit(0), keys, ms)
    assert(asMap(merged) == asMap(r))
  }

  test("streamed foreachBatch maintenance equals the batch rollup") {
    // the continuous-warehouse flavor: each micro-batch folds into the
    // accumulated partials; after N batches the state must equal one
    // batch rollup over everything (same merge ≡ rebuild contract)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(String, Long)]
    var state = IncrementalRollup.rollup(base.limit(0), keys, ms)
      .localCheckpoint(true)
    val q = in.toDF().toDF("k", "v").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        state = IncrementalRollup.merge(state,
          IncrementalRollup.rollup(batch, keys, ms), keys, ms)
          .localCheckpoint(true)
        ()
      }.start()
    try {
      in.addData(("a", 10L), ("a", 20L), ("b", 5L))
      q.processAllAvailable()
      in.addData(("a", 1L), ("c", 99L))
      q.processAllAvailable()
    } finally q.stop()
    val full = IncrementalRollup.rollup(base.unionByName(delta), keys, ms)
    assert(asMap(state) == asMap(full))
  }
}
