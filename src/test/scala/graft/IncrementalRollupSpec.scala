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

  test("merging an empty delta is the identity") {
    val r = IncrementalRollup.rollup(base, keys, ms)
    val merged = IncrementalRollup.merge(r, r.limit(0), keys, ms)
    assert(asMap(merged) == asMap(r))
  }
}
