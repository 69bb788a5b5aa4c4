package graft

import org.apache.spark.sql.functions._

import graft.ann.VectorQc
import graft.text.Profiling

class VectorQcSpec extends SparkSpec {
  import spark.implicits._

  test("screen flags bad dims, NaNs, zero vectors; keeps the healthy") {
    val rows = Seq(
      (1L, Array(3.0f, 4.0f)),              // norm 5 -> keep
      (2L, Array(0.0f, 0.0f)),              // zero
      (3L, Array(Float.NaN, 1.0f)),         // nan
      (4L, Array(1.0f)))                    // bad_dim
      .toDF("id", "vec")
    val out = VectorQc.screen(rows, "id", "vec", expectedDim = 2)
      .select("vec_id", "dim", "n_nan", "norm_micro", "verdict")
      .as[(Long, Int, Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 2, 0, 5000000L, "keep"),
      (2L, 2, 0, 0L, "zero"),
      (3L, 2, 1, -1L, "nan"),
      (4L, 1, 0, 1000000L, "bad_dim")))
  }
}

class RetentionCutoffSpec extends SparkSpec {
  import spark.implicits._

  test("cutoff is the k-th highest score; ties at the cutoff keep") {
    // group a: scores 10,9,8,8,8,1 with n=6, 50% -> k=3, cutoff=8,
    // kept = 5 (the three 8s all survive). group b: n=2, k=1.
    val df = Seq(
      ("a", 10L, 1L), ("a", 9L, 2L), ("a", 8L, 3L), ("a", 8L, 4L),
      ("a", 8L, 5L), ("a", 1L, 6L),
      ("b", 7L, 7L), ("b", 3L, 8L))
      .toDF("g", "score", "id")
    val out = Profiling.retentionCutoffs(df, "g", "score", "id", 50)
      .select("g", "n_docs", "k_target", "cutoff", "n_kept")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("a", 6L, 3L, 8L, 5L), ("b", 2L, 1L, 7L, 1L)))
  }

  test("retaining 100 percent keeps everything") {
    val df = (1L to 9L).map(i => ("g", i, i)).toDF("g", "score", "id")
    val out = Profiling.retentionCutoffs(df, "g", "score", "id", 100)
      .select("n_docs", "k_target", "cutoff", "n_kept")
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((9L, 9L, 1L, 9L)))
  }
}
