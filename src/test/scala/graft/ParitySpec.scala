package graft

import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, VectorFunctions}

/** Bit-parity contracts that the oracle checks depend on. */
class ParitySpec extends SparkSpec {
  import spark.implicits._

  test("hash60Local matches the Column hash60 bit-for-bit") {
    val inputs = Seq(("0", "abc"), ("7", "the quick fox"), ("11", "x"),
      ("3_15", "plane"), ("42", "spark graft"))
    val fromCols = inputs.toDF("s", "v")
      .select(PortableHash.hash60(col("s"), col("v")).as("h"))
      .as[Long].collect().toSeq
    val local = inputs.map { case (s, v) => PortableHash.hash60Local(s, v) }
    assert(fromCols == local)
  }

  test("embedLocal matches the Column embed chain bit-for-bit") {
    val texts = Seq(
      "fast index scan", "merge sorted runs fast index",
      "table table table scan", // duplicate grams
      "x",                      // single token: no bigrams
      "Mixed CASE, punct!! (and) [brackets] :: obj->ptr",
      "a 1 2 3 numbers 42", "quick rapid catalog fast")
    val fromCols = graft.embed.HashEmbedder.embed(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text"), "id", "text")
      .as[(Long, Array[Float])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val local = graft.embed.HashEmbedder.embedLocal(t)
      val dist = fromCols(i.toLong)
      assert(dist.length == local.length, s"dim mismatch for '$t'")
      dist.zip(local).zipWithIndex.foreach { case ((a, b), k) =>
        assert(java.lang.Float.floatToIntBits(a) ==
          java.lang.Float.floatToIntBits(b), s"'$t' dim $k: $a vs $b")
      }
    }
  }

  test("FloatDot matches the HOF float fold bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val out = df.select(
      VectorFunctions.dotF(col("a"), col("b")).as("fast"),
      VectorFunctions.dotFHof(col("a"), col("b")).as("hof"))
      .as[(Float, Float)].collect()
    out.foreach { case (fast, hof) =>
      assert(java.lang.Float.floatToIntBits(fast) == java.lang.Float.floatToIntBits(hof))
    }
  }

  test("FloatDot null contract matches HOF (null element nullifies)") {
    val df = Seq((Seq[java.lang.Float](1.0f, null), Seq[java.lang.Float](2.0f, 3.0f)))
      .toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val fast = df.select(VectorFunctions.dotF(col("a"), col("b"))).collect().head
    val hof = df.select(VectorFunctions.dotFHof(col("a"), col("b"))).collect().head
    assert(fast.isNullAt(0) && hof.isNullAt(0))
  }
}
