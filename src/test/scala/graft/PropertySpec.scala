package graft

import graft.dedup.Dedup
import graft.functions.PortableHash
import graft.index.Migrations

/** Property-style checks (seeded randomized sweeps — the offline cache
  * has no scalatest-scalacheck bridge) of the mathematical invariants
  * the fixture gates can't sweep exhaustively: the pigeonhole banding
  * guarantee (zero recall loss of d5's scale path), segment
  * well-formedness, hash ranges, and semver ordering. Driver-side math
  * only — fast.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xC0FFEE)

  private def segValues(x: Long, maxHamming: Int): Seq[Long] =
    Dedup.simhashSegmentDefs(maxHamming).map { case (_, sh, mask) =>
      (x >>> sh) & mask
    }

  test("pigeonhole: any pair within Hamming <= m shares a segment (no recall loss)") {
    (1 to 2000).foreach { _ =>
      val m = 1 + rnd.nextInt(8)
      val x = rnd.nextLong() & ((1L << 60) - 1)
      val bits = Seq.fill(rnd.nextInt(m + 1))(rnd.nextInt(60)).distinct
      val y = bits.foldLeft(x)((v, b) => v ^ (1L << b))
      assert(java.lang.Long.bitCount(x ^ y) <= m)
      val shared = segValues(x, m).zip(segValues(y, m)).exists(p => p._1 == p._2)
      assert(shared, s"x=$x y=$y m=$m must collide on >=1 segment")
    }
  }

  test("segments are disjoint and cover all 60 bits exactly") {
    (1 to 12).foreach { m =>
      val defs = Dedup.simhashSegmentDefs(m)
      assert(defs.length == m + 1)
      val totalBits = defs.map { case (_, _, mask) =>
        java.lang.Long.bitCount(mask)
      }.sum
      assert(totalBits == 60, s"m=$m covers $totalBits bits")
      // shifted masks must tile [0, 60) without overlap
      val full = defs.map { case (_, sh, mask) => mask << sh }
        .reduce { (a, b) => assert((a & b) == 0L, s"m=$m overlap"); a | b }
      assert(full == (1L << 60) - 1, s"m=$m does not tile 60 bits")
    }
  }

  test("hash60 stays in [0, 2^60) and is deterministic") {
    (1 to 500).foreach { _ =>
      val a = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val b = rnd.alphanumeric.take(rnd.nextInt(20)).mkString
      val h = PortableHash.hash60Local(a, b)
      assert(h >= 0L && h < (1L << 60))
      assert(h == PortableHash.hash60Local(a, b))
    }
  }

  test("quantize round-trip error is bounded by half a code step") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = (1 to 50).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 4f))
    }.toDF("id", "vec")
    val enc = graft.ann.Quantize.encode(vecs, "vec")
    val err = enc
      .withColumn("deq", graft.ann.Quantize.decode(
        col("codes"), col("qmin"), col("qscale")))
      .select(col("qscale"),
        aggregate(zip_with(col("vec"), col("deq"),
          (x, y) => abs(x.cast("double") - y.cast("double"))),
          lit(0.0), (a, x) => greatest(a, x)).as("max_err"))
      .collect()
    err.foreach { r =>
      val bound = r.getAs[Double]("qscale") / 255.0 / 2.0 + 1e-4
      assert(r.getAs[Double]("max_err") <= bound,
        s"err ${r.getAs[Double]("max_err")} > bound $bound")
    }
  }

  test("versionKey ordering is numeric per segment, not lexicographic") {
    import scala.math.Ordering.Implicits._
    (1 to 500).foreach { _ =>
      val a = List.fill(3)(rnd.nextInt(100))
      val b = List.fill(3)(rnd.nextInt(100))
      val cmp = Migrations.versionKey(a.mkString(".")) <
        Migrations.versionKey(b.mkString("."))
      assert(cmp == (a < b), s"$a vs $b")
    }
    // the classic lexicographic trap
    assert(Migrations.versionKey("0.10.0") > Migrations.versionKey("0.9.1"))
  }
}
