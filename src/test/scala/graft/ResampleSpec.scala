package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.{Mixing, Resample}

/** Resample: systematic-PPS multiplicities against a driver mirror,
  * the draw-count invariant, heavy-doc multi-draws, and partitioning
  * invariance.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def mirror(rows: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val ordered = rows.sortBy { case (id, _) =>
      ((id * Mixing.Mult + Mixing.Add) % Mixing.Modulus, id)
    }
    val total = rows.map(_._2).sum
    val step = math.max(total / k, 1L)
    val off = PortableHash.hash60Local("pps", "start") % step
    var cum = 0L
    ordered.map { case (id, w) =>
      val lo = cum; cum += w
      // points off + m*step inside [lo, cum-1]
      val cnt = ((cum - 1 - off + step) / step - (lo - off - 1 + step) / step).toInt
      id -> cnt
    }.toMap
  }

  private val rows: Seq[(Long, Long)] =
    (1L to 30L).map(i => (i, 1L + (i * 7) % 13))

  test("multiplicities match the driver mirror") {
    val out = Resample.ppsMultiplicity(
        rows.toDF("doc_id", "w"), "doc_id", "w", 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Int]("multiplicity")).toMap
    assert(out === mirror(rows, 10))
  }

  test("total draws land on k or k+1") {
    for (k <- Seq(3, 10, 17)) {
      val out = Resample.ppsMultiplicity(
          rows.toDF("doc_id", "w"), "doc_id", "w", k)
        .agg(sum(col("multiplicity"))).head().getLong(0)
      assert(out == k || out == k + 1, s"k=$k drew $out")
    }
  }

  test("a doc heavier than the step is drawn more than once") {
    val skew = Seq((1L, 1000L)) ++ (2L to 20L).map(i => (i, 1L))
    val out = Resample.ppsMultiplicity(
        skew.toDF("doc_id", "w"), "doc_id", "w", 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Int]("multiplicity")).toMap
    assert(out(1L) >= 9) // ~1000/1019 of the mass
    assert(out === mirror(skew, 10))
  }

  test("assignment is invariant to input partitioning") {
    val df = rows.toDF("doc_id", "w")
    val a = Resample.ppsMultiplicity(df.repartition(1), "doc_id", "w", 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum"), r.getAs[Int]("multiplicity"))).sortBy(_._1)
    val b = Resample.ppsMultiplicity(df.repartition(7, col("doc_id")),
        "doc_id", "w", 10)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum"), r.getAs[Int]("multiplicity"))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }
}
