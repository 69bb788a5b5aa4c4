package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Johnson–Lindenstrauss random projection with ±1 entries (Achlioptas
  * 2003, "Database-friendly random projections"): `y_j = Σ_i s_ji·x_i /
  * √d'` with signs drawn from the portable hash — the cheap
  * dimensionality cut a 100 TB pipeline applies before clustering /
  * coarse ANN so downstream scans move d'/d of the bytes (8/64 here).
  * Distances are preserved to (1±ε) with ε ~ √(log n / d') — a coarse
  * preview space whose candidates are re-ranked exactly in the full
  * space, same two-stage contract as `ann/Quantize`.
  *
  * Determinism: the sign matrix is PLAN-TIME constant (hash60Local
  * parity — same seed, same matrix, forever), and each component is
  * the same sequential double fold as `Knn.signBucket`, so a DuckDB
  * left-associative chained sum reproduces every component bit for
  * bit (`sqrt` is IEEE-correctly-rounded in both engines).
  *
  * Scale: a stateless per-row projection — no shuffle, no state; the
  * d'×d literal matrix lives in the plan (512 doubles), not in a join.
  */
object RandomProjection {

  /** ±1 entry of the sign matrix at (output dim j, input dim i). */
  def entry(seed: String, j: Int, i: Int): Double =
    if ((PortableHash.hash60Local(seed, s"$j:$i") & 1L) == 0L) 1.0 else -1.0

  /** Projected vector (array of `outDim` doubles) of an array<float>
    * column.
    */
  def project(vec: Column, outDim: Int, inDim: Int, seed: String): Column =
    array((0 until outDim).map { j =>
      val plane = typedlit((0 until inDim).map(i => entry(seed, j, i)))
      aggregate(
        zip_with(vec, plane, (x, p) => x.cast("double") * p),
        lit(0.0d), (acc, x) => acc + x) / math.sqrt(outDim.toDouble)
    }: _*)

  /** DuckDB mirrors of each projected component (same fold order). */
  def projectSql(e: String, outDim: Int, inDim: Int, seed: String)
      : Seq[String] =
    (0 until outDim).map { j =>
      val dot = (0 until inDim).map { i =>
        s"(CAST($e[${i + 1}] AS DOUBLE) * ${entry(seed, j, i)})"
      }.mkString("(", " + ", ")")
      s"($dot / sqrt($outDim.0))"
    }

  /** Driver-side mirror of one component (tests). */
  def projectLocal(x: Seq[Float], outDim: Int, seed: String): Seq[Double] =
    (0 until outDim).map { j =>
      var acc = 0.0d
      var i = 0
      while (i < x.length) {
        acc += x(i).toDouble * entry(seed, j, i); i += 1
      }
      acc / math.sqrt(outDim.toDouble)
    }
}
