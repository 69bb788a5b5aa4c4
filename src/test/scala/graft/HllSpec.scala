package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.sketch.Hll

class HllSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, prefix: String = "k") =
    (0 until n).map(i => s"$prefix$i").toDF("k")

  test("registers match a driver-side mirror of idx/rho") {
    val df = keys(200)
    val got = Hll.registers(df, "k", p = 6)
      .as[(Int, Int)].collect().toMap
    val expected = (0 until 200).map { i =>
      val h = PortableHash.hash60Local("0", s"k$i")
      val idx = (h % 64).toInt
      val w = h >> 6
      val rho = if (w == 0) 55 else 54 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      (idx, rho)
    }.groupBy(_._1).map { case (i, rs) => (i, rs.map(_._2).max) }
    assert(got == expected)
  }

  test("duplicates cannot move a register") {
    val once = Hll.denseRegisters(keys(500), "k", 6).as[(Int, Int)].collect().toSet
    val thrice = Hll.denseRegisters(
      keys(500).unionAll(keys(500)).unionAll(keys(500)), "k", 6)
      .as[(Int, Int)].collect().toSet
    assert(once == thrice)
  }

  test("merge property: registers of a union = element-wise max") {
    val a = keys(400, "a")
    val b = keys(400, "b")
    val ra = Hll.denseRegisters(a, "k", 6).as[(Int, Int)].collect().toMap
    val rb = Hll.denseRegisters(b, "k", 6).as[(Int, Int)].collect().toMap
    val merged = Hll.denseRegisters(a.unionAll(b), "k", 6)
      .as[(Int, Int)].collect().toMap
    (0 until 64).foreach { i =>
      assert(merged(i) == math.max(ra(i), rb(i)), s"register $i")
    }
  }

  test("estimate within HLL error bounds (p=6 → ~13% typical)") {
    for (n <- Seq(100, 1000, 10000)) {
      val dense = Hll.denseRegisters(keys(n), "k", 6)
      val est = Hll.estimate(dense, 6).select("est_distinct")
        .head().getDouble(0)
      val err = math.abs(est - n) / n
      assert(err <= 0.35, s"n=$n est=$est err=$err")
    }
  }

  test("small-range correction engages when registers are sparse") {
    val dense = Hll.denseRegisters(keys(5), "k", 6)
    val row = Hll.estimate(dense, 6).head()
    val nZero = row.getAs[Long]("n_zero")
    assert(nZero > 0)
    val est = row.getAs[Double]("est_distinct")
    // linear counting: m ln(m/V) is exact-ish at tiny cardinalities
    assert(math.abs(est - 5) <= 2, s"est=$est")
  }
}
