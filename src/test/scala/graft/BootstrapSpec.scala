package graft

import graft.analyze.Bootstrap

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 400L).map(i => (i, 100L + (i * 7) % 50))
    .toDF("id", "v")

  test("poisson weights average ~1 so replicate sizes hug n") {
    val got = Bootstrap.poissonMeanCi(rows, "id", "v", b = 20)
      .select("b", "n_eff").as[(Int, Long)].collect()
    assert(got.length === 20)
    // each replicate's effective size is within ±20% of n=400
    assert(got.forall(r => r._2 > 320 && r._2 < 480))
    // and they are not all identical (the hash varies by replicate)
    assert(got.map(_._2).distinct.length > 1)
  }

  test("the CI brackets the point estimate and is ordered") {
    val r = Bootstrap.poissonMeanCi(rows, "id", "v", b = 20)
      .select("point", "ci_lo", "ci_hi")
      .as[(Double, Double, Double)].head()
    assert(r._2 <= r._3)
    assert(r._2 <= r._1 + 2 && r._3 >= r._1 - 2)
    // means cluster near the true mean; interval is tight for n=400
    assert(math.abs(r._1 - rows.agg(org.apache.spark.sql.functions
      .avg("v")).as[Double].head()) < 1e-6)
  }

  test("replicates are deterministic under repartitioning") {
    val a = Bootstrap.poissonMeanCi(rows, "id", "v", b = 8)
      .select("b", "mean_q").as[(Int, Double)].collect().toMap
    val b = Bootstrap.poissonMeanCi(rows.repartition(13), "id", "v", b = 8)
      .select("b", "mean_q").as[(Int, Double)].collect().toMap
    assert(a === b)
  }

  test("CDF thresholds are the Poisson(1) cumulative probabilities") {
    val e = math.exp(-1.0)
    assert(math.abs(Bootstrap.PoissonCdf.head - e) < 1e-15)
    assert(math.abs(Bootstrap.PoissonCdf(1) - 2 * e) < 1e-15)
    assert(Bootstrap.PoissonCdf.last > 0.9999)
  }
}
