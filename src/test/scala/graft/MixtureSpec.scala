package graft

import org.apache.spark.sql.functions._

import graft.text.Mixture

/** Mixture: largest-remainder apportionment against a driver mirror,
  * the exact-budget invariant, and the temperature direction (alpha<1
  * up-weights small domains relative to proportional).
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def mirror(counts: Map[Long, Long], alpha: Double,
      budget: Long): Map[Long, Long] = {
    val shares = counts.map { case (d, n) =>
      d -> math.floor(math.sqrt(n.toDouble) * 1e6).toLong
    }
    require(alpha == 0.5) // mirror matches the sqrt path
    val s = shares.values.sum
    val floors = shares.map { case (d, sh) => d -> budget * sh / s }
    val rems = shares.map { case (d, sh) => d -> budget * sh % s }
    val leftover = budget - floors.values.sum
    val order = rems.toSeq.sortBy { case (d, r) => (-r, d) }.map(_._1)
    val bump = order.take(leftover.toInt).toSet
    floors.map { case (d, f) => d -> (f + (if (bump(d)) 1L else 0L)) }
  }

  private val counts = Map(1L -> 90000L, 2L -> 10000L, 3L -> 400L, 4L -> 37L)
  private def docsDf = counts.toSeq.flatMap { case (d, n) =>
    // split each domain into a few doc rows to exercise the aggregate
    Seq((d, n / 2), (d, n - n / 2))
  }.toDF("domain", "n_tokens")

  test("targets match the driver mirror and sum exactly to the budget") {
    val out = Mixture.temperatureTargets(docsDf, "domain", "n_tokens",
        alpha = 0.5, budget = 9973L)
      .collect().map(r => r.getAs[Long]("domain") ->
        r.getAs[Long]("target_tokens")).toMap
    assert(out === mirror(counts, 0.5, 9973L))
    assert(out.values.sum === 9973L)
  }

  test("alpha=0.5 up-weights small domains relative to proportional share") {
    val out = Mixture.temperatureTargets(docsDf, "domain", "n_tokens",
        alpha = 0.5, budget = 100000L)
      .collect().map(r => r.getAs[Long]("domain") ->
        r.getAs[Long]("target_tokens")).toMap
    val total = counts.values.sum.toDouble
    // the smallest domain gets far more than its token share...
    assert(out(4L).toDouble / 100000 > 10 * (counts(4L) / total))
    // ...and the ordering of targets still follows the ordering of sizes
    assert(out(1L) > out(2L) && out(2L) > out(3L) && out(3L) > out(4L))
  }

  test("every domain with data gets a row and a nonnegative target") {
    val out = Mixture.temperatureTargets(docsDf, "domain", "n_tokens",
        alpha = 0.5, budget = 10L) // budget far below domain count is fine
      .collect()
    assert(out.length === counts.size)
    assert(out.forall(_.getAs[Long]("target_tokens") >= 0L))
    assert(out.map(_.getAs[Long]("target_tokens")).sum === 10L)
  }
}
