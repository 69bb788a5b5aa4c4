package graft

import org.apache.spark.sql.functions._

import graft.embed.RandomProjection
import graft.functions.PortableHash

/** RandomProjection: component exactness vs the driver mirror, and the
  * JL property that makes the preview space usable — deterministic
  * measurements on a fixed hash-derived corpus, so the asserted floors
  * are stable forever.
  */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private val n = 200

  /** Fixed clustered corpus from the portable hash: 10 well-separated
    * centers, small per-point noise — the structure (cluster
    * membership) is what a JL preview space must preserve; uniform
    * noise corpora have no neighbor structure to preserve at all.
    */
  private def u(seed: String, key: String): Float =
    (PortableHash.hash60Local(seed, key) % 2001L - 1000L).toFloat / 1000f

  private def vec(id: Long): Seq[Float] = {
    val c = id % 10
    (0 until dim).map(i => u("rpcenter", s"$c:$i") + 0.15f * u("rpnoise", s"$id:$i"))
  }

  private val corpus = (0L until n.toLong).map(id => (id, vec(id)))

  test("components equal the driver-side mirror exactly") {
    val out = corpus.toDF("id", "v")
      .select(col("id"), RandomProjection.project(col("v"), 8, dim, "jl").as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    corpus.take(20).foreach { case (id, v) =>
      assert(out(id) === RandomProjection.projectLocal(v, 8, "jl"))
    }
  }

  test("norms are preserved in aggregate (JL contract)") {
    val ratios = corpus.map { case (_, v) =>
      val p = RandomProjection.projectLocal(v, 8, "jl")
      p.map(x => x * x).sum / v.map(x => x.toDouble * x).sum
    }
    val mean = ratios.sum / ratios.size
    // E[ratio] = 1 for ±1/√d projections; at d'=8 the per-vector
    // spread is wide (χ²₈) and the 10 shared centers correlate the
    // draws — measured 1.12 on this fixed corpus
    assert(mean > 0.75 && mean < 1.25, s"mean norm ratio $mean")
  }

  test("projected-space top-10 recalls most exact top-10 neighbors") {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val full = corpus.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    val proj = corpus.map { case (id, v) =>
      id -> RandomProjection.projectLocal(v, 8, "jl")
    }.toMap
    def top10(m: Map[Long, Seq[Double]], q: Long): Set[Long] =
      m.keys.filter(_ != q).toSeq
        .sortBy(id => (-cos(m(q), m(id)), id)).take(10).toSet
    val recalls = (0L until 10L).map { q =>
      (top10(full, q) intersect top10(proj, q)).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    // deterministic corpus + fixed seed => stable measurement; 8 dims
    // is a coarse preview, refine-in-full-space recovers the rest
    assert(mean >= 0.3, s"mean recall@10 $mean")
  }
}
