package graft.search

/** Maximal Marginal Relevance diversity rerank — the reference's
  * `core/mmr.py:23-158`: greedily pick argmax of
  * lambda*relevance − (1−lambda)*max_similarity(selected), over an
  * over-retrieved candidate set (3× the requested k).
  *
  * Inherently sequential, so it runs driver-side on the collected
  * top-N (N ≤ a few thousand) — the distributed plan produces the
  * candidates, this finishes them. Vectors are L2-normalized once,
  * pairwise similarity is then a dot product (as `mmr.py:98-107`).
  */
object Mmr {

  final case class Candidate(id: Long, relevance: Double, vec: Array[Float])

  def rerank(candidates: Seq[Candidate], lambda: Double, k: Int): Seq[Candidate] = {
    if (candidates.isEmpty) return Nil
    val cands = candidates.toArray
    val normed = cands.map(c => normalize(c.vec))
    val n = cands.length
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val remaining = scala.collection.mutable.LinkedHashSet(0 until n: _*)
    // max similarity to any already-selected candidate, updated incrementally
    val maxSim = Array.fill(n)(0.0)
    while (selected.length < math.min(k, n) && remaining.nonEmpty) {
      val pick =
        if (selected.isEmpty) remaining.maxBy(i => (cands(i).relevance, -cands(i).id))
        else remaining.maxBy { i =>
          (lambda * cands(i).relevance - (1 - lambda) * maxSim(i), -cands(i).id)
        }
      selected += pick
      remaining -= pick
      var j = 0
      while (j < n) {
        if (remaining.contains(j)) {
          val s = dot(normed(pick), normed(j))
          if (s > maxSim(j)) maxSim(j) = s
        }
        j += 1
      }
    }
    selected.map(cands(_)).toSeq
  }

  private def normalize(v: Array[Float]): Array[Double] = {
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(ss)
    if (n == 0) v.map(_.toDouble) else v.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}
