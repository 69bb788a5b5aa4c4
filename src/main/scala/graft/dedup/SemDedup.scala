package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup — semantic deduplication inside embedding clusters (Abbas
  * et al. 2023, arXiv:2303.09540): pairwise cosine is computed only
  * between members of the SAME k-means cluster, and a member is pruned
  * when an earlier member (smaller id — the deterministic stand-in for
  * the paper's matrix order) of its cluster sits within `tau` cosine.
  * This is the embedding-space complement of the reference's text-level
  * duplicate handling (`core/vectors_backend.py:793-840` ranks by the
  * same cosine; the reference has no corpus-level semantic prune — this
  * is one of the training-pipeline operators layered on top).
  *
  * Scale: the ONLY pairwise work is per-cluster — an equi-join on
  * `cluster_id` — so cost is Σ m_c², bounded by the cluster-size cap
  * the IVF build chooses (k grows with n, keeping m_c ~ thousands at
  * any corpus size; the paper runs the same shape at web scale). The
  * persisted IVF layout is already partitioned by `cluster_id`, so on
  * a real cluster the self-join is co-located reads, no wide shuffle.
  * Pairs split across clusters are invisible by design (the paper's
  * documented recall trade).
  */
object SemDedup {

  /** Assign `vecs` (id, vec) to the nearest centroid of a fitted
    * centroid table (cluster_id, centroid): the same portable float32
    * argmin as `Ivf.build` — map-side partial min over a broadcast
    * k-row table with the (distance, cluster_id) tiebreak, one shuffle
    * of N rows, no window.
    */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("cdist", VectorFunctions.l2sqF(col("vec"), col("centroid")))
      .groupBy(col("id"))
      .agg(min(struct(col("cdist"), col("cluster_id"), col("vec"))).as("m"))
      .select(col("id"), col("m.vec").as("vec"),
        col("m.cluster_id").as("cluster_id"))

  /** One row per member: `id`, `cluster_id`, `is_kept` (1/0), `dup_of`
    * (smallest same-cluster id within `tau`, null when kept), `max_sim`
    * (highest cosine to any earlier member, rounded to 6, null when
    * kept). Pruning compares against ALL earlier members, kept or not —
    * the paper's semantics (each item checks its max similarity to
    * earlier rows of the cluster matrix, not to survivors only).
    */
  def prune(assigned: DataFrame, tau: Double): DataFrame = {
    val m = assigned.select(col("id"), col("vec"), col("cluster_id"))
    val dup = m.as("x")
      .join(m.as("y"),
        col("x.cluster_id") === col("y.cluster_id") &&
          col("y.id") < col("x.id"))
      .withColumn("sim", VectorFunctions.cosine(col("x.vec"), col("y.vec")))
      .filter(col("sim") >= tau)
      .groupBy(col("x.id").as("id"))
      .agg(min(col("y.id")).as("dup_of"),
        round(max(col("sim")), 6).as("max_sim"))
    m.select(col("id"), col("cluster_id"))
      .join(dup, Seq("id"), "left")
      .withColumn("is_kept", when(col("dup_of").isNull, 1).otherwise(0))
      .select(col("id"), col("cluster_id"), col("is_kept"),
        col("dup_of"), col("max_sim"))
  }
}
