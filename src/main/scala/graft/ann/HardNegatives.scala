package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Hard-negative mining for contrastive training data — for each query
  * (anchor) document, the top-k most-similar corpus documents that are
  * NOT positives (different label/group): the highest-value negatives
  * for embedding-model training (DPR/contrastive curricula), and a
  * direct composition of the engine's retrieval parts.
  *
  * Shape mirrors [[Knn.bruteForceTopK]]: the anchor side is a small
  * relation → broadcast; the corpus streams; per-anchor rank is a
  * window PARTITIONED by the anchor id (never a global sort); the
  * positive exclusion is a plain predicate on the labels carried by
  * the join — no second pass. At 100 TB swap the scored cross join
  * for an IVF/LSH candidate join ([[Ivf]] / [[Knn.hyperplaneBucketTopK]])
  * — the exclusion + window shape is unchanged; margin semantics below
  * compose the same way.
  *
  * An optional margin implements "semi-hard" mining (Schroff et al.
  * 2015, FaceNet): keep only negatives STRICTLY less similar than the
  * anchor's own positive ceiling minus `margin`, dropping
  * false-negative near-duplicates that would poison the loss. The
  * positive ceiling (max similarity to a same-label doc) comes from the
  * same scored relation via a conditional max over the anchor window —
  * one extra window agg, zero extra scans.
  */
object HardNegatives {

  /** anchors: (aid, avec, alabel); corpus: (id, vec, label).
    * Output: (aid, id, sim, pos_ceiling, rank) — rank over negatives
    * only, per anchor; pos_ceiling = the anchor's max same-label sim
    * (-1 when the anchor has no positive in the corpus).
    */
  def mine(corpus: DataFrame, idCol: String, vecCol: String, labelCol: String,
      anchors: DataFrame, aidCol: String, avecCol: String, alabelCol: String,
      k: Int, margin: Option[Double] = None): DataFrame = {
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col(labelCol).as("label"),
        VectorFunctions.norm2(col(vecCol)).as("n2"))
      .crossJoin(broadcast(anchors.select(col(aidCol).as("aid"),
        col(avecCol).as("avec"), col(alabelCol).as("alabel"),
        VectorFunctions.norm2(col(avecCol)).as("an2"))))
      .filter(col("id") =!= col("aid"))
      .withColumn("sim", VectorFunctions.cosinePre(
        col("vec"), col("avec"), col("n2"), col("an2")))
    val aw = Window.partitionBy(col("aid"))
    val withCeil = scored.withColumn("pos_ceiling",
      coalesce(max(when(col("label") === col("alabel"), col("sim")))
        .over(aw), lit(-1.0d)))
    val negs = withCeil.filter(col("label") =!= col("alabel"))
    val gated = margin match {
      case Some(m) => negs.filter(col("sim") < col("pos_ceiling") - m)
      case None    => negs
    }
    val rw = Window.partitionBy(col("aid"))
      .orderBy(col("sim").desc, col("id").asc)
    gated
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("aid"), col("id"), col("sim"),
        col("pos_ceiling"), col("rank"))
  }
}
