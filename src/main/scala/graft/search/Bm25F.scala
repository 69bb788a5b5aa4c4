package graft.search

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Simple BM25F (Robertson, Zaragoza & Taylor, CIKM 2004): multi-field
  * keyword ranking where a term hit in a heavily-weighted field (a
  * function NAME, a title) counts more than the same hit buried in the
  * body — the standard structured-document extension the reference's
  * single-field BM25 (`core/bm25_backend.py:53-200`) cannot express.
  *
  * The "simple" formulation folds field weights into pseudo-counts
  * BEFORE saturation: tf′(t,d) = Σ_f w_f·tf_f(t,d) and dl′(d) =
  * Σ_f w_f·len_f(d), then applies the unchanged BM25 curve — which
  * means the entire [[Bm25]] index/scoring machinery (persisted
  * bucketed tables, incremental merge, variant scoring) is REUSED
  * verbatim over the weighted postings; only the postings builder
  * differs. Integer field weights keep tf′/dl′ exact integers, so the
  * determinism contract is identical to plain BM25.
  *
  * Scale shape: one explode per field union-ed before ONE partial-
  * aggregated groupBy — same shuffle count as single-field postings;
  * everything downstream inherits Bm25's bucketed-layout story.
  */
object Bm25F {

  /** Field-weighted postings: (id, term, tf) with tf = Σ_f w_f·tf_f. */
  def fieldPostings(docs: DataFrame, idCol: String,
      fields: Seq[(String, Int)]): DataFrame = {
    require(fields.nonEmpty && fields.forall(_._2 > 0),
      "field weights must be positive integers")
    val occ = fields.map { case (f, w) =>
      docs.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(f))).as("term"),
        lit(w.toLong).as("w"))
    }.reduce(_ unionByName _)
    occ.groupBy(col("id"), col("term")).agg(sum(col("w")).as("tf"))
  }

  /** Score `queryTokens` against multi-field docs: weighted postings
    * through the unchanged BM25 pipeline. Output: (id, score).
    */
  def scoreFields(spark: SparkSession, docs: DataFrame, idCol: String,
      fields: Seq[(String, Int)], queryTokens: Seq[String]): DataFrame =
    Bm25.scoreIndexed(spark,
      Bm25.buildIndex(fieldPostings(docs, idCol, fields)), queryTokens)
}
