package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic domain mixing for training sets: down-sample
  * over-represented domains (language, source) toward a uniform
  * target share, keeping under-represented domains whole. Acceptance
  * is a pure hash test on the document id — reproducible across runs,
  * machines, and engines — not `rand()`.
  *
  * The accept test is kept in INTEGER arithmetic so the DuckDB oracle
  * mirrors it exactly: accept iff
  * `h(id) * nDomains * domainCount < Modulus * total`,
  * which is hash-uniform acceptance at rate
  * `min(1, total / (nDomains * domainCount))` with no float rounding
  * at the boundary. All operands stay far below 2^63.
  *
  * Scale: one groupBy pass for the per-domain counts (metadata-scale
  * result), broadcast back; the corpus side streams through a single
  * filter — no shuffle of the data itself.
  */
object Mixing {

  val Modulus = 1000003L        // prime, > any per-doc hash
  val Mult = 2654435761L        // Knuth multiplicative constant
  val Add = 98765L

  /** Deterministic global training order: every row gets a unique
    * `shuffle_rank` (1-based) in the order of the portable id hash
    * (id tiebreak) — a reproducible corpus shuffle with global
    * positions, computed through the distributed two-pass prefix sum
    * (`Sampling.globalRunningSum` with a unit weight), never a
    * single-partition `row_number`.
    */
  def shuffleRanks(docs: DataFrame, idCol: String): DataFrame =
    Sampling.globalRunningSum(
        docs.withColumn("shuffle_key",
          pmod(col(idCol) * Mult + Add, lit(Modulus)))
          .withColumn("_one", lit(1)),
        Seq(col("shuffle_key").asc, col(idCol).asc), "_one")
      .withColumnRenamed("cum", "shuffle_rank")
      .drop("_one")

  /** Round-robin domain interleave: training order that cycles the
    * domains so every consecutive batch is domain-diverse (the batch-
    * composition dual of mx1's count balancing — order, not counts).
    * Rank 1 of every domain comes first (domain-name order), then rank
    * 2 of every domain, and so on; domains that run out simply drop out
    * of later cycles. Within a domain the order is the deterministic
    * id-hash shuffle. Global positions via the shared two-pass prefix
    * sum — one domain-partitioned window plus the range repartition,
    * never a single-partition row_number.
    */
  def interleaveRoundRobin(docs: DataFrame, domainCol: String,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(pmod(col(idCol) * Mult + Add, lit(Modulus)).asc,
        col(idCol).asc)
    Sampling.globalRunningSum(
        docs.withColumn("cycle", row_number().over(w))
          .withColumn("_one", lit(1)),
        Seq(col("cycle").asc, col(domainCol).asc, col(idCol).asc), "_one")
      .withColumnRenamed("cum", "pos")
      .drop("_one")
  }

  /** Rows of `docs` surviving the uniform-target stratified sample. */
  def stratifiedUniform(docs: DataFrame, domainCol: String, idCol: String)
      : DataFrame = {
    val counts = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("_dom_n"))
    val tot = counts.agg(sum(col("_dom_n")).as("_total"),
      count(lit(1)).as("_doms"))
    docs.join(broadcast(counts), Seq(domainCol))
      .crossJoin(broadcast(tot))
      .withColumn("_h", pmod(col(idCol) * Mult + Add, lit(Modulus)))
      .filter(col("_h") * col("_doms") * col("_dom_n") <
        lit(Modulus) * col("_total"))
      .drop("_h", "_dom_n", "_total", "_doms")
  }
}
