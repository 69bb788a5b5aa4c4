package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval leakage audit — the check that closes the loop between
  * the dedup family and [[graft.text.Splits]]: near-duplicate pairs
  * that STRADDLE a split boundary are exactly the contamination that
  * inflates eval scores, and the audit is the measurement that proves
  * (or refutes) a split's hygiene before training starts. Keying the
  * split by the dup-cluster representative drives this to zero by
  * construction; keying iid by doc id leaves a measurable leak — the
  * audit quantifies the difference.
  *
  * Scale shape: `pairs` arrives from the banded LSH path (bounded by
  * near-dup density, NEVER all-pairs); the audit itself is two
  * equi-joins of that bounded pair set against the assignment
  * projection — AQE broadcasts the pair side when it is small, and
  * nothing here scales with corpus size beyond the assignment scan.
  */
object LeakAudit {

  /** Pairs from `pairs(a, b, …)` whose endpoints land in DIFFERENT
    * splits under `assigned(idCol, split)`. All pair columns ride
    * along, plus `split_a` / `split_b`.
    */
  def crossSplitPairs(pairs: DataFrame, assigned: DataFrame,
      idCol: String): DataFrame = {
    val sp = assigned.select(col(idCol).as("id"), col("split"))
    pairs
      .join(sp.select(col("id").as("a"), col("split").as("split_a")),
        Seq("a"))
      .join(sp.select(col("id").as("b"), col("split").as("split_b")),
        Seq("b"))
      .filter(col("split_a") =!= col("split_b"))
  }

  /** Leak counts by (split_a, split_b) — the audit's summary matrix. */
  def leakMatrix(crossPairs: DataFrame): DataFrame =
    crossPairs.groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("n_pairs"))
}
