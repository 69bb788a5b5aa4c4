package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reward-based rejection sampling (best-of-N) — the RLHF data-curation
  * step that keeps, per prompt, the best candidate among those clearing
  * a reward floor (brief-mandated LLM-pipeline family, no reference
  * analog): candidates below `minReward` are rejected; prompts with no
  * surviving candidate are dropped entirely; the survivor is the
  * highest-reward acceptee with a lowest-id tiebreak.
  *
  * Scale shape: ONE prompt-keyed hash aggregate with conditional
  * (accept-masked) struct max — acceptance stats ride the same pass,
  * so the candidate pool is scanned once. No window, no second scan.
  */
object RejectionSampling {

  /** (prompt_id, best_id, best_reward, n_candidates, n_accepted,
    * accept_permille) per prompt with ≥1 accepted candidate.
    */
  def bestOfN(cands: DataFrame, promptCol: String, idCol: String,
      rewardCol: String, minReward: Double): DataFrame =
    cands
      .groupBy(col(promptCol).as("prompt_id"))
      .agg(
        // accept-masked max of (reward, -id, id): nulls (rejected
        // candidates) are skipped by the aggregate
        max(when(col(rewardCol) >= minReward,
          struct(col(rewardCol).as("r"), (-col(idCol)).as("ni"),
            col(idCol).as("id")))).as("b"),
        count(lit(1)).as("n_candidates"),
        sum(when(col(rewardCol) >= minReward, 1L).otherwise(0L))
          .as("n_accepted"))
      .filter(col("b").isNotNull)
      .select(col("prompt_id"),
        col("b.id").as("best_id"), col("b.r").as("best_reward"),
        col("n_candidates"), col("n_accepted"),
        expr("cast((n_accepted * 1000) div n_candidates as bigint)")
          .as("accept_permille"))
}
