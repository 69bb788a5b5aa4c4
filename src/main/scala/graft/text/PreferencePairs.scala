package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair assembly — the DPO/RLHF-reward training-data step
  * (brief-mandated LLM-pipeline family, no reference analog): per
  * prompt, the highest-reward candidate becomes `chosen` and the
  * lowest-reward candidate `rejected`, with a reward-margin floor so
  * near-tied pairs (no learning signal) are dropped.
  *
  * Determinism contract: both extremes tiebreak on the LOWEST candidate
  * id at equal reward, via struct-ordered min/max aggregates — no
  * window, no `max_by` (tie order unspecified).
  *
  * Scale shape: ONE prompt-keyed hash aggregate over the candidate
  * pool (partial map-side combine; per-group state is two structs),
  * then optional equi-joins to re-attach response text. No window over
  * the pool, no driver collect.
  */
object PreferencePairs {

  /** (prompt_id, chosen_id, chosen_reward, rejected_id,
    * rejected_reward, margin, n_candidates) per prompt; prompts whose
    * best and worst candidate coincide (single candidate) or whose
    * margin is below `minMargin` are dropped.
    */
  def pairs(cands: DataFrame, promptCol: String, idCol: String,
      rewardCol: String, minMargin: Double = 0.0): DataFrame =
    cands
      .groupBy(col(promptCol).as("prompt_id"))
      .agg(
        // max of (reward, -id, id): highest reward, then lowest id
        max(struct(col(rewardCol).as("r"), (-col(idCol)).as("ni"),
          col(idCol).as("id"))).as("c"),
        // min of (reward, id): lowest reward, then lowest id
        min(struct(col(rewardCol).as("r"), col(idCol).as("id"))).as("w"),
        count(lit(1)).as("n_candidates"))
      .select(col("prompt_id"),
        col("c.id").as("chosen_id"), col("c.r").as("chosen_reward"),
        col("w.id").as("rejected_id"), col("w.r").as("rejected_reward"),
        (col("c.r") - col("w.r")).as("margin"),
        col("n_candidates"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("margin") >= minMargin)

  /** Re-attach the chosen/rejected response texts to a [[pairs]] frame:
    * two compound-key equi-joins against the candidate pool (the pairs
    * side is prompt-cardinality — the small side at scale).
    */
  def withTexts(pairsDf: DataFrame, cands: DataFrame, promptCol: String,
      idCol: String, textCol: String): DataFrame = {
    val c = cands.select(col(promptCol).as("prompt_id"),
      col(idCol).as("chosen_id"), col(textCol).as("chosen_text"))
    val w = cands.select(col(promptCol).as("prompt_id"),
      col(idCol).as("rejected_id"), col(textCol).as("rejected_text"))
    pairsDf
      .join(c, Seq("prompt_id", "chosen_id"))
      .join(w, Seq("prompt_id", "rejected_id"))
  }
}
