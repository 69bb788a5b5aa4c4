package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chat-template rendering with loss masking — the SFT assembly step:
  * each conversation's turns render into one training string under a
  * fixed role-tag template, and the loss mask covers exactly the
  * assistant spans (the tokens the model is trained to produce; prompt
  * tokens are context only).
  *
  * Template per turn: `<|role|>\n{content}` joined by `\n`, with
  * `<|end|>` closing every turn — a representative of the ChatML-style
  * family; the operator is the assembly/masking shape, not any vendor's
  * exact tags.
  *
  * Determinism: turns order by (turn_idx, role) via sort_array inside
  * the aggregation (collect_list order is not a contract); token
  * counts use the corpus tokenizer so mask fractions are engine-exact
  * integers.
  *
  * Scale shape: one conversation-keyed hash aggregate; per-group state
  * is one conversation. No window, no global sort.
  */
object ChatTemplate {

  /** (conv_id, rendered, n_turns, n_tokens, n_masked_tokens,
    * mask_permille) per conversation; mask covers assistant turns.
    */
  def render(turns: DataFrame, convCol: String, idxCol: String,
      roleCol: String, contentCol: String): DataFrame =
    turns
      .select(col(convCol).as("conv_id"),
        struct(col(idxCol).as("i"), col(roleCol).as("role"),
          col(contentCol).as("content")).as("t"),
        size(TextFunctions.tokens(col(contentCol))).cast("long").as("ntok"),
        when(col(roleCol) === "assistant",
          size(TextFunctions.tokens(col(contentCol))).cast("long"))
          .otherwise(0L).as("mtok"))
      .groupBy(col("conv_id"))
      .agg(
        array_join(transform(sort_array(collect_list(col("t"))),
          t => concat(lit("<|"), t.getField("role"), lit("|>\n"),
            t.getField("content"), lit("\n<|end|>"))), "\n")
          .as("rendered"),
        count(lit(1)).as("n_turns"),
        sum(col("ntok")).as("n_tokens"),
        sum(col("mtok")).as("n_masked_tokens"))
      .withColumn("mask_permille",
        expr("cast((n_masked_tokens * 1000) div greatest(n_tokens, 1) as bigint)"))
}
