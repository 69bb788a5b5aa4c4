package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** T5/UL2-style span corruption (Raffel et al. 2020 §3.1.4): replace
  * token spans with sentinel markers to form (input, target) denoising
  * pairs — `input` keeps the surrounding text with one `<extra_id_b>`
  * per corrupted span, `target` lists each sentinel followed by the
  * tokens it hides.
  *
  * Deterministic span placement (training-data prep must be
  * reproducible across reruns AND engines, so no RNG): token positions
  * tile into fixed blocks of [[BlockLen]]; each block corrupts ONE
  * span of [[SpanLen]] starting at `offset = hash60(doc_id, block) mod
  * (BlockLen - SpanLen + 1)` — spans can never overlap or cross
  * blocks, the corruption rate is SpanLen/BlockLen (15% at 3/20, the
  * T5 default), and a partial tail block simply truncates its span.
  *
  * Scale shape: one explode to (doc, position) rows, per-row
  * classification by pure hash arithmetic, and one doc-keyed
  * aggregation rebuilding input/target in position order via
  * sort_array (collect_list order is not a contract). Per-group state
  * is the document itself — the tokenizer-equivalent bound.
  */
object SpanCorruption {

  val BlockLen = 20
  val SpanLen = 3

  /** (doc_id, input, target, n_spans, n_corrupted) per document.
    *
    * The span-offset hash is computed ONCE PER BLOCK (an `offs` array
    * built before the token explode), not once per token: the md5
    * chain behind `hash60` is the allocation-heavy part of this plan,
    * and at token granularity it ran ~BlockLen× more often than the
    * math requires — the round-9 verdict traced spc1's bimodal x30
    * stress slow mode to exactly this per-row hash pressure. Exploded
    * rows just index the (tiny) per-doc array. AllocAuditSpec pins the
    * no-md5-above-the-explode plan shape.
    */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      seed: String = "sc"): DataFrame = {
    val toked = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("offs", transform(
        sequence(lit(0L), greatest(lit(0L),
          expr(s"(size(toks) + ${BlockLen - 1}) div $BlockLen") - 1)),
        b => pmod(PortableHash.hash60(lit(seed),
          concat(col("doc_id").cast("string"), lit("_"),
            b.cast("string"))),
          lit((BlockLen - SpanLen + 1).toLong))))
    val tk = toked
      .select(col("doc_id"), col("offs"), posexplode(col("toks")))
      .withColumnRenamed("pos", "i0").withColumnRenamed("col", "tok")
      .withColumn("blk", expr(s"i0 div $BlockLen"))
      .withColumn("p", col("i0") % BlockLen)
      .withColumn("off",
        element_at(col("offs"), (col("blk") + 1).cast("int")))
    val classified = tk.withColumn("sentinel",
      concat(lit("<extra_id_"), col("blk").cast("string"), lit(">")))
    // ONE doc-keyed aggregate builds input AND target: collect_list
    // skips the nulls the per-side `when`s produce, so the two filtered
    // rebuilds (and the join that reunited them — a second evaluation
    // of the whole tokenize+explode subtree) collapse into one shuffle.
    val inSpan = col("p") >= col("off") &&
      col("p") <= col("off") + (SpanLen - 1)
    classified
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(sort_array(collect_list(
          when(!(col("p") > col("off") && inSpan),
            struct(col("i0"),
              when(col("p") === col("off"), col("sentinel"))
                .otherwise(col("tok")).as("t"))))),
          e => e.getField("t")), " ").as("input"),
        array_join(transform(sort_array(collect_list(
          when(inSpan,
            struct(col("i0"),
              when(col("p") === col("off"),
                concat(col("sentinel"), lit(" "), col("tok")))
                .otherwise(col("tok")).as("t"))))),
          e => e.getField("t")), " ").as("target"),
        sum(when(col("p") === col("off"), 1L).otherwise(0L)).as("n_spans"),
        sum(when(inSpan, 1L).otherwise(0L)).as("n_corrupted"))
      .select(col("doc_id"), col("input"), col("target"),
        col("n_spans"), col("n_corrupted"))
  }
}
