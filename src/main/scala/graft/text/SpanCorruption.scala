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

  /** (doc_id, input, target, n_spans, n_corrupted) per document. */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      seed: String = "sc"): DataFrame = {
    val toked = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val tk = toked
      .select(col("doc_id"), posexplode(col("toks")))
      .withColumnRenamed("pos", "i0").withColumnRenamed("col", "tok")
      .withColumn("blk", expr(s"i0 div $BlockLen"))
      .withColumn("p", col("i0") % BlockLen)
      .withColumn("off",
        pmod(PortableHash.hash60(lit(seed),
          concat(col("doc_id").cast("string"), lit("_"),
            col("blk").cast("string"))),
          lit((BlockLen - SpanLen + 1).toLong)))
    val classified = tk.withColumn("sentinel",
      concat(lit("<extra_id_"), col("blk").cast("string"), lit(">")))
    val input = classified
      .filter(!(col("p") > col("off") && col("p") <= col("off") + (SpanLen - 1)))
      .select(col("doc_id"), struct(col("i0"),
        when(col("p") === col("off"), col("sentinel")).otherwise(col("tok"))
          .as("t")).as("e"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("t")), " ").as("input"))
    val target = classified
      .filter(col("p") >= col("off") && col("p") <= col("off") + (SpanLen - 1))
      .select(col("doc_id"), struct(col("i0"),
        when(col("p") === col("off"),
          concat(col("sentinel"), lit(" "), col("tok")))
          .otherwise(col("tok")).as("t")).as("e"),
        when(col("p") === col("off"), 1L).otherwise(0L).as("isStart"))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("t")), " ").as("target"),
        sum(col("isStart")).as("n_spans"),
        count(lit(1)).as("n_corrupted"))
    input.join(target, Seq("doc_id"), "left")
      .select(col("doc_id"), col("input"),
        coalesce(col("target"), lit("")).as("target"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_corrupted"), lit(0L)).as("n_corrupted"))
  }
}
