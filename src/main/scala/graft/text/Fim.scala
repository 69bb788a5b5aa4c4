package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.TextFunctions.tokens

/** Fill-in-the-Middle (FIM) training transform (Bavarian et al. 2022,
  * "Efficient Training of Language Models to Fill in the Middle"):
  * split each document into (prefix, middle, suffix) at two
  * pseudorandom cut points and reorder to PSM —
  * `<PRE> prefix <SUF> suffix <MID> middle` — for a configurable
  * fraction of documents, passing the rest through untouched.
  *
  * Randomness is derived, not drawn: cut points and the apply decision
  * come from the portable 60-bit hash of the document id, so the
  * transform is deterministic per document (reproducible shards,
  * resumable jobs — the same property the span-corruption op uses) and
  * oracle-mirrorable. Everything is one codegen projection: no shuffle,
  * no UDF, trivially scales.
  */
object Fim {

  /** Adds `fim_applied`, cut points `lo`/`hi` and the transformed
    * `fim_text` (PSM order when applied, the normalized original
    * otherwise). `ratePct` of documents (by id-hash) are transformed.
    */
  def psm(docs: DataFrame, textCol: String, idCol: String,
      ratePct: Int = 50): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, "ratePct must be in [0,100]")
    val idStr = col(idCol).cast("string")
    val withToks = docs.withColumn("_toks", tokens(col(textCol)))
    val n = size(col("_toks"))
    val c1 = PortableHash.hash60(lit("fimc1"), idStr) % (n + 1).cast("long")
    val c2 = PortableHash.hash60(lit("fimc2"), idStr) % (n + 1).cast("long")
    val applied =
      PortableHash.hash60(lit("fimr"), idStr) % 100 < lit(ratePct.toLong)
    val lo = least(c1, c2).cast("int")
    val hi = greatest(c1, c2).cast("int")
    val prefix = array_join(slice(col("_toks"), lit(1), lo), " ")
    val middle = array_join(slice(col("_toks"), lo + 1, hi - lo), " ")
    val suffix = array_join(slice(col("_toks"), hi + 1, n - hi), " ")
    withToks
      .withColumn("fim_applied", applied.cast("int"))
      .withColumn("lo", lo.cast("long"))
      .withColumn("hi", hi.cast("long"))
      .withColumn("fim_text",
        when(applied, concat(lit("<PRE> "), prefix, lit(" <SUF> "),
          suffix, lit(" <MID> "), middle))
          .otherwise(array_join(col("_toks"), " ")))
      .drop("_toks")
  }
}
