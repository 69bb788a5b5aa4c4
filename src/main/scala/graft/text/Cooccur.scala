package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token co-occurrence with pointwise mutual information — the
  * distributional-semantics building block (collocation mining,
  * phrase detection, embedding bootstrap): pairs that co-occur far
  * more than their token frequencies predict.
  *
  * Pairs are forward skip-grams at distances 1..window. PMI is
  * computed from exact integer counts —
  * ln(c_ab · T_tok² / (T_pair · u_a · u_b)) — and quantized to
  * micro-nats (floor) so ranking and values mirror bit-for-bit in the
  * oracle; the multiplication ORDER inside the ratio is part of the
  * contract (left-associative on both engines).
  *
  * Scale: one explode per distance (bounded by window · corpus
  * tokens), pair/unigram count tables are corpus-scale and join back
  * on their keys (hash joins, never broadcast); only the two scalar
  * totals are broadcast.
  */
object Cooccur {

  /** (a, b, n_pairs, pmi_micro) for every forward pair within
    * `window`, min-support filtered.
    */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minCount: Long): DataFrame = {
    // toked feeds both pair-distance explodes and the unigram pass —
    // cache once so the regex tokenization runs once, not 3×
    val toked = docs.select(col(idCol).as("doc_id"),
      TextFunctions.tokens(col(textCol)).as("toks")).cache()
    val pairs = (1 to window).map { k =>
      toked.filter(size(col("toks")) > k)
        .select(explode(expr(
          s"transform(sequence(0, size(toks) - 1 - $k), " +
            s"i -> struct(toks[i] as a, toks[i + $k] as b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
    }.reduce(_ unionByName _)
    val cab = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val occ = toked.select(explode(col("toks")).as("t"))
    val u = occ.groupBy(col("t")).agg(count(lit(1)).as("u"))
    // both scalar totals roll up from the count tables — rescanning the
    // occurrence/pair relations would pay two more corpus passes
    val ttok = u.agg(sum(col("u")).as("ttok"))
    val tpair = cab.agg(sum(col("c")).as("tpair"))
    cab.filter(col("c") >= minCount)
      .join(u.select(col("t").as("a"), col("u").as("ua")), Seq("a"))
      .join(u.select(col("t").as("b"), col("u").as("ub")), Seq("b"))
      .crossJoin(broadcast(ttok))
      .crossJoin(broadcast(tpair))
      .select(col("a"), col("b"), col("c").as("n_pairs"),
        floor(log((col("c").cast("double") * col("ttok") * col("ttok"))
          / (col("tpair").cast("double") * col("ua") * col("ub")))
          * UnigramLm.MicroNats).cast("long").as("pmi_micro"))
  }
}
