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

  /** PPMI word vectors + top-k nearest neighbors for probe words —
    * distributional word similarity from the SAME windowed counts as
    * [[pmiPairs]] (Levy & Goldberg 2014: the PPMI matrix is the
    * count-based twin of word2vec's factorization). A word's vector is
    * its sparse (context → ppmi) row; symmetric context (forward and
    * backward windows both count, max weight on collision).
    *
    * Determinism: weights are the quantized micro-nat longs clamped at
    * 0, dots and norms are exact integer sums of micro² products, and
    * the only doubles are the final sqrt/division — identical
    * arithmetic in the mirror.
    *
    * Scale shape: count tables key on tokens (never broadcast); the
    * probe leg filters to |probes| words, so the dot products are ONE
    * context-keyed equi-join against a bounded broadcast side. Full
    * vocabulary×vocabulary neighbors are never materialized — at that
    * scale the vectors feed the ANN family (a3's IVF) instead.
    */
  def ppmiNeighbors(docs: DataFrame, idCol: String, textCol: String,
      window: Int, minCount: Long, probes: Seq[String], k: Int)
      : DataFrame = {
    val pp0 = pmiPairs(docs, idCol, textCol, window, minCount)
      .select(col("a"), col("b"),
        greatest(col("pmi_micro"), lit(0L)).as("x"))
      .filter(col("x") > 0)
    val vec = pp0.select(col("a").as("w"), col("b").as("c"), col("x"))
      .unionByName(pp0.select(col("b").as("w"), col("a").as("c"), col("x")))
      .groupBy(col("w"), col("c")).agg(max(col("x")).as("x"))
      .cache()
    val norms = vec.groupBy(col("w")).agg(sum(col("x") * col("x")).as("n2"))
    val probeVec = vec.filter(col("w").isin(probes: _*))
      .select(col("w").as("p"), col("c"), col("x").as("xp"))
    import org.apache.spark.sql.expressions.Window
    val rw = Window.partitionBy(col("p"))
      .orderBy(col("cosr").desc, col("w"))
    broadcast(probeVec)
      .join(vec, Seq("c"))
      .filter(col("w") =!= col("p"))
      .groupBy(col("p"), col("w"))
      .agg(sum(col("xp") * col("x")).as("dot"))
      // probe-side norms are |probes| rows — broadcast them instead of
      // shuffling the vocabulary-scale norms table for the p join
      .join(broadcast(norms.filter(col("w").isin(probes: _*))
        .select(col("w").as("p"), col("n2").as("n2p"))), Seq("p"))
      .join(norms.select(col("w"), col("n2").as("n2w")), Seq("w"))
      .withColumn("cosr", col("dot").cast("double") /
        (sqrt(col("n2p").cast("double")) * sqrt(col("n2w").cast("double"))))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .select(col("p"), col("w").as("neighbor"), col("dot"),
        round(col("cosr"), 6).as("cos"), col("rank"))
  }
}
