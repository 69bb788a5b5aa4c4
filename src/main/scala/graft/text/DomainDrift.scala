package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-domain distribution drift: KL(P_domain ‖ P_corpus) over unigram
  * distributions — the scalar that ranks sources by how far their
  * language sits from the corpus mixture. High-KL domains are the ones
  * to re-weight (DSIR's [[Dsir]] importance targets), cap ([[Mixing]]),
  * or audit first; a KL jump between snapshots is the canonical
  * ingestion-drift alarm.
  *
  * KL = Σ_t p_d(t) · ln(p_d(t) / p_c(t)), restricted to the domain's
  * own support (where p_d > 0; p_c > 0 there by construction since the
  * domain is part of the corpus).
  *
  * Determinism ([[UnigramLm]]'s contract): the per-TYPE log-ratio is
  * quantized once — `floor(ln((c_d·N)/(c·n_d)) · 1e6)` micro-nats as a
  * long — then weighted by the integer occurrence count c_d and
  * integer-summed per domain; one double division at the end. Order-
  * free under any partitioning and any engine.
  *
  * Scale shape: one tokenize/explode pass feeds both count tables; the
  * drift join is keyed on the TOKEN (hash-partitioned equi-join — a
  * 100 TB vocabulary never broadcasts); only the metadata-scale
  * domain-total table and the scalar corpus total broadcast.
  */
object DomainDrift {

  /** Embedding-space drift: cosine between each domain's mean-embedding
    * centroid and the corpus centroid — the semantic complement of
    * [[unigramKl]] (lexical): a domain can share the corpus vocabulary
    * yet sit far away in embedding space (code vs prose, translated
    * text), and vice versa.
    *
    * Determinism ([[graft.embed.Pooling]]'s contract): components are
    * quantized to integer micro-units before summing, so centroids are
    * bit-exact floats in any engine. The corpus centroid re-aggregates
    * the DOMAIN sums — exact (integer addition is associative) and
    * metadata-scale (domains × dims rows), so the corpus pays ONE
    * explode pass, not two.
    */
  def embeddingDrift(docs: DataFrame, domainCol: String, vecCol: String)
      : DataFrame = {
    import graft.embed.Pooling.QuantScale
    import graft.functions.VectorFunctions
    val per = docs
      .select(col(domainCol).as("source"),
        posexplode(col(vecCol)).as(Seq("pos", "e")))
      .withColumn("q",
        floor(col("e").cast("double") * QuantScale).cast("long"))
      .groupBy(col("source"), col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
      .cache()
    def assemble(v: org.apache.spark.sql.Column) =
      transform(array_sort(collect_list(struct(col("pos"), v.as("v")))),
        s => s.getField("v"))
    val dom = per
      .withColumn("v",
        (col("sq").cast("double") / (col("n") * QuantScale)).cast("float"))
      .groupBy(col("source"))
      .agg(max(col("n")).cast("long").as("n_docs"),
        assemble(col("v")).as("dvec"))
    val corp = per.groupBy(col("pos"))
      .agg(sum(col("sq")).as("csq"), sum(col("n")).as("cn"))
      .withColumn("v",
        (col("csq").cast("double") / (col("cn") * QuantScale)).cast("float"))
      .agg(assemble(col("v")).as("cvec"))
    dom.crossJoin(broadcast(corp))
      .select(col("source"), col("n_docs"),
        round(VectorFunctions.cosine(col("dvec"), col("cvec")), 6)
          .as("centroid_sim"))
  }

  /** Per-domain KL vs the corpus: (source, n_tokens, vocab,
    * sum_micro_nats, kl_nats) — one row per domain, kl_nats rounded
    * to 6.
    */
  def unigramKl(docs: DataFrame, domainCol: String, textCol: String)
      : DataFrame = {
    val occ = docs.select(col(domainCol).as("source"),
      explode(TextFunctions.tokens(col(textCol))).as("t")).cache()
    val domCnt = occ.groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("cd"))
    val corpCnt = occ.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val domTot = occ.groupBy(col("source")).agg(count(lit(1)).as("nd"))
    val total = occ.agg(count(lit(1)).as("n"))
    domCnt
      .join(corpCnt, Seq("t"))
      .join(broadcast(domTot), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("qn",
        floor(log((col("cd") * col("n")).cast("double") /
          (col("c") * col("nd"))) * UnigramLm.MicroNats).cast("long"))
      .groupBy(col("source"))
      .agg(max(col("nd")).cast("long").as("n_tokens"),
        count(lit(1)).cast("int").as("vocab"),
        sum(col("cd") * col("qn")).as("sum_micro_nats"))
      .withColumn("kl_nats",
        round(col("sum_micro_nats").cast("double") / col("n_tokens")
          / UnigramLm.MicroNats, 6))
  }
}
