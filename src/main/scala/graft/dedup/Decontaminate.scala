package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step the
  * reference's corpus tooling stops short of: remove corpus documents
  * that share word n-grams with an evaluation set, the standard
  * collision test used to keep benchmarks out of training mixes
  * (n-gram overlap, typically n ≈ 13 for natural text; parameterized).
  *
  * Spark-first shape: distinct n-grams per side, one equi-join on the
  * n-gram, partial-aggregated pair counts. The benchmark side is the
  * small one by construction (eval sets are thousands of docs against a
  * 100 TB corpus), so it is broadcast EXPLICITLY — the corpus side
  * streams, nothing shuffles on corpus size. Exact matching, no
  * banding: decontamination wants recall on literal collisions, and the
  * join key is already the n-gram itself.
  */
object Decontaminate {

  /** (doc_id, bench_id, shared) for every corpus×benchmark pair sharing
    * at least `minShared` DISTINCT n-grams.
    */
  def overlapPairs(corpus: DataFrame, cTextCol: String, cIdCol: String,
      bench: DataFrame, bTextCol: String, bIdCol: String,
      n: Int = 13, minShared: Int = 1,
      broadcastBench: Boolean = true): DataFrame = {
    // docShingles explodes array_distinct'd shingles, so (doc_id,
    // shingle) is ALREADY distinct — no dedup shuffle of the
    // corpus-side relation here
    val cg = Dedup.docShingles(
      corpus.select(col(cIdCol).as("doc_id"), col(cTextCol).as("text")),
      "text", "doc_id", n)
    val bg0 = Dedup.docShingles(
      bench.select(col(bIdCol).as("doc_id"), col(bTextCol).as("text")),
      "text", "doc_id", n)
      .withColumnRenamed("doc_id", "bench_id")
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    cg.join(bg, Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Exact-substring contamination — the other standard flavor beside
    * the n-gram collision test: a corpus doc is flagged when any eval
    * probe string appears in it VERBATIM (raw characters, not
    * normalized tokens — catches formatting-preserving copies the
    * token n-grams also catch plus sub-token-boundary matches).
    * Output: (doc_id, n_hits, first_bench_id) per contaminated doc.
    *
    * Scale shape: probes are eval-set-sized by construction, so the
    * probe relation broadcasts and the corpus streams through one
    * nested-loop contains filter — a deliberate broadcast
    * nested-loop, NOT a corpus cartesian (the probe side is the small
    * fixed one; `contains` has no join key to hash on).
    */
  def substringContaminated(corpus: DataFrame, cTextCol: String,
      cIdCol: String, probes: DataFrame, pTextCol: String,
      pIdCol: String): DataFrame =
    corpus.select(col(cIdCol).as("doc_id"), col(cTextCol).as("text"))
      .crossJoin(broadcast(probes.select(col(pIdCol).as("bench_id"),
        col(pTextCol).as("probe"))))
      .filter(col("text").contains(col("probe")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_hits"),
        min(col("bench_id")).as("first_bench_id"))

  /** The corpus minus every document contaminated against `bench` —
    * one anti-join on the flagged ids.
    */
  def decontaminate(corpus: DataFrame, cTextCol: String, cIdCol: String,
      bench: DataFrame, bTextCol: String, bIdCol: String,
      n: Int = 13, minShared: Int = 1): DataFrame = {
    val flagged = overlapPairs(corpus, cTextCol, cIdCol,
      bench, bTextCol, bIdCol, n, minShared)
      .select(col("doc_id").as(cIdCol)).distinct()
    corpus.join(flagged, Seq(cIdCol), "left_anti")
  }
}
