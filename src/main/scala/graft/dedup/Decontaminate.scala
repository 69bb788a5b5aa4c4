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

  /** Semantic contamination — the third standard flavor beside the
    * n-gram and exact-substring tests: a corpus document is flagged
    * when its EMBEDDING is too close to any benchmark embedding
    * (catches paraphrased/reformatted benchmark copies that share no
    * literal n-gram). Output per contaminated doc: (doc_id, n_hits,
    * bench_id, sim) — hit count at `tau` plus the best-matching
    * benchmark item (ties broken to the smallest bench_id).
    *
    * Scale shape: eval sets are thousands of rows against a 100 TB
    * corpus, so the benchmark side broadcasts and the corpus streams
    * through one broadcast nested-loop scoring pass — O(corpus ×
    * bench) float dots, which at eval-set sizes is cheaper than
    * building any index. A benchmark too large to broadcast routes
    * through the persisted IVF layout instead (`graft.ann.Ivf`), same
    * contract.
    */
  def semanticContaminated(corpus: DataFrame, cIdCol: String,
      cVecCol: String, bench: DataFrame, bIdCol: String, bVecCol: String,
      tau: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val b = broadcast(bench.select(col(bIdCol).as("bench_id"),
      col(bVecCol).as("bvec")))
    corpus.select(col(cIdCol).as("doc_id"), col(cVecCol).as("cvec"))
      .crossJoin(b)
      .select(col("doc_id"), col("bench_id"),
        VectorFunctions.cosine(col("cvec"), col("bvec")).as("sim"))
      .filter(col("sim") >= tau)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_hits"),
        max(struct(col("sim").as("s"), (-col("bench_id")).as("nb"))).as("m"))
      .select(col("doc_id"), col("n_hits"),
        (-col("m.nb")).as("bench_id"), round(col("m.s"), 6).as("sim"))
  }

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
