package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.TextFunctions

/** Deterministic embedding (SURVEY §7 design stance): a seeded hash-n-gram
  * featurizer — HashingTF-style bucket projection of word unigrams +
  * bigrams, L2-normalized — so cosine results are exactly reproducible
  * and oracle-checkable. Swapping in a real model later means replacing
  * this object behind the same (id, text) → (id, vector) contract
  * (reference's pluggable embedding functions, `embeddings.py:1078-1113`).
  *
  * Fully relational: explode n-grams → bucket via the portable hash →
  * per-(id, bucket) integer counts → dense array + normalize. Integer
  * counts make the vector exactly order-independent, so the embedding of
  * a chunk is identical no matter how the corpus is partitioned — safe
  * at any scale, and identical for a 1-row query DataFrame.
  *
  * Context enrichment (reference `core/context_builder.py`, the 35-49%
  * retrieval win): prepend a "path | language | name" header to the text
  * before featurizing — done by `contextText`.
  */
object HashEmbedder {
  val Dim = 64

  def contextText(path: Column, language: Column, name: Column, content: Column): Column =
    concat_ws(" | ", path, language, name, content)

  /** (id, vector array<float>[Dim]) from (idCol, textCol). */
  def embed(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // materialize the token array in its OWN projection: inlining
    // tokens(text) into the generator re-evaluates the normalize regex
    // + split once per reference (3× here) — measured 5× slower on the
    // e2e gate than projecting first
    val toked = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val grams = toked.select(
      col("id"),
      explode(array_compact(concat(
        col("toks"),
        // word bigrams (zip_with pads the tail with null → compacted away)
        zip_with(col("toks"),
          slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
          (a, b) => concat(a, lit(" "), b))))).as("gram"))
    // the md5-chain portable hash runs once per DISTINCT gram, not per
    // occurrence (measured ~2× on the e2e gate; same values — the
    // bucket depends only on the gram). The string equi-join is the
    // UnigramLm vocabulary-join shape: hash-partitioned at scale, and
    // AQE broadcasts it when the vocabulary is small.
    val vocab = grams.select(col("gram")).distinct()
      .withColumn("bucket", pmod(PortableHash.hash60(col("gram"), 7), lit(Dim)).cast("int"))
    val buckets = grams.join(vocab, Seq("gram"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("w"))
    val dense = buckets
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("w")))).as("m"))
      .withColumn("raw", transform(sequence(lit(0), lit(Dim - 1)),
        i => coalesce(col("m")(i), lit(0L)).cast("double")))
      .withColumn("norm", sqrt(aggregate(col("raw"), lit(0.0d), (acc, x) => acc + x * x)))
      .withColumn("vector", transform(col("raw"),
        x => when(col("norm") > 0, x / col("norm")).otherwise(0.0).cast("float")))
      .select(col("id"), col("vector"))
    dense
  }

  /** Driver-side Scala mirror of [[embed]] for QUERY-sized inputs — the
    * same tokenize → unigram+bigram → portable-hash bucket → integer
    * count → L2-normalize chain, bit-identical to the Column version
    * (EmbedLocalSpec asserts equality element by element). Lets the
    * search gates build their handful of query vectors at plan time, so
    * a probe plan against the persisted corpus-vector registry contains
    * ZERO featurizer stages (no md5 chain, no explode) — the reference's
    * query-embed call is likewise a single local model invocation
    * (`embeddings.py:1078-1113`), never a corpus job.
    */
  def embedLocal(text: String): Array[Float] = {
    val norm = text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
    val toks = norm.split(" ", -1)
    val grams = toks ++ toks.iterator.sliding(2).withPartial(false)
      .map(p => p(0) + " " + p(1))
    val raw = new Array[Double](Dim)
    grams.foreach { g =>
      raw((PortableHash.hash60Local("7", g) % Dim).toInt) += 1.0
    }
    // same left-fold order as functions.aggregate over the raw array
    val n = math.sqrt(raw.foldLeft(0.0d)((acc, x) => acc + x * x))
    raw.map(x => if (n > 0) (x / n).toFloat else 0.0f)
  }

  /** S12 embedding cache: a Parquet KV table keyed by sha2(text). Cached
    * rows skip featurization (a left join, not an LRU — the reference's
    * disk cache `embeddings.py:284-404` re-expressed); misses are embedded
    * and appended back. With a real model behind the Embedder contract
    * this is the operator that saves the GPU pass.
    */
  def embedWithCache(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
      idCol: String, textCol: String, cachePath: String): DataFrame = {
    val keyed = docs.select(col(idCol).as("id"), col(textCol).as("text"),
      sha2(col(textCol), 256).as("content_sha"))
    // explicit existence probe + listing refresh: under Spark 4's lazy
    // analysis a try/catch around `read.parquet` never fires (the
    // missing-path failure is stored and rethrown at the first action,
    // far from any handler), and a caller that deleted the path leaves
    // a stale shared FileStatusCache listing behind
    val hPath = new org.apache.hadoop.fs.Path(cachePath)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    val cache: DataFrame =
      if (fs.exists(hPath)) {
        spark.catalog.refreshByPath(cachePath)
        spark.read.parquet(cachePath)
      } else
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "content_sha STRING, vector ARRAY<FLOAT>"))
    val misses = keyed.join(cache.select("content_sha"), Seq("content_sha"), "left_anti")
    val fresh = embed(misses, "id", "text")
    val freshKeyed = fresh.join(keyed.select(col("id"), col("content_sha")), Seq("id"))
    // dedup WITHIN the miss batch only (two miss docs can share a text
    // → one sha); the anti-join already guarantees no overlap with the
    // stored cache, so new rows APPEND — a warm pass rewrites miss-sized
    // bytes, not the whole (corpus-sized at 100 TB) cache
    val newRows = freshKeyed.select(col("content_sha"), col("vector"))
      .dropDuplicates("content_sha")
    if (fs.exists(hPath))
      newRows.write.mode("append").parquet(cachePath)
    else
      graft.index.IndexStore.overwriteSafe(spark, newRows, cachePath)
    // after the swap every requested row is a cache hit; serve the result
    // from the fresh listing — a pre-swap `hits` plan would hold the old
    // (deleted) file list. Defensive dedup (ADVICE r8): append mode no
    // longer carries the staging+swap uniqueness guarantee, so a failed/
    // retried or concurrent run can leave duplicate shas in the store —
    // and every stored vector for one sha is identical (deterministic
    // featurizer of the text the sha names), so any-per-id is exact,
    // not a choice among variants. Dedup the REQUEST-sized join output
    // by id — never the corpus-sized cache (that would be a full-cache
    // shuffle on every serve).
    spark.catalog.refreshByPath(cachePath)
    keyed.join(spark.read.parquet(cachePath), Seq("content_sha"))
      .select(col("id"), col("vector"))
      .dropDuplicates("id")
  }
}
