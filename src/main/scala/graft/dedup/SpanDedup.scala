package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.TextFunctions

/** Repeated-substring span coverage at token n-gram granularity — the
  * detection half of suffix-array substring dedup (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499): an n-gram that occurs more than once ANYWHERE in
  * the corpus (across docs or repeated within one doc) marks all n of
  * its token positions as duplicated text; per document we report the
  * exact number of token positions covered by at least one duplicated
  * n-gram (the interval union of the hit windows) and the covered
  * fraction — the score a pipeline thresholds to drop or trim
  * boilerplate-heavy documents.
  *
  * Scale: one posexplode pass (×(len−n+1) rows, same asymptotics as
  * every shingle pass in `Dedup`), a map-side-combined groupBy on the
  * 60-bit gram hash, an equi-join back on the same key, and the
  * interval union as a SINGLE window PARTITIONED by doc (positions are
  * unique per doc, so the running-max-end ordering is deterministic).
  * No pair-finding at all — cost is linear in corpus token count, which
  * is what makes this the 100 TB alternative to a literal suffix array.
  */
object SpanDedup {

  /** One row per input doc: `doc_id`, `n_tokens`, `dup_positions`
    * (tokens covered by duplicated n-grams), `dup_fraction` (rounded
    * to 6; 0.0 for docs shorter than n tokens).
    */
  def dupSpanCoverage(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    // (doc, 0-based start pos, gram hash) — one row per n-gram window
    val occ = base.filter(col("n_tokens") >= n)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), col("n_tokens") - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))))
      .select(col("doc_id"), col("pos"),
        PortableHash.hash60(lit("span"), col("col")).as("g"))
    val dupGrams = occ.groupBy(col("g"))
      .agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") > 1)
      .select(col("g"))
    // interval union per doc: contribution of window [pos, pos+n) is
    // its length minus the overlap with the running max end so far
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val covered = occ.join(dupGrams, Seq("g"))
      .withColumn("e", col("pos") + n)
      .withColumn("pe", max(col("e")).over(w))
      .withColumn("inc",
        greatest(lit(0), col("e") -
          greatest(col("pos"), coalesce(col("pe"), col("pos")))))
      .groupBy(col("doc_id"))
      .agg(sum(col("inc")).cast("long").as("dup_positions"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(covered, Seq("doc_id"), "left")
      .withColumn("dup_positions", coalesce(col("dup_positions"), lit(0L)))
      .withColumn("dup_fraction",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("dup_positions") / col("n_tokens"), 6)))
  }

  /** The REMOVAL half of substring dedup (Lee et al. 2022 §3): cut
    * every token covered by a corpus-duplicated n-gram out of the text.
    * Output: `doc_id`, `n_tokens`, `n_removed`, `clean_text` (kept
    * tokens re-joined in order; "" when everything was duplicated).
    *
    * Per-token coverage WITHOUT a range join or a ×n explode: window
    * starts and token positions merge into one event stream per doc
    * (windows sort before the tokens they cover), and a token at p is
    * covered iff the running max of window ends over events ≤ p
    * exceeds p — the same doc-partitioned single-window shape as the
    * coverage metric, linear in corpus tokens.
    */
  def removeDupSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
    val occ = base.filter(col("n_tokens") >= n)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), col("n_tokens") - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n))))))
      .select(col("doc_id"), col("pos"),
        PortableHash.hash60(lit("span"), col("col")).as("g"))
    val dupGrams = occ.groupBy(col("g"))
      .agg(count(lit(1)).as("occurrences"))
      .filter(col("occurrences") > 1)
      .select(col("g"))
    // event stream: kind 0 = dup-window start (carries end), kind 1 =
    // token (carries its text); windows at pos p sort before token p
    val winEvents = occ.join(dupGrams, Seq("g"))
      .select(col("doc_id"), col("pos"), lit(0).as("kind"),
        (col("pos") + n).as("e"), lit(null).cast("string").as("tok"))
    val tokEvents = base
      .select(col("doc_id"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos"), lit(1).as("kind"),
        lit(null).cast("int").as("e"), col("tok"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val marked = winEvents.unionByName(tokEvents)
      .withColumn("cover_end", max(col("e")).over(w))
      .filter(col("kind") === 1)
      .withColumn("covered",
        coalesce(col("cover_end") > col("pos"), lit(false)))
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_tokens"),
        sum(when(col("covered"), 1).otherwise(0)).cast("int")
          .as("n_removed"),
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(!col("covered"), struct(col("pos"), col("tok"))))),
          s => s.getField("tok"))).as("clean_text"))
  }
}
