package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wiki concept extraction — the deterministic no-LLM path of the
  * reference's `wiki_generate` (`core/wiki.py:236-418, 614-633`): each
  * chunk contributes a concept SET (entity name, parent name, path
  * components minus noise directories, and the first ≤3 significant
  * words of the docstring's first sentence); concepts roll up to a
  * global frequency with a ≥2 floor, id'd by a 12-hex sha256. The
  * reference's LLM semantic-grouping phase degrades to exactly this
  * flat ontology when no model is reachable, which is the honest
  * sandbox surface — `LLMGrouper` is the drop-in point for the rest.
  *
  * One explode + one groupBy: no driver-side batching loop (the
  * reference pages through chunks 1000 at a time on one core).
  */
object Wiki {

  /** Path components dropped as concepts (`wiki.py:389`). */
  val PathStop: Seq[String] = Seq(".", "..", "src", "lib", "tests", "test")

  private def emptyStrArr: Column = array().cast("array<string>")

  /** The per-chunk concept set, as columns (`wiki.py:355-404`). */
  def conceptSet(name: Column, parentName: Column, filePath: Column,
      docstring: Column): Column = {
    val nameArr = when(name.isNotNull && name =!= "", array(name))
      .otherwise(emptyStrArr)
    val parentArr = when(parentName.isNotNull && parentName =!= "",
      array(parentName)).otherwise(emptyStrArr)
    val parts = filter(split(coalesce(filePath, lit("")), "/"),
      p => p =!= "" && !p.isin(PathStop: _*))
    val firstSentence =
      trim(element_at(split(coalesce(docstring, lit("")), "\\."), 1))
    // the reference filters on the ORIGINAL token (length, isalnum) and
    // emits the lowered form, capped at 3
    val words = slice(
      transform(
        filter(split(firstSentence, "\\s+"),
          w => length(w) > 3 && w.rlike("^[A-Za-z0-9]+$")),
        w => lower(w)),
      1, 3)
    array_distinct(concat(nameArr, parentArr, parts, words))
  }

  /** (chunk_id, concept) rows — one per distinct concept per chunk. */
  def conceptRows(chunks: DataFrame): DataFrame =
    chunks.select(col("chunk_id"),
      explode(conceptSet(col("name"), col("parent_name"), col("file_path"),
        col("docstring"))).as("name"))

  /** Flat ontology concepts: 12-hex sha256 id, name, chunk frequency,
    * noise floor ≥ `minFreq` (`wiki.py:290-295, 406-417`).
    */
  def concepts(chunks: DataFrame, minFreq: Int = 2): DataFrame =
    conceptRows(chunks)
      .groupBy(col("name"))
      // conceptSet is array_distinct'ed upstream, so (name, chunk_id) is
      // already unique per row — count(*) is equivalent to the distinct
      // count and partial-aggregable without the extra dedup shuffle
      .agg(count(lit(1)).as("frequency"))
      .filter(col("frequency") >= minFreq)
      .select(
        substring(sha2(concat(col("name"), lit(":")), 256), 1, 12)
          .as("concept_id"),
        col("name"), col("frequency"))
}
