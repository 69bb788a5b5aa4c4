package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J11: doc-section ↔ code-entity DOCUMENTS edges.
  *
  * Scoring per the reference `kg_builder.py:2663-2744`
  * (`_compute_documents_score` / `_is_readme_for_directory`):
  *   +0.4 entity name in section title, +0.2 mentioned ≥2× in content
  *   (+0.1 for exactly one mention), +0.3 README in the entity's
  *   directory or its parent, +0.1 entity-type contextual keyword in
  *   content; edge kept at score ≥ 0.5. Generic entity names are
  *   filtered first (`kg_builder.py:345-369` + GENERIC_ENTITY_NAMES).
  *
  * Scale shape: the reference double-loops sections × entities on one
  * core (`kg_builder.py:2809-2847`). Here the (generic-filtered) entity
  * table broadcasts — code entities are bounded while doc volume grows —
  * and the substring scoring runs as codegen'd column algebra inside the
  * broadcast nested-loop join, so doc partitions stream independently.
  */
object DocLinks {

  /** `kg_builder.py:70-151`. */
  val GenericEntityNames: Set[String] = Set(
    "main", "run", "test", "get", "set", "init", "__init__", "__main__",
    "setup", "config", "name", "value", "data", "result", "results",
    "item", "items", "key", "keys", "args", "kwargs", "self", "cls",
    "a", "b", "c", "d", "e", "f", "i", "j", "k", "n", "x", "y", "z",
    "id", "db", "fn", "cb", "err", "msg", "req", "res", "ctx", "env",
    "add", "delete", "remove", "update", "create", "read", "write",
    "load", "save", "parse", "process", "handle", "execute",
    "file", "path", "module", "class", "function", "method", "list",
    "dict", "string", "int", "bool", "none", "tests", "fixture", "mock")

  val TypeKeywords: Map[String, Seq[String]] = Map(
    "function" -> Seq("function", "method", "returns", "parameters", "args"),
    "method" -> Seq("function", "method", "returns", "parameters", "args"),
    "class" -> Seq("class", "instance", "object", "inherits", "extends"),
    "module" -> Seq("module", "package", "import", "library"))

  def isGenericEntity(name: Column): Column =
    name.isNull || length(name) <= 2 ||
      lower(name).isin(GenericEntityNames.toSeq: _*) ||
      (name.startsWith("_") && !name.startsWith("__"))

  /** Directory part of a path ("" when the path has no slash). */
  def dirOf(p: Column): Column = regexp_extract(p, "^(.*)/[^/]*$", 1)

  /** README.{md,rst,txt} in the code file's directory or its parent. */
  def isReadmeFor(docPath: Column, codePath: Column): Column = {
    val docFile = lower(regexp_extract(docPath, "([^/]+)$", 1))
    val codeDir = dirOf(codePath)
    docFile.isin("readme.md", "readme.rst", "readme.txt") &&
      (dirOf(docPath) === codeDir || dirOf(docPath) === dirOf(codeDir))
  }

  /** Non-overlapping substring occurrence count (Python str.count). */
  def mentionCount(haystack: Column, needle: Column): Column =
    ((length(haystack) - length(replace(haystack, needle, lit("")))) /
      length(needle)).cast("int")

  /** The 0.0-1.0 relevance score; inputs are raw (un-lowered) columns. */
  def documentsScore(docName: Column, docContent: Column, docPath: Column,
      entityName: Column, entityType: Column, entityPath: Column): Column = {
    val nameL = lower(entityName)
    val contentL = lower(docContent)
    val mentions = mentionCount(contentL, nameL)
    val kwHit = (kws: Seq[String]) =>
      kws.map(k => contentL.contains(k)).reduce(_ || _)
    val keywordScore = TypeKeywords.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (tpe, kws)) =>
        when(entityType === tpe && kwHit(kws), 0.1).otherwise(acc)
      }
    least(lit(1.0),
      when(lower(docName).contains(nameL), 0.4).otherwise(0.0) +
        when(mentions >= 2, 0.2).when(mentions === 1, 0.1).otherwise(0.0) +
        when(isReadmeFor(docPath, entityPath), 0.3).otherwise(0.0) +
        keywordScore)
  }

  /** DOCUMENTS edges: sections(section_id, name, content, file_path) ×
    * entities(entity_id, name, entity_type, file_path) → (section_id,
    * entity_id, rel_type, weight) for weight ≥ threshold.
    */
  def documentsEdges(sections: DataFrame, entities: DataFrame,
      threshold: Double = 0.5): DataFrame = {
    val ents = entities
      .filter(!isGenericEntity(col("name")))
      .select(col("entity_id"), col("name").as("entity_name"),
        col("entity_type"), col("file_path").as("entity_path"))
    sections
      .select(col("section_id"), col("name").as("doc_name"),
        col("content"), col("file_path").as("doc_path"))
      .crossJoin(broadcast(ents))
      .withColumn("weight", documentsScore(
        col("doc_name"), col("content"), col("doc_path"),
        col("entity_name"), col("entity_type"), col("entity_path")))
      .filter(col("weight") >= threshold)
      .select(col("section_id"), col("entity_id"),
        lit("documents").as("rel_type"), col("weight"))
  }
}
