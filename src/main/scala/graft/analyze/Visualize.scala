package graft.analyze

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Visualization export — the data side of the reference's `visualize`
  * command family: the chunk-graph (directory / file / chunk nodes with
  * containment + hierarchy links) and the directory-treemap rollups its
  * HTML/JSON exporters render.
  *
  * Provenance: node/link construction mirrors
  * `cli/commands/visualize/graph_builder.py:334-730` (directory, file
  * and chunk nodes; dir_containment / file_containment /
  * chunk_hierarchy links); per-chunk quality metrics mirror
  * `graph_builder.py:22-120` (smell rules, quality score, complexity
  * grade); the treemap size metric is the per-node line rollup the
  * JSON exporter ships.
  *
  * Scale shape (100 TB): everything is a projection plus two
  * bounded-key aggregates — directory rows explode one prefix per path
  * segment (depth-bounded), files/dirs aggregate with map-side
  * combine, links are per-row derivations and one self-semi-join on
  * the (file, name) parent key. No windows, no driver-side state.
  *
  * Input chunk schema: (file_path, name, chunk_type, start_line,
  * end_line, complexity, n_params, nesting_depth, parent_name).
  */
object Visualize {

  private val QualityTypes = Seq("function", "method", "class")

  /** Per-chunk quality metrics (graph_builder.py:22-120): lines of
    * code, effective complexity (LOC/5 fallback when the stored score
    * is 0), the five smell rules, the complexity-and-smell quality
    * score, and the A-F grade.
    */
  def qualityMetrics(chunks: DataFrame): DataFrame = {
    val loc = (col("end_line") - col("start_line") + lit(1)).cast("long")
    val eff = when(col("complexity") === 0,
      greatest(lit(1.0), loc.cast("double") / lit(5.0)))
      .otherwise(col("complexity").cast("double"))
    val smellArr = filter(array(
      when(loc > 50, lit("Long Method")),
      when(col("n_params") > 5, lit("Too Many Parameters")),
      when(col("nesting_depth") > 4, lit("Deep Nesting")),
      when(col("complexity") > 10, lit("Complex Method")),
      when(col("chunk_type") === "class" && loc > 500, lit("God Class"))),
      x => x.isNotNull)
    val base = greatest(lit(0.0),
      lit(1.0) - least(col("eff_complexity") / lit(50.0), lit(1.0)))
    chunks
      .withColumn("lines_of_code", loc)
      .withColumn("eff_complexity", eff)
      .withColumn("smells", smellArr)
      .withColumn("smell_count", size(col("smells")))
      .withColumn("quality_score",
        round(greatest(lit(0.0),
          base - col("smell_count").cast("double") * lit(0.1)), 4))
      .withColumn("complexity_grade",
        when(col("eff_complexity") <= 5, "A")
          .when(col("eff_complexity") <= 10, "B")
          .when(col("eff_complexity") <= 20, "C")
          .when(col("eff_complexity") <= 50, "D")
          .otherwise("F"))
  }

  /** The uniform export schema: node rows and link rows union into one
    * frame (kind = 'N' | 'L'); non-applicable fields are null.
    */
  private val ExportCols: Seq[String] = Seq("kind", "id", "name",
    "node_type", "parent_id", "file_path", "depth", "start_line",
    "end_line", "lines_of_code", "complexity", "quality_score",
    "complexity_grade", "smell_count", "smells", "chunk_count",
    "file_count", "total_chunks", "total_loc",
    "source", "target", "link_type")

  private def aligned(df: DataFrame): DataFrame = {
    val have = df.columns.toSet
    df.select(ExportCols.map { c =>
      if (have(c)) col(c) else lit(null).as(c)
    }: _*)
  }

  private def dirOf(path: Column): Column = {
    val parts = split(path, "/")
    when(size(parts) > 1,
      concat_ws("/", slice(parts, lit(1), size(parts) - 1)))
  }

  /** Directory nodes: one per path prefix, with the treemap rollups
    * (file_count / total_chunks / total_loc) and the parent pointer
    * the containment links come from.
    */
  def dirNodes(chunks: DataFrame): DataFrame = {
    val parts = split(col("file_path"), "/")
    val prefixes = transform(sequence(lit(1), size(parts) - 1),
      i => concat_ws("/", slice(parts, lit(1), i)))
    chunks
      .withColumn("loc", (col("end_line") - col("start_line") + lit(1))
        .cast("long"))
      .select(col("file_path"), col("loc"), explode(prefixes).as("dir"))
      .groupBy(col("dir"))
      .agg(countDistinct(col("file_path")).as("file_count"),
        count(lit(1)).as("total_chunks"),
        sum(col("loc")).as("total_loc"))
      .select(lit("N").as("kind"),
        concat(lit("dir:"), col("dir")).as("id"),
        element_at(split(col("dir"), "/"), -1).as("name"),
        lit("directory").as("node_type"),
        when(dirOf(col("dir")).isNotNull,
          concat(lit("dir:"), dirOf(col("dir")))).as("parent_id"),
        col("dir").as("file_path"),
        size(split(col("dir"), "/")).as("depth"),
        col("file_count"), col("total_chunks"), col("total_loc"))
  }

  /** File nodes with chunk counts and line rollups. */
  def fileNodes(chunks: DataFrame): DataFrame =
    chunks
      .withColumn("loc", (col("end_line") - col("start_line") + lit(1))
        .cast("long"))
      .groupBy(col("file_path"))
      .agg(count(lit(1)).as("chunk_count"), sum(col("loc")).as("total_loc"))
      .select(lit("N").as("kind"),
        concat(lit("file:"), col("file_path")).as("id"),
        element_at(split(col("file_path"), "/"), -1).as("name"),
        lit("file").as("node_type"),
        when(dirOf(col("file_path")).isNotNull,
          concat(lit("dir:"), dirOf(col("file_path")))).as("parent_id"),
        col("file_path"),
        (size(split(col("file_path"), "/")) - 1).as("depth"),
        col("chunk_count"), col("total_loc"))

  /** Chunk nodes: quality metrics attached for function/method/class
    * rows (graph_builder.py:567-575 computes them for exactly those),
    * parent = enclosing chunk when one is named, else the file node.
    */
  def chunkNodes(chunks: DataFrame): DataFrame = {
    val q = qualityMetrics(chunks)
    val isQ = col("chunk_type").isin(QualityTypes: _*)
    q.select(lit("N").as("kind"),
      concat(lit("chunk:"), col("file_path"), lit(":"), col("name"))
        .as("id"),
      col("name"),
      col("chunk_type").as("node_type"),
      when(col("parent_name") =!= "",
        concat(lit("chunk:"), col("file_path"), lit(":"),
          col("parent_name")))
        .otherwise(concat(lit("file:"), col("file_path"))).as("parent_id"),
      col("file_path"),
      when(col("parent_name") =!= "", 2).otherwise(1).as("depth"),
      col("start_line"), col("end_line"),
      col("lines_of_code"),
      when(isQ, round(col("eff_complexity"), 4)).as("complexity"),
      when(isQ, col("quality_score")).as("quality_score"),
      when(isQ, col("complexity_grade")).as("complexity_grade"),
      when(isQ, col("smell_count")).as("smell_count"),
      // null (not "") when no smells — DuckDB's array_to_string of an
      // empty list is NULL, and null is the truer "nothing detected"
      when(isQ && col("smell_count") > 0, concat_ws(",", col("smells")))
        .as("smells"))
  }

  /** Containment/hierarchy links: dir→dir, dir→file, file→top-level
    * chunk, and class→method for parents that exist (the reference
    * guards `parent_chunk_id in chunk_id_map`).
    */
  def graphLinks(chunks: DataFrame): DataFrame = {
    val dirDir = dirNodes(chunks)
      .filter(col("parent_id").isNotNull)
      .select(col("parent_id").as("source"), col("id").as("target"),
        lit("dir_containment").as("link_type"))
    val dirFile = fileNodes(chunks)
      .filter(col("parent_id").isNotNull)
      .select(col("parent_id").as("source"), col("id").as("target"),
        lit("dir_containment").as("link_type"))
    val fileChunk = chunks.filter(col("parent_name") === "")
      .select(concat(lit("file:"), col("file_path")).as("source"),
        concat(lit("chunk:"), col("file_path"), lit(":"), col("name"))
          .as("target"),
        lit("file_containment").as("link_type"))
    val names = chunks.select(col("file_path"), col("name")).distinct()
    val chunkChunk = chunks.filter(col("parent_name") =!= "")
      .join(names.withColumnRenamed("name", "parent_name"),
        Seq("file_path", "parent_name"), "left_semi")
      .select(
        concat(lit("chunk:"), col("file_path"), lit(":"),
          col("parent_name")).as("source"),
        concat(lit("chunk:"), col("file_path"), lit(":"), col("name"))
          .as("target"),
        lit("chunk_hierarchy").as("link_type"))
    dirDir.unionByName(dirFile).unionByName(fileChunk)
      .unionByName(chunkChunk)
      .withColumn("kind", lit("L"))
  }

  /** The full graph export in one frame: every node and link row under
    * the uniform schema — what the reference's JSON exporter writes as
    * `{nodes, links}` (`exporters/json_exporter.py`), shaped as rows so
    * it writes straight to parquet/JSONL at corpus scale.
    */
  def graphExport(chunks: DataFrame): DataFrame =
    aligned(dirNodes(chunks))
      .unionByName(aligned(fileNodes(chunks)))
      .unionByName(aligned(chunkNodes(chunks)))
      .unionByName(aligned(graphLinks(chunks)))
}
