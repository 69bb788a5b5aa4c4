package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Knowledge graph as vertex/edge DataFrames (SURVEY §2.1 S9, §2.3 J7-J9,
  * §2.4 A17) — the reference's KuzuDB property graph
  * (`core/knowledge_graph.py:327-888`) re-expressed relationally:
  * vertices(id, label, name, file_path) + edges(src, dst, rel_type,
  * weight). Traversals are iterative frontier joins; each hop is one
  * hash join on the edge table, so a traversal distributes and the
  * frontier (bounded by caps, as the reference caps at depth 8 /
  * max_nodes) is the only state.
  *
  * Lineage control: each iteration localCheckpoints the frontier when it
  * loops more than a few hops (SURVEY §7 hard part (c)).
  */
object Kg {

  final case class KgTables(vertices: DataFrame, edges: DataFrame)

  /** Build entity/file/module vertices + CONTAINS/CALLS/IMPORTS/INHERITS
    * edges from a chunks table (`core/kg_builder.py:949-1236` semantics:
    * name-resolved via a global entity-name map, self-references dropped).
    */
  def fromChunks(chunks: DataFrame): KgTables = {
    val entities = chunks
      .filter(col("chunk_type").isin("function", "class", "method"))
      .select(
        concat(col("file_path"), lit("::"), col("hierarchy_path")).as("id"),
        col("chunk_type").as("label"),
        col("name"), col("file_path"), col("parent_name"))
    val files = chunks.select(col("file_path")).distinct()
      .select(col("file_path").as("id"), lit("file").as("label"),
        regexp_extract(col("file_path"), "([^/]+)$", 1).as("name"),
        col("file_path"), lit("").as("parent_name"))
    val modules = chunks
      .select(explode(col("imports")).as("m")).distinct()
      .select(col("m").as("id"), lit("module").as("label"),
        col("m").as("name"), lit("").as("file_path"), lit("").as("parent_name"))
    val vertices = entities.unionByName(files).unionByName(modules)
      .dropDuplicates("id")

    // file -CONTAINS-> top-level entity; class -CONTAINS-> method
    val containsFile = entities.filter(col("parent_name") === "")
      .select(col("file_path").as("src"), col("id").as("dst"),
        lit("CONTAINS").as("rel_type"))
    val containsClass = entities.filter(col("parent_name") =!= "")
      .select(
        concat(col("file_path"), lit("::"), col("parent_name")).as("src"),
        col("id").as("dst"), lit("CONTAINS").as("rel_type"))

    // name-resolution map (global prescan, `kg_builder.py:1237-1268`)
    val byName = entities.select(col("name").as("target_name"), col("id").as("dst"))

    val calls = chunks
      .filter(col("chunk_type").isin("function", "class", "method"))
      .select(
        concat(col("file_path"), lit("::"), col("hierarchy_path")).as("src"),
        explode(col("calls")).as("target_name"))
      .join(byName, Seq("target_name"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), lit("CALLS").as("rel_type"))

    val imports = chunks
      .select(col("file_path").as("src"), explode(col("imports")).as("dst"))
      .distinct()
      .select(col("src"), col("dst"), lit("IMPORTS").as("rel_type"))

    val inherits = chunks
      .filter(col("chunk_type") === "class")
      .select(
        concat(col("file_path"), lit("::"), col("hierarchy_path")).as("src"),
        explode(col("inherits_from")).as("target_name"))
      .join(byName, Seq("target_name"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"), lit("INHERITS").as("rel_type"))

    // frontmatter tags (kg_builder.py:2609-2640): `tags: [a, b]` in a
    // markdown <frontmatter> chunk → Tag vertices + file -HAS_TAG-> tag
    val tagEdges = chunks
      .filter(col("name") === "<frontmatter>")
      .select(col("file_path").as("src"),
        explode(split(regexp_extract(col("content"),
          "(?m)^tags:\\s*\\[([^\\]]*)\\]", 1), ",")).as("dst"))
      .select(col("src"), trim(col("dst")).as("dst"),
        lit("HAS_TAG").as("rel_type"))
      .filter(col("dst") =!= "")
    val tagVertices = tagEdges.select(col("dst")).distinct()
      .select(col("dst").as("id"), lit("tag").as("label"),
        col("dst").as("name"), lit("").as("file_path"), lit("").as("parent_name"))

    val edges = containsFile.unionByName(containsClass).unionByName(calls)
      .unionByName(imports).unionByName(inherits).unionByName(tagEdges)
      .withColumn("weight", lit(1.0))
      .dropDuplicates("src", "dst", "rel_type")
    KgTables(vertices.unionByName(tagVertices).dropDuplicates("id"), edges)
  }

  /** Multi-tag AND filter (`knowledge_graph.py:3104-3124`): nodes that
    * carry EVERY tag in `tags` via HAS_TAG edges.
    */
  def tagFilterAnd(edges: DataFrame, tags: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col => c}
    edges
      .filter(c("rel_type") === "HAS_TAG" && c("dst").isin(tags: _*))
      .groupBy(c("src").as("id"))
      .agg(countDistinct(c("dst")).as("n_tags"))
      .filter(c("n_tags") === tags.distinct.length)
      .select("id")
  }

  /** 1-hop neighbors, undirected (J7 — Cypher UNION of both directions). */
  def oneHop(edges: DataFrame, seedIds: DataFrame): DataFrame = {
    val s = seedIds.select(col("id"))
    val out = edges.join(s, edges("src") === s("id")).select(edges("dst").as("id"))
    val in = edges.join(s, edges("dst") === s("id")).select(edges("src").as("id"))
    out.unionByName(in).distinct()
  }

  /** Min-distance reachability up to maxHops following edges dst→src
    * (reverse) or src→dst. Output: (id, dist). (J8 semantics: DISTINCT
    * frontier per hop, hop cap.)
    */
  def minDist(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      reverse: Boolean = false): DataFrame = {
    val (from, to) = if (reverse) ("dst", "src") else ("src", "dst")
    var acc = seeds.select(col("id"), lit(0).as("dist"))
    var frontier = acc
    for (hop <- 1 to maxHops) {
      val next = edges.join(frontier, edges(from) === frontier("id"))
        .select(edges(to).as("id"), lit(hop).as("dist"))
        .distinct()
        .join(acc.select("id"), Seq("id"), "left_anti")
      frontier = if (hop >= 3) next.localCheckpoint(eager = true) else next
      acc = acc.unionByName(frontier)
    }
    acc.groupBy("id").agg(min("dist").as("dist"))
  }

  /** BFS with path capture and cycle detection (J9,
    * `knowledge_graph.py:3275-3390`): depth- and node-capped, keeps the
    * path as an array column, `array_contains` prevents revisits within
    * a path.
    */
  def bfsPaths(edges: DataFrame, srcId: String, maxDepth: Int = 8,
      maxPaths: Int = 1000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var paths = Seq((srcId, Array(srcId))).toDF("id", "path")
    var done = paths.limit(0)
    for (depth <- 1 to maxDepth) {
      val next = edges.join(paths, edges("src") === paths("id"))
        .filter(!array_contains(col("path"), col("dst")))
        .select(col("dst").as("id"),
          concat(col("path"), array(col("dst"))).as("path"))
        .limit(maxPaths)
      val checkpointed = if (depth >= 3) next.localCheckpoint(eager = true) else next
      done = done.unionByName(checkpointed)
      paths = checkpointed
    }
    done
  }

  /** Transitive closure of one relation type (INHERITS* —
    * `knowledge_graph.py:3601-3605`), iteration-capped.
    */
  def closure(edges: DataFrame, relType: String, maxHops: Int = 16): DataFrame = {
    val base = edges.filter(col("rel_type") === relType)
      .select(col("src"), col("dst"))
    var acc = base
    var frontier = base
    var hop = 1
    var growing = true
    while (growing && hop < maxHops) {
      val next = frontier.as("f").join(base.as("b"),
          col("f.dst") === col("b.src"))
        .select(col("f.src").as("src"), col("b.dst").as("dst"))
        .distinct()
        .join(acc, Seq("src", "dst"), "left_anti")
        .localCheckpoint(eager = true)
      growing = next.limit(1).count() > 0
      acc = acc.unionByName(next)
      frontier = next
      hop += 1
    }
    acc
  }

  /** A17 stats: counts per vertex label and edge rel_type. */
  def stats(kg: KgTables): (DataFrame, DataFrame) =
    (kg.vertices.groupBy("label").count(), kg.edges.groupBy("rel_type").count())

  /** Authorship subgraph from a change-log table (commit_hash, author,
    * file_path, ts): Person/Commit/File vertices, Person -AUTHORED->
    * Commit and Commit -MODIFIED-> File edges — the reference's
    * Person/AUTHORED/MODIFIED KG slice built from git history
    * (`core/knowledge_graph.py:611-705`, `core/kg_builder.py:2874-3075`).
    * Edges carry the change timestamp (null for AUTHORED) so temporal
    * filters push down to the edge scan.
    */
  def authorshipGraph(changes: DataFrame): KgTables = {
    val persons = changes.select(col("author")).distinct()
      .select(concat(lit("person:"), col("author")).as("id"),
        lit("person").as("label"), col("author").as("name"),
        lit("").as("file_path"), lit("").as("parent_name"))
    val commits = changes.select(col("commit_hash")).distinct()
      .select(concat(lit("commit:"), col("commit_hash")).as("id"),
        lit("commit").as("label"), col("commit_hash").as("name"),
        lit("").as("file_path"), lit("").as("parent_name"))
    val files = changes.select(col("file_path")).distinct()
      .select(col("file_path").as("id"), lit("file").as("label"),
        regexp_extract(col("file_path"), "([^/]+)$", 1).as("name"),
        col("file_path"), lit("").as("parent_name"))
    val authored = changes
      .select(concat(lit("person:"), col("author")).as("src"),
        concat(lit("commit:"), col("commit_hash")).as("dst"))
      .distinct()
      .select(col("src"), col("dst"), lit("AUTHORED").as("rel_type"),
        lit(null).cast("timestamp").as("ts"))
    val modified = changes
      .groupBy(col("commit_hash"), col("file_path"))
      .agg(max(col("ts")).as("ts"))
      .select(concat(lit("commit:"), col("commit_hash")).as("src"),
        col("file_path").as("dst"), lit("MODIFIED").as("rel_type"), col("ts"))
    KgTables(
      persons.unionByName(commits).unionByName(files).dropDuplicates("id"),
      authored.unionByName(modified))
  }

  /** Temporal co-change: files modified within [fromTs, toTs] by authors
    * who also changed `seedFile` in that window — the person←commit→file
    * 2-hop with the time predicate pushed onto the edge/change scan
    * (reference temporal KG queries, `knowledge_graph.py:3395-3521`).
    * The seed-author set is small → broadcast; no shuffle of the big side
    * beyond the final per-(author, file) aggregate.
    */
  def coChangedFiles(changes: DataFrame, seedFile: String,
      fromTs: org.apache.spark.sql.Column,
      toTs: org.apache.spark.sql.Column): DataFrame = {
    val win = changes.filter(col("ts").between(fromTs, toTs))
    val seedAuthors = win.filter(col("file_path") === seedFile)
      .select(col("author")).distinct()
    win.join(broadcast(seedAuthors), Seq("author"))
      .filter(col("file_path") =!= seedFile)
      .groupBy(col("author"), col("file_path"))
      .agg(count(lit(1)).as("n_changes"), max(col("ts")).as("last_ts"))
  }
}
