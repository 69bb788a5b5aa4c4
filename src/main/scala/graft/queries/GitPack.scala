package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Kg
import graft.ingest.GitBlame
import graft.tables.Tables

/** Git-history pack: blame-range enrichment (S11), authorship KG
  * (Person/AUTHORED/MODIFIED), and temporal co-change traversal — the
  * reference's git integrations exercised over a deterministic change-log
  * DERIVED from the driver's events/documents tables (the testdata has no
  * git repo; real `git blame`/`git log` ingestion is covered by
  * GitBlameSpec/GraphAnalyticsSpec against live repos). Every derivation
  * is mirrored 1:1 in the DuckDB oracle.
  *
  * Derived tables:
  *  - blame(file_path, line, commit_hash, author, author_time):
  *    one line per event — file 'f'||(event_id%40), line event_id/40+1,
  *    commit 'c'||(event_id%200), author 'u'||(user_id%7), epoch seconds.
  *  - chunks(chunk_id, file_path, start_line, end_line): 25-line chunks
  *    per document — file 'f'||(doc_id%40), lines (doc_id/40)*25+1 .. +25.
  *  - changes(commit_hash, author, file_path, ts): from the same events.
  */
object GitPack {

  private def blameTable(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      concat(lit("f"), col("event_id") % 40).as("file_path"),
      (col("event_id") / 40 + 1).cast("int").as("line"),
      concat(lit("c"), col("event_id") % 200).as("commit_hash"),
      concat(lit("u"), col("user_id") % 7).as("author"),
      unix_timestamp(col("ts")).as("author_time"))

  private def chunkTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("chunk_id"),
      concat(lit("f"), col("doc_id") % 40).as("file_path"),
      ((col("doc_id") / 40).cast("long") * 25 + 1).cast("int").as("start_line"),
      ((col("doc_id") / 40).cast("long") * 25 + 25).cast("int").as("end_line"))

  private def changesTable(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      concat(lit("c"), col("event_id") % 200).as("commit_hash"),
      concat(lit("u"), col("user_id") % 7).as("author"),
      concat(lit("f"), col("event_id") % 40).as("file_path"),
      col("ts"))

  val WinFrom = "2024-01-05 00:00:00"
  val WinTo = "2024-02-01 00:00:00"
  val SeedFile = "f7"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S11: chunk authorship = most recent blame line in the chunk range.
    "s11_blame_enrich" -> ((s, d) => {
      GitBlame.enrichChunks(chunkTable(s, d), blameTable(s, d))
        .filter(col("last_author").isNotNull)
        .select(col("chunk_id"), col("last_author"), col("last_commit"),
          unix_timestamp(col("last_modified")).as("last_modified"))
        .orderBy(col("chunk_id"))
        .limit(200)
    }),

    // Authorship KG: per-relation edge stats over
    // Person/Commit/File/Branch/Repository.
    "g4_authorship_kg" -> ((s, d) => {
      val kg = Kg.authorshipGraph(changesTable(s, d), "graft", "main")
      kg.edges.groupBy(col("rel_type"))
        .agg(count(lit(1)).as("n_edges"),
          countDistinct(col("src")).as("n_src"),
          countDistinct(col("dst")).as("n_dst"))
        .orderBy(col("rel_type"))
    }),

    // Temporal co-change 2-hop with the window predicate pushed down.
    "g5_temporal_cochange" -> ((s, d) => {
      Kg.coChangedFiles(changesTable(s, d), SeedFile,
          lit(WinFrom).cast("timestamp"), lit(WinTo).cast("timestamp"))
        .select(col("author"), col("file_path"), col("n_changes"),
          unix_timestamp(col("last_ts")).as("last_ts"))
        .orderBy(col("author"), col("file_path"))
        .limit(300)
    }))

  // ---- oracle SQL ----------------------------------------------------

  private val blameCte =
    """blame AS (SELECT 'f' || (event_id % 40) AS file_path,
      |    CAST(event_id // 40 + 1 AS INTEGER) AS line,
      |    'c' || (event_id % 200) AS commit_hash,
      |    'u' || (user_id % 7) AS author,
      |    CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS author_time
      |  FROM events)""".stripMargin

  private val chunksCte =
    """chunks AS (SELECT doc_id AS chunk_id,
      |    'f' || (doc_id % 40) AS file_path,
      |    CAST((doc_id // 40) * 25 + 1 AS INTEGER) AS start_line,
      |    CAST((doc_id // 40) * 25 + 25 AS INTEGER) AS end_line
      |  FROM documents)""".stripMargin

  private val changesCte =
    """changes AS (SELECT 'c' || (event_id % 200) AS commit_hash,
      |    'u' || (user_id % 7) AS author,
      |    'f' || (event_id % 40) AS file_path,
      |    CAST(ts AS TIMESTAMP) AS ts
      |  FROM events)""".stripMargin

  def oracles: Map[String, String] = Map(
    "s11_blame_enrich" ->
      s"""WITH $blameCte, $chunksCte,
         |hits AS (SELECT c.chunk_id, b.author, b.commit_hash, b.author_time,
         |    row_number() OVER (PARTITION BY c.chunk_id
         |      ORDER BY b.author_time DESC, b.commit_hash DESC, b.author DESC)
         |      AS rn
         |  FROM chunks c JOIN blame b ON b.file_path = c.file_path
         |    AND b.line BETWEEN c.start_line AND c.end_line)
         |SELECT chunk_id, author AS last_author, commit_hash AS last_commit,
         |  author_time AS last_modified
         |FROM hits WHERE rn = 1 ORDER BY chunk_id LIMIT 200""".stripMargin,

    "g4_authorship_kg" ->
      s"""WITH $changesCte,
         |authored AS (SELECT DISTINCT 'person:' || author AS src,
         |    'commit:' || commit_hash AS dst, 'AUTHORED' AS rel_type
         |  FROM changes),
         |modifies AS (SELECT 'commit:' || commit_hash AS src,
         |    file_path AS dst, 'MODIFIES' AS rel_type
         |  FROM changes GROUP BY commit_hash, file_path),
         |modified AS (SELECT 'person:' || author AS src,
         |    file_path AS dst, 'MODIFIED' AS rel_type
         |  FROM changes GROUP BY author, file_path),
         |committed AS (SELECT DISTINCT 'commit:' || commit_hash AS src,
         |    'branch:graft/main' AS dst, 'COMMITTED_TO' AS rel_type
         |  FROM changes),
         |edges AS (SELECT src, dst, rel_type FROM authored
         |  UNION ALL SELECT src, dst, rel_type FROM modifies
         |  UNION ALL SELECT src, dst, rel_type FROM modified
         |  UNION ALL SELECT src, dst, rel_type FROM committed
         |  UNION ALL SELECT 'branch:graft/main', 'repo:graft', 'BELONGS_TO')
         |SELECT rel_type, COUNT(*) AS n_edges,
         |  COUNT(DISTINCT src) AS n_src, COUNT(DISTINCT dst) AS n_dst
         |FROM edges GROUP BY rel_type ORDER BY rel_type""".stripMargin,

    "g5_temporal_cochange" ->
      s"""WITH $changesCte,
         |win AS (SELECT * FROM changes
         |  WHERE ts BETWEEN '$WinFrom' AND '$WinTo'),
         |seed_authors AS (SELECT DISTINCT author FROM win
         |  WHERE file_path = '$SeedFile')
         |SELECT w.author, w.file_path, COUNT(*) AS n_changes,
         |  CAST(floor(epoch(MAX(w.ts))) AS BIGINT) AS last_ts
         |FROM win w JOIN seed_authors sa ON sa.author = w.author
         |WHERE w.file_path <> '$SeedFile'
         |GROUP BY w.author, w.file_path
         |ORDER BY w.author, w.file_path LIMIT 300""".stripMargin)
}
