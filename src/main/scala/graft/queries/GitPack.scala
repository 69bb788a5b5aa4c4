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
  val RefSha = "c137"
  val CalleeName = "e7"

  /** Entity table for the temporal gates — one entity per document,
    * commit_sha 'c'||(doc_id%200) with every 11th entity left
    * uncommitted (exercises the reference's empty-sha exclusion).
    */
  private def entityTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("entity_id"),
      concat(lit("e"), col("doc_id") % 50).as("name"),
      when(col("doc_id") % 3 === 0, "function")
        .when(col("doc_id") % 3 === 1, "class")
        .otherwise("method").as("entity_type"),
      concat(lit("f"), col("doc_id") % 40).as("file_path"),
      when(col("doc_id") % 11 === 0, lit(""))
        .otherwise(concat(lit("c"), col("doc_id") % 200)).as("commit_sha"))

  /** Commit parent DAG over the ids present: c_i → c_(i-2^k), k=0..7 —
    * a skip-list-shaped history (merge commits included) whose ancestor
    * closure of c_i is every earlier commit, reachable in ≤8 hops.
    */
  private def parentTable(s: SparkSession, d: String): DataFrame = {
    val ids = Tables.documents(s, d)
      .select((col("doc_id") % 200).cast("int").as("i")).distinct()
    val offs = Seq(1, 2, 4, 8, 16, 32, 64, 128)
    val cand = ids.withColumn("o", explode(array(offs.map(lit): _*)))
      .filter(col("i") - col("o") >= 0)
      .select(col("i"), (col("i") - col("o")).as("p"))
    cand.join(ids.withColumnRenamed("i", "p"), Seq("p"), "left_semi")
      .select(concat(lit("c"), col("i")).as("commit_hash"),
        concat(lit("c"), col("p")).as("parent_hash"))
  }

  /** CALLS edge per entity: doc_id → (doc_id*31+7) mod 1000. */
  private def callsTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("src"),
      ((col("doc_id") * 31 + 7) % 1000).as("dst"),
      lit("CALLS").as("rel_type"))

  /** Function-metrics table for the engineer gate: the s11 chunk ranges
    * plus deterministic complexity/length/nesting/params spanning every
    * issue threshold.
    */
  private def functionTable(s: SparkSession, d: String): DataFrame =
    chunkTable(s, d)
      .withColumn("complexity", (col("chunk_id") % 25).cast("int"))
      .withColumn("func_len", ((col("chunk_id") % 7) * 20).cast("int"))
      .withColumn("nesting", (col("chunk_id") % 6).cast("int"))
      .withColumn("params", (col("chunk_id") % 8).cast("int"))

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
    }),

    // Temporal KG: entities whose commit is an ancestor of the ref —
    // iterative DAG closure + broadcast semi join.
    "g7_entities_at_commit" -> ((s, d) => {
      Kg.entitiesAtCommit(entityTable(s, d), parentTable(s, d), RefSha)
        .orderBy(col("entity_id"))
        .limit(200)
    }),

    // Temporal KG: callers of a named entity, ancestry-filtered.
    "g8_callers_at_commit" -> ((s, d) => {
      Kg.callersAtCommit(callsTable(s, d),
          entityTable(s, d).withColumnRenamed("entity_id", "id"),
          CalleeName, parentTable(s, d), RefSha)
        .orderBy(col("caller_id"))
        .limit(300)
    }),

    // Engineer quality profiles: blame-attributed function metrics,
    // severity-weighted issues, quality score per author.
    "g11_engineer_profiles" -> ((s, d) => {
      graft.analyze.Engineers.profiles(
          functionTable(s, d), blameTable(s, d), changesTable(s, d))
        .orderBy(col("quality_score").desc, col("author"))
    }),

    // S10 git-log source: `git log --pretty=format:@%H|%P|%an|%at
    // --numstat` raw text synthesized per repo residue (variable commit
    // counts, root commits with empty %P, merge commits with two
    // parents, multi-file numstat blocks), parsed by GitLog.parse and
    // rolled up per repo. The oracle recomputes every stat from the
    // generator arithmetic — the parser (block split, numstat filter,
    // parent-list split) is what's under test, end to end (the gh1
    // pattern applied to the git source).
    "s10_git_log" -> ((s, d) => {
      import s.implicits._
      val ks = Tables.documents(s, d)
        .select((col("doc_id") % 30).cast("int").as("k")).distinct().as[Int]
      val commits = ks.flatMap { k =>
        val n = (k % 5) + 2
        val raw = (0 until n).map { i =>
          val parents =
            if (i == 0) ""
            else s"c${k}_${i - 1}" +
              (if (i % 3 == 0 && i > 1) s" c${k}_${i - 2}" else "")
          val stats = (0 to i % 3).map(j => s"${j + k}\t$j\tf$j.py")
            .mkString("\n")
          s"@c${k}_$i|$parents|u${i % 3}|${1700000000L + k * 1000 + i * 10}\n$stats\n"
        }.mkString
        graft.ingest.GitLog.parse(raw).map(c => (k, c.commit_hash,
          c.ts.getTime / 1000, c.files_changed, c.insertions,
          c.deletions, c.parents.length))
      }.toDF("k", "commit_hash", "epoch", "files_changed", "insertions",
        "deletions", "n_parents")
      commits.groupBy(col("k")).agg(
        count(lit(1)).as("n_commits"),
        sum(col("files_changed")).cast("long").as("files_changed"),
        sum(col("insertions")).cast("long").as("insertions"),
        sum(col("deletions")).cast("long").as("deletions"),
        sum(when(col("n_parents") >= 2, 1L).otherwise(0L)).cast("long")
          .as("n_merges"),
        sum(when(col("n_parents") === 0, 1L).otherwise(0L)).cast("long")
          .as("n_roots"),
        min(col("epoch")).as("first_ts"),
        max(col("epoch")).as("last_ts"))
        .orderBy(col("k"))
    }),

    // A18 story phases: the commit log (one row per commit derived from
    // the change log) tiled into 5 equal-count phases of history order
    // by the two-pass prefix-sum rank — no unpartitioned ntile window —
    // with per-phase span/commit/author/file stats.
    "a18_story_phases" -> ((s, d) => {
      val commits = changesTable(s, d).groupBy(col("commit_hash"))
        .agg(min(col("author")).as("author"), min(col("ts")).as("ts"),
          countDistinct(col("file_path")).cast("int").as("files_changed"))
      graft.analyze.Analytics.storyPhases(commits, nPhases = 5)
        .select(col("phase"),
          unix_timestamp(col("phase_start")).as("phase_start"),
          unix_timestamp(col("phase_end")).as("phase_end"),
          col("n_commits").cast("long").as("n_commits"),
          col("n_authors").cast("long").as("n_authors"),
          col("files_changed").cast("long").as("files_changed"))
        .orderBy(col("phase"))
    }),

    // Issues story source (story/extractor.py:452-530): gh-CLI-shaped
    // JSON payloads parsed through the explicit schema, rolled into
    // per-state stats. The oracle computes the same stats from the
    // generator arithmetic directly, checking the parser end-to-end.
    "gh1_issue_stats" -> ((s, d) => {
      import graft.ingest.GhStory
      val k = col("k")
      val raw = Tables.documents(s, d)
        .select((col("doc_id") % 40).cast("int").as("k")).distinct()
        .select(concat(
          lit("[{\"number\": "), k,
          lit(", \"title\": \"Issue "), k, lit("\""),
          lit(", \"state\": \""),
          when(k % 3 === 0, "closed").otherwise("open"), lit("\""),
          lit(", \"labels\": "),
          when(k % 2 === 0, "[{\"name\": \"bug\"}]").otherwise("[]"),
          lit(", \"createdAt\": \"2024-01-"),
          lpad((k % 28 + 1).cast("string"), 2, "0"), lit("T00:00:00Z\""),
          when(k % 3 === 0, concat(lit(", \"closedAt\": \"2024-02-"),
            lpad((k * 3 % 28 + 1).cast("string"), 2, "0"),
            lit("T00:00:00Z\""))).otherwise(lit("")),
          lit(", \"body\": \"b\"}]")).as("payload"))
      GhStory.issueStats(GhStory.parseIssues(raw, "payload"))
        .orderBy(col("state"))
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

  private val entsCte =
    """ents AS (SELECT doc_id AS entity_id, 'e' || (doc_id % 50) AS name,
      |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'function'
      |      WHEN 1 THEN 'class' ELSE 'method' END AS entity_type,
      |    'f' || (doc_id % 40) AS file_path,
      |    CASE WHEN doc_id % 11 = 0 THEN ''
      |      ELSE 'c' || (doc_id % 200) END AS commit_sha
      |  FROM documents)""".stripMargin

  private val ancestryCtes =
    s"""ids AS (SELECT DISTINCT CAST(doc_id % 200 AS INTEGER) AS i
       |  FROM documents),
       |offs(o) AS (VALUES (1),(2),(4),(8),(16),(32),(64),(128)),
       |par AS (SELECT 'c' || i AS commit_hash, 'c' || (i - o) AS parent_hash
       |  FROM ids, offs WHERE i - o >= 0
       |    AND (i - o) IN (SELECT i FROM ids)),
       |anc AS (SELECT '$RefSha' AS h
       |  UNION
       |  SELECT p.parent_hash FROM anc JOIN par p ON p.commit_hash = anc.h)""".stripMargin

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
         |ORDER BY w.author, w.file_path LIMIT 300""".stripMargin,

    "g7_entities_at_commit" ->
      s"""WITH RECURSIVE $entsCte, $ancestryCtes
         |SELECT entity_id, name, entity_type, file_path, commit_sha
         |FROM ents
         |WHERE commit_sha <> '' AND commit_sha IN (SELECT h FROM anc)
         |ORDER BY entity_id LIMIT 200""".stripMargin,

    "g8_callers_at_commit" ->
      s"""WITH RECURSIVE $entsCte, $ancestryCtes,
         |calls AS (SELECT doc_id AS src, (doc_id * 31 + 7) % 1000 AS dst
         |  FROM documents)
         |SELECT c.src AS caller_id, e.name AS caller_name,
         |  e.file_path AS caller_file, e.commit_sha AS caller_commit_sha,
         |  ce.name AS callee_name
         |FROM calls c
         |JOIN ents ce ON ce.entity_id = c.dst AND ce.name = '$CalleeName'
         |JOIN ents e ON e.entity_id = c.src
         |WHERE e.commit_sha <> '' AND e.commit_sha IN (SELECT h FROM anc)
         |ORDER BY caller_id LIMIT 300""".stripMargin,

    "g11_engineer_profiles" ->
      s"""WITH $blameCte, $chunksCte, $changesCte,
         |fx0 AS (SELECT chunk_id,
         |    CAST(chunk_id % 25 AS INTEGER) AS complexity,
         |    CAST((chunk_id % 7) * 20 AS INTEGER) AS func_len,
         |    CAST(chunk_id % 6 AS INTEGER) AS nesting,
         |    CAST(chunk_id % 8 AS INTEGER) AS params,
         |    file_path, start_line
         |  FROM chunks),
         |attributed AS (SELECT b.author, f.complexity, f.func_len,
         |    f.nesting, f.params
         |  FROM fx0 f JOIN blame b ON b.file_path = f.file_path
         |    AND b.line = f.start_line),
         |fx AS (SELECT author, COUNT(*) AS n_functions,
         |    SUM((CASE WHEN complexity > 10 THEN 2 ELSE 0 END)
         |      + (CASE WHEN complexity > 20 THEN 5 ELSE 0 END)
         |      + (CASE WHEN func_len > 50 THEN 1 ELSE 0 END)
         |      + (CASE WHEN func_len > 100 THEN 3 ELSE 0 END)
         |      + (CASE WHEN nesting > 4 THEN 2 ELSE 0 END)
         |      + (CASE WHEN params > 5 THEN 1 ELSE 0 END)) AS issues,
         |    SUM(complexity) AS sum_cx
         |  FROM attributed GROUP BY author),
         |owned AS (SELECT author, COUNT(*) AS total_lines
         |  FROM blame GROUP BY author),
         |base AS (SELECT author, COUNT(DISTINCT commit_hash) AS n_commits
         |  FROM changes GROUP BY author
         |  HAVING COUNT(DISTINCT commit_hash) >= 1)
         |SELECT b.author, b.n_commits,
         |  COALESCE(o.total_lines, 0) AS total_lines,
         |  COALESCE(f.n_functions, 0) AS n_functions,
         |  CAST(COALESCE(f.issues, 0) AS BIGINT) AS issues,
         |  CASE WHEN COALESCE(f.n_functions, 0) > 0
         |    THEN round(CAST(f.sum_cx AS DOUBLE) / f.n_functions, 1)
         |    ELSE 0.0 END AS avg_complexity,
         |  CASE WHEN COALESCE(o.total_lines, 0) = 0 THEN 100.0
         |    ELSE round(greatest(0.0,
         |      100.0 - CAST(COALESCE(f.issues, 0) AS DOUBLE)
         |        / o.total_lines * 1000.0 * 10.0), 1) END AS quality_score
         |FROM base b LEFT JOIN owned o USING (author)
         |  LEFT JOIN fx f USING (author)
         |ORDER BY quality_score DESC, author""".stripMargin,

    "s10_git_log" ->
      """WITH ks AS (SELECT DISTINCT CAST(doc_id % 30 AS INTEGER) AS k
        |  FROM documents),
        |ci AS (SELECT k, unnest(generate_series(0, (k % 5) + 1)) AS i
        |  FROM ks),
        |agg AS (SELECT k, i, i % 3 AS m FROM ci)
        |SELECT k, CAST(count(*) AS BIGINT) AS n_commits,
        |  CAST(sum(m + 1) AS BIGINT) AS files_changed,
        |  CAST(sum((m + 1) * k + (m * (m + 1)) // 2) AS BIGINT)
        |    AS insertions,
        |  CAST(sum((m * (m + 1)) // 2) AS BIGINT) AS deletions,
        |  CAST(sum(CASE WHEN i % 3 = 0 AND i > 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_merges,
        |  CAST(sum(CASE WHEN i = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_roots,
        |  CAST(min(1700000000 + k * 1000 + i * 10) AS BIGINT) AS first_ts,
        |  CAST(max(1700000000 + k * 1000 + i * 10) AS BIGINT) AS last_ts
        |FROM agg GROUP BY k ORDER BY k""".stripMargin,

    "a18_story_phases" ->
      s"""WITH $changesCte,
         |commits AS (SELECT commit_hash, min(author) AS author,
         |    min(ts) AS ts, count(DISTINCT file_path) AS files_changed
         |  FROM changes GROUP BY commit_hash),
         |r AS (SELECT commit_hash, author, ts, files_changed,
         |    row_number() OVER (ORDER BY ts, commit_hash) AS rn,
         |    (SELECT count(*) FROM commits) AS nn
         |  FROM commits),
         |p AS (SELECT CAST(((rn - 1) * 5) // nn AS INTEGER) + 1 AS phase,
         |    author, ts, files_changed FROM r)
         |SELECT phase,
         |  CAST(floor(epoch(min(ts))) AS BIGINT) AS phase_start,
         |  CAST(floor(epoch(max(ts))) AS BIGINT) AS phase_end,
         |  CAST(count(*) AS BIGINT) AS n_commits,
         |  CAST(count(DISTINCT author) AS BIGINT) AS n_authors,
         |  CAST(sum(files_changed) AS BIGINT) AS files_changed
         |FROM p GROUP BY phase ORDER BY phase""".stripMargin,

    "gh1_issue_stats" ->
      """WITH ks AS (SELECT DISTINCT CAST(doc_id % 40 AS INTEGER) AS k
        |  FROM documents),
        |i AS (SELECT k,
        |    CASE WHEN k % 3 = 0 THEN 'closed' ELSE 'open' END AS state,
        |    k % 2 = 0 AS labeled,
        |    CASE WHEN k % 3 = 0
        |      THEN 31 + ((k * 3) % 28) - (k % 28) END AS days_open
        |  FROM ks)
        |SELECT state, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN labeled THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_with_labels,
        |  AVG(CAST(days_open AS DOUBLE)) AS avg_days_open,
        |  MIN(k) AS min_number, MAX(k) AS max_number
        |FROM i GROUP BY state ORDER BY state""".stripMargin)
}
