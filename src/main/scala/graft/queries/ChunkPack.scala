package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.chunk.Chunker
import graft.core.FileRecord
import graft.tables.Tables

/** Chunker pack (S3 + A8): the parse/chunk operator — the reference's
  * core value proposition (`parsers/base.py:12-299` + 13 grammars) —
  * CORRECTNESS-gated, not just spec'd.
  *
  * Fixture synthesis (the er1/c4f1 pattern): one source file per
  * `doc_id % 50` residue, language cycling python/go/markdown, each
  * file a FIXED template parameterized only by the residue — bodies
  * vary in CONTENT (if/while vs plain statements, nested-if ladders of
  * residue-dependent depth) but keep deterministic line arithmetic, so
  * every expected chunk row (name, type, parent, hierarchy, 1-based
  * inclusive line range, signature, docstring, cyclomatic/cognitive/
  * nesting, token/call/import/param counts, return type, inherits) is
  * SQL-computable from the residue alone. The oracle rebuilds the
  * expected rows from that arithmetic — the same golden-invariant
  * contract as the reference's per-language parser tests
  * (`tests/test_go_parser.py`, `test_java_parser.py`), executed as a
  * hash-compared gate. Grammar edge cases beyond the template live in
  * ChunkerSpec/GoJavaChunkerSpec/LangChunkerSpec/FidelitySpec.
  *
  * Scale shape: chunking is a pure flatMap over the file Dataset —
  * embarrassingly parallel, no shuffle until the output ordering.
  */
object ChunkPack {

  /** Python template: module header (2 imports), a class with docstring
    * + two methods (one body control-flow-bearing only for even
    * residues), and a top-level function whose nested-if ladder depth
    * d = (v%4)*2+1 spans complexity grades A-D.
    */
  private def pyContent(v: Int): String = {
    val b = v % 5
    val even = v % 2 == 0
    val d = (v % 4) * 2 + 1
    val base = Seq(
      "import os",
      "from sys import path",
      "",
      s"class C$v(Base$b):",
      "    \"\"\"Class " + v + " docs.\"\"\"",
      s"    def ma$v(self, x):",
      "        if x > 0 and x < 9:",
      "            return x",
      s"    def mb$v(self):",
      if (even) "        while x:" else "        return 1",
      if (even) "            x -= 1" else "",
      "",
      s"def f$v(a, b):") ++
      (0 until d).map(i => "    " * (i + 1) + s"if a > $i:") :+
      ("    " * (d + 1) + "return b")
    base.mkString("\n")
  }

  /** Go template: package header, a struct, a receiver method (typed
    * params + return type), a top-level function.
    */
  private def goContent(v: Int): String = Seq(
    "package main",
    "",
    s"type T$v struct {",
    "    x int",
    "}",
    "",
    s"func (t *T$v) Get$v(a int) int {",
    "    if a > 0 {",
    "        return a",
    "    }",
    "    return t.x",
    "}",
    "",
    s"func Add$v(a int, b int) int {",
    "    return a + b",
    "}").mkString("\n")

  /** Markdown template: an h1 with two nested h2 sections. */
  private def mdContent(v: Int): String = Seq(
    s"# Title $v",
    s"intro text $v",
    s"## Sec A$v",
    "body a",
    s"## Sec B$v",
    "body b words here").mkString("\n")

  private[queries] def mkFile(v: Int): FileRecord = {
    val (path, language, content) = (v % 3) match {
      case 0 => (s"src/m$v.py", "python", pyContent(v))
      case 1 => (s"src/g$v.go", "go", goContent(v))
      case _ => (s"docs/d$v.md", "markdown", mdContent(v))
    }
    FileRecord(path, language, file_hash = s"h$v",
      mtime = new java.sql.Timestamp(0L),
      size_bytes = content.length.toLong, content = content)
  }

  /** The distributed chunk pass over the synthesized corpus: one task
    * per partition of residues, `Chunker.chunkFile` via flatMap.
    */
  private[queries] def sourceChunks(s: SparkSession, d: String)
      : Dataset[graft.core.CodeChunk] = {
    import s.implicits._
    Tables.documents(s, d)
      .select((col("doc_id") % 50).cast("int").as("v"))
      .distinct().as[Int]
      .flatMap(v => Chunker.chunkFile(mkFile(v)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S3: every extracted chunk's full invariant row.
    "s3_chunker" -> ((s, d) => {
      sourceChunks(s, d).toDF().select(
        col("file_path"), col("start_line"), col("end_line"),
        col("chunk_type"), col("name"), col("parent_name"),
        col("hierarchy_path"), col("signature"), col("docstring"),
        col("complexity"), col("cognitive_complexity"),
        col("nesting_depth"), col("token_count"),
        size(col("calls")).as("n_calls"),
        size(col("imports")).as("n_imports"),
        size(col("parameters")).as("n_params"),
        col("return_type"),
        coalesce(expr("try_element_at(inherits_from, 1)"), lit(""))
          .as("first_inherit"))
        .orderBy(col("file_path"), col("start_line"))
    }),

    // A8: per-function complexity metrics + the metrics.py grade ladder
    // over the same corpus (ladder depths span A through D).
    "a8_complexity_metrics" -> ((s, d) => {
      sourceChunks(s, d).toDF()
        .filter(col("chunk_type").isin("function", "method"))
        .select(col("file_path"), col("name"), col("complexity"),
          col("cognitive_complexity"), col("nesting_depth"),
          graft.analyze.Analytics.complexityGrade(
            col("cognitive_complexity")).as("grade"))
        .orderBy(col("file_path"), col("name"))
    }))

  // ---- oracle SQL ----------------------------------------------------

  /** Shared residue CTEs: py carries the parity/depth arithmetic. */
  private val residueCtes =
    """rs AS (SELECT DISTINCT CAST(doc_id % 50 AS INTEGER) AS v
      |  FROM documents),
      |py AS (SELECT v, v % 5 AS b, v % 2 = 0 AS ev,
      |    (v % 4) * 2 + 1 AS d FROM rs WHERE v % 3 = 0),
      |gg AS (SELECT v FROM rs WHERE v % 3 = 1),
      |md AS (SELECT v FROM rs WHERE v % 3 = 2)""".stripMargin

  def oracles: Map[String, String] = Map(
    "s3_chunker" ->
      s"""WITH $residueCtes,
         |out AS (
         |  SELECT 'src/m' || v || '.py' AS file_path, 1 AS start_line,
         |    3 AS end_line, 'code' AS chunk_type, '<module>' AS name,
         |    '' AS parent_name, '<module>' AS hierarchy_path,
         |    '' AS signature, '' AS docstring, 1 AS complexity,
         |    0 AS cognitive_complexity, 0 AS nesting_depth,
         |    6 AS token_count, 0 AS n_calls, 2 AS n_imports,
         |    0 AS n_params, '' AS return_type, '' AS first_inherit
         |  FROM py
         |  UNION ALL
         |  SELECT 'src/m' || v || '.py', 4,
         |    CASE WHEN ev THEN 11 ELSE 10 END, 'class', 'C' || v, '',
         |    'C' || v, 'class C' || v || '(Base' || b || '):',
         |    'Class ' || v || ' docs.',
         |    CASE WHEN ev THEN 3 ELSE 2 END,
         |    CASE WHEN ev THEN 3 ELSE 2 END, 1,
         |    CASE WHEN ev THEN 25 ELSE 23 END, 0, 0, 0, '', 'Base' || b
         |  FROM py
         |  UNION ALL
         |  SELECT 'src/m' || v || '.py', 6, 8, 'method', 'ma' || v,
         |    'C' || v, 'C' || v || '.ma' || v,
         |    'def ma' || v || '(self, x):', '', 2, 2, 1, 12, 0, 0, 1,
         |    '', ''
         |  FROM py
         |  UNION ALL
         |  SELECT 'src/m' || v || '.py', 9,
         |    CASE WHEN ev THEN 11 ELSE 10 END, 'method', 'mb' || v,
         |    'C' || v, 'C' || v || '.mb' || v,
         |    'def mb' || v || '(self):', '',
         |    CASE WHEN ev THEN 2 ELSE 1 END,
         |    CASE WHEN ev THEN 1 ELSE 0 END,
         |    CASE WHEN ev THEN 1 ELSE 0 END,
         |    CASE WHEN ev THEN 7 ELSE 5 END, 0, 0, 0, '', ''
         |  FROM py
         |  UNION ALL
         |  SELECT 'src/m' || v || '.py', 13, 14 + d, 'function',
         |    'f' || v, '', 'f' || v, 'def f' || v || '(a, b):', '',
         |    1 + d, d + (d * (d - 1)) // 2, d, 6 + 3 * d, 0, 0, 2,
         |    '', ''
         |  FROM py
         |  UNION ALL
         |  SELECT 'src/g' || v || '.go', 1, 2, 'code', '<module>', '',
         |    '<module>', '', '', 1, 0, 0, 2, 0, 0, 0, '', ''
         |  FROM gg
         |  UNION ALL
         |  SELECT 'src/g' || v || '.go', 3, 5, 'struct', 'T' || v, '',
         |    'T' || v, 'type T' || v || ' struct {', '', 1, 0, 0, 5,
         |    0, 0, 0, '', ''
         |  FROM gg
         |  UNION ALL
         |  SELECT 'src/g' || v || '.go', 7, 12, 'method', 'Get' || v,
         |    'T' || v, 'T' || v || '.Get' || v,
         |    'func (t *T' || v || ') Get' || v || '(a int) int {', '',
         |    2, 1, 1, 15, 0, 0, 1, 'int', ''
         |  FROM gg
         |  UNION ALL
         |  SELECT 'src/g' || v || '.go', 14, 16, 'function',
         |    'Add' || v, '', 'Add' || v,
         |    'func Add' || v || '(a int, b int) int {', '', 1, 0, 0,
         |    10, 0, 0, 2, 'int', ''
         |  FROM gg
         |  UNION ALL
         |  SELECT 'docs/d' || v || '.md', 1, 6, 'doc_section',
         |    'Title ' || v, '', 'Title ' || v, '# Title ' || v, '',
         |    1, 0, 0, 15, 0, 0, 0, '', ''
         |  FROM md
         |  UNION ALL
         |  SELECT 'docs/d' || v || '.md', 3, 4, 'doc_section',
         |    'Sec A' || v, 'Title ' || v,
         |    'Title ' || v || '.Sec A' || v, '## Sec A' || v, '',
         |    1, 0, 0, 4, 0, 0, 0, '', ''
         |  FROM md
         |  UNION ALL
         |  SELECT 'docs/d' || v || '.md', 5, 6, 'doc_section',
         |    'Sec B' || v, 'Title ' || v,
         |    'Title ' || v || '.Sec B' || v, '## Sec B' || v, '',
         |    1, 0, 0, 6, 0, 0, 0, '', ''
         |  FROM md)
         |SELECT file_path, CAST(start_line AS INTEGER) AS start_line,
         |  CAST(end_line AS INTEGER) AS end_line, chunk_type, name,
         |  parent_name, hierarchy_path, signature, docstring,
         |  CAST(complexity AS INTEGER) AS complexity,
         |  CAST(cognitive_complexity AS INTEGER) AS cognitive_complexity,
         |  CAST(nesting_depth AS INTEGER) AS nesting_depth,
         |  CAST(token_count AS INTEGER) AS token_count,
         |  CAST(n_calls AS INTEGER) AS n_calls,
         |  CAST(n_imports AS INTEGER) AS n_imports,
         |  CAST(n_params AS INTEGER) AS n_params,
         |  return_type, first_inherit
         |FROM out ORDER BY file_path, start_line""".stripMargin,

    "a8_complexity_metrics" ->
      s"""WITH $residueCtes,
         |fx AS (
         |  SELECT 'src/m' || v || '.py' AS file_path,
         |    'ma' || v AS name, 2 AS cx, 2 AS cog, 1 AS nd FROM py
         |  UNION ALL
         |  SELECT 'src/m' || v || '.py', 'mb' || v,
         |    CASE WHEN ev THEN 2 ELSE 1 END,
         |    CASE WHEN ev THEN 1 ELSE 0 END,
         |    CASE WHEN ev THEN 1 ELSE 0 END FROM py
         |  UNION ALL
         |  SELECT 'src/m' || v || '.py', 'f' || v, 1 + d,
         |    d + (d * (d - 1)) // 2, d FROM py
         |  UNION ALL
         |  SELECT 'src/g' || v || '.go', 'Get' || v, 2, 1, 1 FROM gg
         |  UNION ALL
         |  SELECT 'src/g' || v || '.go', 'Add' || v, 1, 0, 0 FROM gg)
         |SELECT file_path, name, CAST(cx AS INTEGER) AS complexity,
         |  CAST(cog AS INTEGER) AS cognitive_complexity,
         |  CAST(nd AS INTEGER) AS nesting_depth,
         |  CASE WHEN cog <= 5 THEN 'A' WHEN cog <= 10 THEN 'B'
         |    WHEN cog <= 20 THEN 'C' WHEN cog <= 30 THEN 'D'
         |    ELSE 'F' END AS grade
         |FROM fx ORDER BY file_path, name""".stripMargin)
}
