package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.text.{C4Rules, TextFunctions}

/** Curation/layout operator pack (round-5 third wave): C4-style page
  * cleaning, Z-order multi-dimensional file layout, and SCD2 dimension
  * history — the write-side curation ops beside TextDedupPack's
  * corpus-assembly family.
  *
  * Fixture notes: documents have no newlines or punctuation, so the C4
  * gate synthesizes five-line "pages" from each doc's token array with
  * deterministic rule triggers planted by doc_id residue (no-terminal-
  * punct lines on 3∤id, a javascript boilerplate line on 7|id, a
  * too-short line always, lorem-ipsum pages on 11|id, curly-brace
  * template pages on 13|id) — every rule fires on a known subset, and
  * the DuckDB oracle rebuilds the identical pages.
  */
object CurationPack {

  /** The synthesized page: (doc_id, page) with 5 newline-joined lines.
    * Docs need ≥ 11 tokens so every slice is full.
    */
  private def pages(s: SparkSession, d: String): DataFrame = {
    val toksCol = TextFunctions.tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), toksCol.as("toks"))
      .filter(size(col("toks")) >= 11)
      .select(col("doc_id"), concat_ws("\n",
        concat(concat_ws(" ", slice(col("toks"), 1, 6)), lit(".")),
        when(col("doc_id") % 3 === 0,
          concat(concat_ws(" ", slice(col("toks"), 7, 5)), lit(".")))
          .otherwise(concat_ws(" ", slice(col("toks"), 7, 5))),
        when(col("doc_id") % 7 === 0,
          lit("please enable javascript to continue viewing."))
          .otherwise(concat(concat_ws(" ", slice(col("toks"), 3, 5)),
            lit(" now?"))),
        concat(concat_ws(" ", slice(col("toks"), 2, 3)), lit(".")),
        when(col("doc_id") % 11 === 0,
          lit("lorem ipsum dolor sit amet consectetur."))
          .when(col("doc_id") % 13 === 0,
            lit("template { placeholder } body here."))
          .otherwise(concat(concat_ws(" ", slice(col("toks"), 1, 8)),
            lit(" done today.")))).as("page"))
  }

  /** The identical page construction as DuckDB CTEs. */
  private val pagesSqlCtes: String = {
    val norm = TextFunctions.normalizeSql("text")
    s"""tok AS (SELECT doc_id, string_split($norm, ' ') AS toks
       |  FROM documents),
       |pages AS (SELECT doc_id,
       |    array_to_string(toks[1:6], ' ') || '.' || chr(10) ||
       |    CASE WHEN doc_id % 3 = 0
       |      THEN array_to_string(toks[7:11], ' ') || '.'
       |      ELSE array_to_string(toks[7:11], ' ') END || chr(10) ||
       |    CASE WHEN doc_id % 7 = 0
       |      THEN 'please enable javascript to continue viewing.'
       |      ELSE array_to_string(toks[3:7], ' ') || ' now?' END || chr(10) ||
       |    array_to_string(toks[2:4], ' ') || '.' || chr(10) ||
       |    CASE WHEN doc_id % 11 = 0
       |      THEN 'lorem ipsum dolor sit amet consectetur.'
       |      WHEN doc_id % 13 = 0
       |      THEN 'template { placeholder } body here.'
       |      ELSE array_to_string(toks[1:8], ' ') || ' done today.' END
       |    AS page
       |  FROM tok WHERE len(toks) >= 11)""".stripMargin
  }

  /** zo1 parameters: 10-bit Morton code over (n_chars, doc_id), 16
    * fixed-width buckets.
    */
  private val ZBits = 10
  private val ZBuckets = 16

  /** The Morton interleave as a DuckDB integer expression. */
  private def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { k =>
      s"((($x >> $k) & 1) * ${1L << (2 * k)} + (($y >> $k) & 1) * ${1L << (2 * k + 1)})"
    }.mkString(" + ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C4 cleaning (Raffel 2020 §2.2): line-level terminal-punct /
    // min-words / javascript rules + page-level lorem-ipsum, curly
    // brace, min-kept-lines rules — one codegen projection, no shuffle.
    "c4f1_c4_filter" -> ((s, d) => {
      C4Rules.c4Filter(pages(s, d), "doc_id", "page")
        .orderBy(col("doc_id"))
    }),

    // Z-order layout: Morton code over (n_chars, doc_id) + fixed-width
    // bucket assignment, rolled up per bucket to show the locality a
    // file-level min/max skip would exploit on BOTH dimensions.
    "zo1_zorder_layout" -> ((s, d) => {
      graft.index.ZOrder.withZOrder(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          "n_chars", "doc_id", ZBits, ZBuckets)
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min(col("zvalue")).as("min_z"), max(col("zvalue")).as("max_z"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("zbucket"))
    }),

    // SCD2 history build over the order-status change log of every 10th
    // customer: key-partitioned gaps-and-islands, versioned intervals
    // closed by lead(), 9999-12-31 sentinel on the open run.
    "scd1_status_history" -> ((s, d) => {
      val changes = Tables.orders(s, d)
        .filter(col("o_custkey") % 10 === 0)
        .select(col("o_custkey"),
          col("o_orderdate").cast("date").as("obs_date"),
          col("o_orderkey"), col("o_orderstatus"))
      graft.util.Scd.scd2(changes, "o_custkey", "obs_date", "o_orderkey",
          "o_orderstatus")
        .orderBy(col("o_custkey"), col("version"))
    })
  )

  def oracles: Map[String, String] = Map(
    "c4f1_c4_filter" ->
      s"""WITH $pagesSqlCtes,
         |split AS (SELECT doc_id, page,
         |    string_split(page, chr(10)) AS lines,
         |    contains(lower(page), 'lorem ipsum') AS has_lorem,
         |    contains(page, '{') AS has_brace
         |  FROM pages),
         |kept AS (SELECT doc_id,
         |    CAST(len(lines) AS INTEGER) AS n_lines,
         |    list_filter(lines, l ->
         |      right(trim(l), 1) IN ('.', '!', '?', '"')
         |      AND len(list_filter(string_split(trim(l), ' '), w -> w <> '')) >= 5
         |      AND NOT contains(lower(trim(l)), 'javascript')) AS k,
         |    has_lorem, has_brace
         |  FROM split)
         |SELECT doc_id, n_lines,
         |  CAST(len(k) AS INTEGER) AS n_kept_lines,
         |  has_lorem, has_brace,
         |  (len(k) >= 3 AND NOT has_lorem AND NOT has_brace) AS page_keep,
         |  CASE WHEN len(k) >= 3 AND NOT has_lorem AND NOT has_brace
         |    THEN array_to_string(list_transform(k, l -> trim(l)), chr(10))
         |    ELSE '' END AS cleaned_text
         |FROM kept ORDER BY doc_id""".stripMargin,

    "zo1_zorder_layout" -> {
      val z = interleaveSql("(n_chars & 1023)", "(doc_id & 1023)", ZBits)
      s"""WITH zed AS (SELECT doc_id, n_chars,
         |    CAST($z AS BIGINT) AS zvalue
         |  FROM documents),
         |bkt AS (SELECT doc_id, n_chars, zvalue,
         |    CAST((zvalue * $ZBuckets) // ${1L << (2 * ZBits)} AS INTEGER)
         |      AS zbucket
         |  FROM zed)
         |SELECT zbucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  min(zvalue) AS min_z, max(zvalue) AS max_z,
         |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM bkt GROUP BY zbucket ORDER BY zbucket""".stripMargin
    },

    "scd1_status_history" ->
      """WITH changes AS (SELECT o_custkey,
        |    CAST(o_orderdate AS DATE) AS obs_date,
        |    o_orderkey, o_orderstatus
        |  FROM orders WHERE o_custkey % 10 = 0),
        |flagged AS (SELECT *,
        |    CASE WHEN lag(o_orderstatus) OVER w IS NULL
        |           OR lag(o_orderstatus) OVER w <> o_orderstatus
        |      THEN 1 ELSE 0 END AS chg
        |  FROM changes
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY obs_date, o_orderkey)),
        |runs0 AS (SELECT *,
        |    sum(chg) OVER (PARTITION BY o_custkey ORDER BY obs_date, o_orderkey
        |      ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM flagged),
        |runs AS (SELECT o_custkey, run_id,
        |    min(o_orderstatus) AS o_orderstatus,
        |    min(obs_date) AS valid_from,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM runs0 GROUP BY o_custkey, run_id)
        |SELECT o_custkey, o_orderstatus,
        |  CAST(run_id AS INTEGER) AS version, valid_from,
        |  coalesce(lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY run_id),
        |    DATE '9999-12-31') AS valid_to,
        |  n_events
        |FROM runs ORDER BY o_custkey, version""".stripMargin
  )
}
