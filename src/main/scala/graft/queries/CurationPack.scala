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

    // k-anonymity release gate: quasi-identifier groups (lang, length
    // band, source) below k=5 members are suppressed; the count rides
    // the one hash aggregate, no second pass.
    "ka1_k_anonymity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("len_band", expr("n_chars div 100"))
      graft.analyze.Privacy
        .kAnonymize(docs, Seq("lang", "len_band", "source"), k = 5)
        .select(col("lang"), col("len_band").cast("long").as("len_band"),
          col("source"), col("n"), col("released"))
        .orderBy(col("lang"), col("len_band"), col("source"))
    }),

    // ε-DP noisy counts (Laplace mechanism, ε=1, sensitivity 1) with
    // τ=10 threshold suppression; noise derived from the portable hash
    // of the group key (reproducible release, oracle-checkable).
    "dp1_dp_counts" -> ((s, d) => {
      graft.analyze.Privacy.dpCounts(Tables.documents(s, d),
          Seq("lang", "source"), epsilon = 1.0, tau = 10.0)
        .orderBy(col("lang"), col("source"))
    }),

    // Fill-in-the-Middle PSM transform (Bavarian 2022): hash-derived cut
    // points + apply decision (deterministic per doc, reproducible
    // shards), <PRE>/<SUF>/<MID> reorder in one codegen projection.
    "fim1_fill_in_middle" -> ((s, d) => {
      graft.text.Fim.psm(
          Tables.documents(s, d).filter(col("doc_id") < 100),
          "text", "doc_id", ratePct = 50)
        .select(col("doc_id"), col("fim_applied"), col("lo"), col("hi"),
          col("fim_text"))
        .orderBy(col("doc_id"))
    }),

    // Web-corpus URL hygiene: canonicalize (scheme/host fold, default
    // port + www + fragment strip, tracking-param drop, param sort,
    // trailing-slash trim) → exact-URL dedup (min-id winner) →
    // blocklist filter → per-domain cap (top-3 by n_chars). All string
    // ops codegen'd; the only shuffles are the two partitioned windows.
    // Fixture: URLs synthesized from doc_id residues so every
    // canonicalization rule fires on a known subset — including the
    // non-http(s) pass-through (ftp://, %17), the case-folded scheme
    // (HTTP://, %23) and the single-label host (localhost, %19) the
    // ANSI element_at guard exists for.
    "url1_domain_caps" -> ((s, d) => {
      val id = col("doc_id")
      val raw = Tables.documents(s, d).select(id, col("n_chars"))
        .withColumn("url", concat(
          when(id % 17 === 0, lit("ftp"))
            .when(id % 23 === 0, lit("HTTP"))
            .when(id % 2 === 0, lit("http")).otherwise(lit("https")),
          lit("://"),
          when(id % 5 === 0, lit("WWW."))
            .when(id % 5 === 1, lit("cdn.")).otherwise(lit("")),
          when(id % 19 === 0, lit("localhost")).otherwise(concat(
            lit("site"), (id % 13).cast("string"), lit("."),
            when(id % 3 === 0, lit("com"))
              .when(id % 3 === 1, lit("org")).otherwise(lit("net")))),
          when(id % 4 === 0, lit(":80"))
            .when(id % 4 === 1, lit(":443")).otherwise(lit("")),
          lit("/P/"), floor(id / 7).cast("long").cast("string"),
          when(id % 6 === 0, lit("/")).otherwise(lit("")),
          when(id % 2 === 1, concat(lit("?utm_source=x&ref="),
              (id % 2).cast("string"), lit("&b=2&a=1")))
            .when(id % 7 === 0, lit("?a=1&utm_campaign=z"))
            .otherwise(lit("")),
          when(id % 5 === 0, lit("#sec")).otherwise(lit(""))))
      val dd = graft.text.UrlHygiene.dedupByUrl(
        graft.text.UrlHygiene.canonicalize(raw, "url"), "doc_id")
      graft.text.UrlHygiene.domainCap(dd, cap = 3,
          blocklist = Seq("site0.com", "site7.org"))
        .select(col("domain"), col("dom_rank").cast("int").as("dom_rank"),
          col("doc_id"), col("url_canon"), col("n_chars"),
          col("domain_urls").cast("long").as("domain_urls"))
        .orderBy(col("domain"), col("dom_rank"))
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

    // Margin-based cross-set pair mining (Artetxe-Schwenk): forward
    // top-k candidates only (never all-pairs), backward denominators
    // computed for the bounded candidate target set, shifted-cosine
    // integer margin so both engines divide identically.
    "bx1_margin_mining" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val x = emb.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id").as("xid"), col("embedding").as("vec"))
      val y = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("yid"), col("embedding").as("vec"))
      graft.ann.Bitext.marginPairs(x, y, k = 4)
        .orderBy(col("margin_ppm").desc, col("xid"), col("yid"))
        .limit(50)
    }),

    // Mergeable equi-width histogram quantiles: constant-size bucket
    // aggregate (map-side combine), read-out on the bucket table via
    // the shared two-pass prefix sum, 9-row quantile probe broadcast.
    "hq1_histogram_quantiles" -> ((s, d) => {
      val hist = graft.sketch.HistogramQuantiles.histogram(
        Tables.documents(s, d).select(col("n_chars")),
        "n_chars", lo = 0L, hi = 512L, buckets = 32)
      graft.sketch.HistogramQuantiles
        .quantiles(hist, 0L, 512L, 32, HqQuantiles)
        .orderBy(col("q_permille"))
    }),

    // Daily gap fill + LOCF over a sparsified event stream: per-key
    // date spine (sequence/explode bounded by each key's own span),
    // hash join on (key, day), one key-partitioned window for the
    // carry-forward.
    "tg1_gap_fill" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_id") % 11 === 0)
        .select(col("user_id").as("k"), col("ts").cast("date").as("day"),
          col("event_id"))
        .groupBy(col("k"), col("day"))
        .agg(count(lit(1)).cast("long").as("n"),
          max(col("event_id")).as("last_eid"))
      graft.util.GapFill.fillDaily(daily, "k", "day", "n", "last_eid")
        .select(col("k"), col("day"), col("n"), col("last_eid"),
          col("observed"))
        .orderBy(col("k"), col("day"))
    }),

    // Incremental rollup maintenance: a persisted per-(type, day)
    // aggregate absorbs a late batch by merging PARTIALS (sums/counts
    // add, mins/maxes fold) — maintenance cost tracks the delta, never
    // the fact history. The oracle is the full recompute over ALL
    // facts: merge ≡ rebuild, bit-exact (the b2 contract, warehouse
    // flavor).
    "ru1_incremental_rollup" -> ((s, d) => {
      val facts = Tables.events(s, d).select(col("event_type"),
        col("ts").cast("date").as("day"), col("event_id"), col("user_id"))
      val keys = Seq("event_type", "day")
      val ms = Seq("event_id", "user_id")
      val base = graft.util.IncrementalRollup.rollup(
        facts.filter(col("event_id") % 7 =!= 0), keys, ms)
      val delta = graft.util.IncrementalRollup.rollup(
        facts.filter(col("event_id") % 7 === 0), keys, ms)
      graft.util.IncrementalRollup.merge(base, delta, keys, ms)
        .orderBy(col("event_type"), col("day"))
    }),

    // T5/UL2 span corruption: hash-placed sentinel spans (one per
    // 20-token block, length 3 = the 15% T5 rate), (input, target)
    // denoising pair per doc, byte-proven via sha256. Deterministic —
    // no RNG — so reruns and the oracle build identical pairs.
    "spc1_span_corruption" -> ((s, d) => {
      graft.text.SpanCorruption.corrupt(Tables.documents(s, d),
          "doc_id", "text")
        .select(col("doc_id"), sha2(col("input"), 256).as("input_sha"),
          sha2(col("target"), 256).as("target_sha"), col("n_spans"),
          col("n_corrupted"))
        .orderBy(col("doc_id"))
    }),

    // SFT chat-template assembly with loss masking: documents grouped
    // into conversations (doc_id%40), roles cycling
    // system/user/assistant by turn index, rendered under the ChatML-
    // style tags in turn order, assistant token counts = the loss mask.
    "ct1_chat_template" -> ((s, d) => {
      val turn = expr("cast(doc_id div 40 as int)")
      val turns = Tables.documents(s, d).select(
        (col("doc_id") % 40).cast("int").as("conv_id"),
        turn.as("i"),
        when(expr("(doc_id div 40) % 3") === 2, "assistant")
          .when(expr("(doc_id div 40) % 3") === 1, "user")
          .otherwise("system").as("role"),
        col("text").as("content"))
      graft.text.ChatTemplate.render(turns, "conv_id", "i", "role",
          "content")
        .select(col("conv_id"),
          sha2(col("rendered"), 256).as("rendered_sha"),
          col("n_turns"), col("n_tokens"), col("n_masked_tokens"),
          col("mask_permille"))
        .orderBy(col("conv_id"))
    }),

    // DPO preference-pair assembly: per prompt, highest-reward
    // candidate → chosen, lowest → rejected (lowest-id tiebreaks via
    // struct-ordered aggregates), margin floor drops near-ties, and
    // the response texts re-attach through compound-key joins (proven
    // via sha256). Candidate pool is residue-filtered so group sizes
    // vary: single-candidate prompts and sub-margin prompts both
    // exercise the drop branches.
    "pp1_preference_pairs" -> ((s, d) => {
      val cands = Tables.documents(s, d)
        .filter((col("doc_id") * 13) % 97 < 40)
        .select((col("doc_id") % 150).as("prompt_id"),
          col("doc_id").as("resp_id"),
          (((col("doc_id") * 13) % 97).cast("double") / 100.0).as("reward"),
          col("text"))
      val p = graft.text.PreferencePairs.pairs(
        cands, "prompt_id", "resp_id", "reward", minMargin = 0.15)
      graft.text.PreferencePairs.withTexts(p, cands, "prompt_id",
          "resp_id", "text")
        .select(col("prompt_id"), col("chosen_id"),
          round(col("chosen_reward"), 6).as("chosen_reward"),
          col("rejected_id"),
          round(col("rejected_reward"), 6).as("rejected_reward"),
          round(col("margin"), 6).as("margin"), col("n_candidates"),
          sha2(col("chosen_text"), 256).as("chosen_sha"),
          sha2(col("rejected_text"), 256).as("rejected_sha"))
        .orderBy(col("prompt_id"))
    }),

    // Reward-based rejection sampling (best-of-N): per prompt keep the
    // best candidate clearing the reward floor; prompts with zero
    // acceptees drop entirely; acceptance stats ride the same single
    // hash aggregate.
    "rj1_rejection_sampling" -> ((s, d) => {
      val cands = Tables.documents(s, d)
        .select((col("doc_id") % 40).as("prompt_id"),
          col("doc_id").as("resp_id"),
          (((col("doc_id") * 29) % 101).cast("double") / 100.0).as("reward"))
      graft.text.RejectionSampling.bestOfN(
          cands, "prompt_id", "resp_id", "reward", minReward = 0.75)
        .select(col("prompt_id"), col("best_id"),
          round(col("best_reward"), 6).as("best_reward"),
          col("n_candidates"), col("n_accepted"), col("accept_permille"))
        .orderBy(col("prompt_id"))
    }),

    // Repo-level source concatenation (StarCoder/The-Stack-style code
    // corpus assembly): every repo's files joined into one training
    // document in deterministic (path, id) order with path headers;
    // byte-losslessness proven via sha256 of the concatenation. One
    // repo-keyed hash aggregate, per-group state bounded by repo size.
    "rl1_repo_concat" -> ((s, d) => {
      val files = Tables.documents(s, d).select(
        concat(lit("r"), col("doc_id") % 25).as("repo"),
        concat(lit("p"), lpad(col("doc_id").cast("string"), 6, "0"))
          .as("path"),
        col("doc_id").as("id"), col("text").as("body"))
      graft.text.RepoAssembly.concatRepos(files, "repo", "path", "id",
          "body")
        .select(col("repo"), col("n_files"), col("n_chars"),
          col("doc_sha"))
        .orderBy(col("repo"))
    }),

    // Blocked fuzzy entity resolution: a dirty feed (3rd char deleted
    // from every 4th part's display name) matched to the clean catalog
    // by levenshtein within two-sided (2-char prefix + 2-char suffix)
    // blocks — both ends survive an interior edit, and the suffix leg
    // keeps block sizes sublinear in the catalog; best match per dirty
    // row via an rid-partitioned window, candidate count as the
    // ambiguity signal.
    "er1_fuzzy_match" -> ((s, d) => {
      val base = Tables.part(s, d).select(col("p_partkey"),
        concat(col("p_name"), lit(" #"), col("p_partkey") % 50).as("name"))
      val left = base.select(col("p_partkey").as("lid"), col("name"))
      val right = base.filter(col("p_partkey") % 4 === 0)
        .select((col("p_partkey") + 100000).as("rid"),
          concat(substring(col("name"), 1, 2), expr("substring(name, 4)"))
            .as("name"))
      graft.dedup.FuzzyJoin.blockedBestMatch(left, right,
          blockLen = 2, maxDist = 2, suffixLen = 2)
        .orderBy(col("rid"))
    }),

    // Rolling z-score anomaly signal over daily event volumes: trailing
    // 7-row integer sums (Σx, Σx², n) per event type, z formed from the
    // integers in one double expression — no engine stddev aggregate.
    "an1_rolling_anomaly" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("date").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("long").as("n"))
      graft.analyze.RollingStats.rollingZ(daily, "event_type", "day", "n", 7, tieCol = "day")
        .orderBy(col("event_type"), col("day"))
    }),

    // Poisson bootstrap CI (boot1): per-row Poisson(1) weights derived
    // from the portable hash via the inverse CDF (Chamandy et al.
    // 2012 — the coordination-free bootstrap), 20 replicates of the
    // mean-doc-length metric with rank-based percentile endpoints.
    // One ×B expansion collapsed map-side; the B-row mean table sorts
    // IN-ROW for the endpoints — no unpartitioned window.
    "boot1_bootstrap_ci" -> ((s, d) => {
      graft.analyze.Bootstrap.poissonMeanCi(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", b = 20)
        .orderBy(col("b"))
    }),

    // Integer-exact EWMA (ewma1): α=1/2 smoothed level per event type
    // over the daily volumes — the trend signal beside an1's outlier
    // z-score. The recurrence runs in micro-units with a right-shift
    // (exactly (x·1e6 + s)÷2 for non-negative values), so the oracle
    // replays it bit-for-bit as a recursive CTE. Series are per-key
    // and bounded; the fold runs inside one aggregate over the
    // collected sorted array — no windows, no driver state.
    "ewma1_volume_trend" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("date").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).cast("long").as("n"))
      graft.analyze.Ewma.ewmaHalf(daily, "event_type", "day", "n")
        .select(col("key").as("event_type"), col("ord").as("day"),
          col("value").as("n"), col("ewma_micro"), col("ewma"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Two-stage salted aggregation proved EXACT against the plain
    // GROUP BY oracle: the skew-mitigation plan shape (partial per
    // salt → final) produces bit-identical integer sums — the gate
    // that licenses salting any hot-key aggregate at 100 TB.
    "sj1_salted_agg" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100).cast("long").as("qc"),
          lit(1L).as("one"))
      graft.util.Salting.saltedSum(li, Seq("l_returnflag"), factor = 8,
          Map("qc" -> "sum_qc", "one" -> "n_rows"))
        .select(col("l_returnflag"),
          (col("sum_qc") / 100.0).as("sum_qty"),
          col("n_rows").cast("long").as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // CUBE aggregate (all four grouping combinations in one pass) over
    // order status × priority — completes the rollup/pivot family (rb1,
    // pv1) with integer-exact money sums.
    "cb1_cube_revenue" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).cast("long").as("n_orders"),
          Oracle.moneySum(col("o_totalprice")).as("revenue"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid").cast("int").as("gid"), col("n_orders"), col("revenue"))
        .orderBy(col("gid"), col("status"), col("priority"))
    }),

    // BLEU-2 overlap scoring of candidate/reference pairs (even doc ↔
    // odd doc of each consecutive pair): clipped n-gram precision via
    // (pair, gram)-partitioned count joins; BP-free (exp is not an
    // engine-portable contract), lengths emitted for callers that
    // apply it.
    "bl1_bleu_pairs" -> ((s, d) => {
      val t = Tables.documents(s, d).select(col("doc_id"),
        TextFunctions.tokens(col("text")).as("toks"))
      val cand = t.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") / 2).cast("long").as("pair_id"),
          col("toks").as("cand_toks"))
      val ref = t.filter(col("doc_id") % 2 === 1)
        .select((col("doc_id") / 2).cast("long").as("pair_id"),
          col("toks").as("ref_toks"))
      graft.text.Bleu.bleu2(cand.join(ref, Seq("pair_id")))
        .orderBy(col("pair_id"))
    }),

    // Sliding token-window chunking (winLen 16, stride 8): the
    // long-document dual of pk1 packing — pure sequence/explode/slice
    // projection, no shuffle.
    "tw1_token_windows" -> ((s, d) => {
      graft.text.Windowing.tokenWindows(
          Tables.documents(s, d), "doc_id", "text", winLen = 16, stride = 8)
        .orderBy(col("doc_id"), col("window_id"))
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

  /** hq1 quantile probes (per-mille). */
  private val HqQuantiles = Seq(100, 250, 500, 750, 900, 990)

  def oracles: Map[String, String] = Map(
    "ka1_k_anonymity" ->
      """WITH g AS (SELECT lang, n_chars // 100 AS len_band, source,
        |    count(*) AS n
        |  FROM documents GROUP BY lang, len_band, source)
        |SELECT lang, CAST(len_band AS BIGINT) AS len_band, source,
        |  CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN n >= 5 THEN 1 ELSE 0 END AS INTEGER) AS released
        |FROM g ORDER BY lang, len_band, source""".stripMargin,

    "dp1_dp_counts" -> {
      import graft.functions.PortableHash.{hash60Sql => h60}
      s"""WITH g AS (SELECT lang, source, count(*) AS n
         |  FROM documents GROUP BY lang, source),
         |nz AS (SELECT lang, source, n,
         |    (${h60("'dp'", "concat_ws('|', lang, source)")} + 0.5)
         |      / 1152921504606846976.0 AS u
         |  FROM g)
         |SELECT lang, source,
         |  round(n + (-1.0) *
         |    (CASE WHEN u - 0.5 < 0 THEN -1.0 ELSE 1.0 END)
         |    * ln(1.0 - 2.0 * abs(u - 0.5)), 4)::DOUBLE AS noisy_n
         |FROM nz
         |WHERE round(n + (-1.0) *
         |    (CASE WHEN u - 0.5 < 0 THEN -1.0 ELSE 1.0 END)
         |    * ln(1.0 - 2.0 * abs(u - 0.5)), 4) >= 10
         |ORDER BY lang, source""".stripMargin
    },

    "fim1_fill_in_middle" -> {
      import graft.functions.PortableHash.{hash60Sql => h60}
      val norm = TextFunctions.normalizeSql("text")
      s"""WITH tok AS (SELECT doc_id, string_split($norm, ' ') AS toks
         |  FROM documents WHERE doc_id < 100),
         |cuts AS (SELECT doc_id, toks, len(toks) AS n,
         |    ${h60("'fimc1'", "CAST(doc_id AS VARCHAR)")}
         |      % (len(toks) + 1) AS c1,
         |    ${h60("'fimc2'", "CAST(doc_id AS VARCHAR)")}
         |      % (len(toks) + 1) AS c2,
         |    CASE WHEN ${h60("'fimr'", "CAST(doc_id AS VARCHAR)")}
         |      % 100 < 50 THEN 1 ELSE 0 END AS fim_applied
         |  FROM tok),
         |pieces AS (SELECT doc_id, fim_applied, toks, n,
         |    least(c1, c2) AS lo, greatest(c1, c2) AS hi
         |  FROM cuts)
         |SELECT doc_id, CAST(fim_applied AS INTEGER) AS fim_applied,
         |  CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
         |  CASE WHEN fim_applied = 1 THEN
         |    '<PRE> ' || coalesce(array_to_string(toks[1:lo], ' '), '') ||
         |    ' <SUF> ' || coalesce(array_to_string(toks[hi+1:n], ' '), '') ||
         |    ' <MID> ' || coalesce(array_to_string(toks[lo+1:hi], ' '), '')
         |  ELSE coalesce(array_to_string(toks, ' '), '') END AS fim_text
         |FROM pieces ORDER BY doc_id""".stripMargin
    },

    "url1_domain_caps" ->
      """WITH raw AS (
        |  SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 17 = 0 THEN 'ftp'
        |          WHEN doc_id % 23 = 0 THEN 'HTTP'
        |          WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END) || '://' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN 'WWW.'
        |          WHEN doc_id % 5 = 1 THEN 'cdn.' ELSE '' END) ||
        |    (CASE WHEN doc_id % 19 = 0 THEN 'localhost'
        |          ELSE 'site' || CAST(doc_id % 13 AS VARCHAR) || '.' ||
        |            (CASE WHEN doc_id % 3 = 0 THEN 'com'
        |                  WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END)
        |     END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':80'
        |          WHEN doc_id % 4 = 1 THEN ':443' ELSE '' END) ||
        |    '/P/' || CAST(doc_id // 7 AS VARCHAR) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 2 = 1 THEN '?utm_source=x&ref=' ||
        |            CAST(doc_id % 2 AS VARCHAR) || '&b=2&a=1'
        |          WHEN doc_id % 7 = 0 THEN '?a=1&utm_campaign=z'
        |          ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id, n_chars, url,
        |    regexp_replace(lower(regexp_replace(
        |      regexp_extract(url, '(?i)^https?://([^/?#]+)', 1),
        |      ':(80|443)$', '')), '^www\.', '') AS host,
        |    regexp_extract(url, '(?i)^https?://[^/?#]+([^?#]*)', 1) AS path0,
        |    regexp_extract(url, '\?([^#]*)', 1) AS qs
        |  FROM raw),
        |parts AS (
        |  SELECT doc_id, n_chars, url, host,
        |    CASE WHEN path0 = '' THEN '/'
        |         WHEN length(path0) > 1 AND path0 LIKE '%/'
        |           THEN substr(path0, 1, length(path0) - 1)
        |         ELSE path0 END AS cpath,
        |    coalesce(array_to_string(
        |      list_sort(list_filter(string_split(qs, '&'),
        |        x -> x <> '' AND NOT regexp_matches(x, '^(utm_|fbclid)'))),
        |      '&'), '') AS cq
        |  FROM canon),
        |curl AS (
        |  SELECT doc_id, n_chars, host,
        |    CASE WHEN host = '' THEN url
        |         ELSE 'https://' || host || cpath ||
        |           (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) END
        |      AS url_canon
        |  FROM parts),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY url_canon
        |      ORDER BY doc_id) AS dup_rk
        |  FROM curl),
        |dedup AS (
        |  SELECT url_canon, host, doc_id, n_chars
        |  FROM ranked WHERE dup_rk = 1),
        |dom AS (
        |  SELECT url_canon, doc_id, n_chars,
        |    CASE WHEN len(string_split(host, '.')) >= 2 THEN
        |      list_extract(string_split(host, '.'),
        |        len(string_split(host, '.')) - 1) || '.' ||
        |      list_extract(string_split(host, '.'),
        |        len(string_split(host, '.')))
        |    ELSE host END AS domain
        |  FROM dedup),
        |kept AS (
        |  SELECT domain, doc_id, url_canon, n_chars,
        |    row_number() OVER (PARTITION BY domain
        |      ORDER BY n_chars DESC, doc_id) AS dom_rank,
        |    count(*) OVER (PARTITION BY domain) AS domain_urls
        |  FROM dom
        |  WHERE domain NOT IN ('site0.com', 'site7.org'))
        |SELECT domain, CAST(dom_rank AS INTEGER) AS dom_rank, doc_id,
        |  url_canon, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(domain_urls AS BIGINT) AS domain_urls
        |FROM kept WHERE dom_rank <= 3
        |ORDER BY domain, dom_rank""".stripMargin,

    "bx1_margin_mining" -> {
      import graft.functions.VectorFunctions
      val fwdCos = VectorFunctions.cosineSql("y.vec", "x.vec")
      val bwdCos = VectorFunctions.cosineSql("x.vec", "y2.vec")
      s"""WITH x AS MATERIALIZED (SELECT vec_id AS xid, embedding AS vec
         |    FROM embeddings WHERE vec_id % 2 = 0),
         |y AS MATERIALIZED (SELECT vec_id AS yid, embedding AS vec
         |    FROM embeddings WHERE vec_id % 2 = 1),
         |fs AS (SELECT x.xid, y.yid, $fwdCos AS sim FROM y CROSS JOIN x),
         |fr AS (SELECT xid, yid,
         |    CAST(round(sim * 1000000) AS BIGINT) AS cos_micro,
         |    row_number() OVER (PARTITION BY xid ORDER BY sim DESC, yid)
         |      AS rk
         |  FROM fs),
         |fwd AS MATERIALIZED (SELECT xid, yid, cos_micro FROM fr WHERE rk <= 4),
         |dx AS (SELECT xid, CAST(sum(cos_micro + 1000000) AS BIGINT) AS dx
         |  FROM fwd GROUP BY xid),
         |yp AS (SELECT y.* FROM y
         |  JOIN (SELECT DISTINCT yid FROM fwd) p USING (yid)),
         |bs AS (SELECT y2.yid, x.xid, $bwdCos AS sim
         |  FROM x CROSS JOIN yp y2),
         |br AS (SELECT yid,
         |    CAST(round(sim * 1000000) AS BIGINT) AS cos_micro,
         |    row_number() OVER (PARTITION BY yid ORDER BY sim DESC, xid)
         |      AS rk
         |  FROM bs),
         |dy AS (SELECT yid, CAST(sum(cos_micro + 1000000) AS BIGINT) AS dy
         |  FROM br WHERE rk <= 4 GROUP BY yid)
         |SELECT f.xid, f.yid, f.cos_micro,
         |  CAST(((f.cos_micro + 1000000) * 8 * 1000000) // (dx.dx + dy.dy)
         |    AS BIGINT) AS margin_ppm
         |FROM fwd f JOIN dx USING (xid) JOIN dy USING (yid)
         |ORDER BY margin_ppm DESC, xid, yid LIMIT 50""".stripMargin
    },

    "hq1_histogram_quantiles" -> {
      val qValues = HqQuantiles.map(q => s"($q)").mkString(", ")
      s"""WITH h AS (SELECT
         |    least(greatest(CAST((n_chars * 32) // 512 AS INTEGER), 0), 31)
         |      AS bucket,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM documents GROUP BY 1),
         |c AS (SELECT bucket, n,
         |    sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM h),
         |t AS (SELECT CAST(max(cum) AS BIGINT) AS total FROM c),
         |q(q_permille) AS (VALUES $qValues)
         |SELECT q.q_permille,
         |  round(min(c.bucket) * 16.0::DOUBLE, 6) AS est,
         |  CAST(min(c.bucket) AS INTEGER) AS bucket,
         |  min(t.total) AS total
         |FROM q, c, t
         |WHERE c.cum * 1000 >= q.q_permille * t.total
         |GROUP BY q.q_permille ORDER BY q.q_permille""".stripMargin
    },

    "tg1_gap_fill" ->
      """WITH obs AS (SELECT user_id AS k, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n, max(event_id) AS last_eid
        |  FROM events WHERE event_id % 11 = 0 GROUP BY 1, 2),
        |spine AS (SELECT k,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM (SELECT k, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY k)),
        |j AS (SELECT s.k, s.day, coalesce(o.n, 0) AS n,
        |    o.last_eid AS raw_eid, o.last_eid IS NOT NULL AS observed
        |  FROM spine s LEFT JOIN obs o USING (k, day))
        |SELECT k, day, n,
        |  last_value(raw_eid IGNORE NULLS)
        |    OVER (PARTITION BY k ORDER BY day) AS last_eid,
        |  observed
        |FROM j ORDER BY k, day""".stripMargin,

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

    "ru1_incremental_rollup" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(event_id) AS BIGINT) AS sum_event_id,
        |  CAST(min(event_id) AS BIGINT) AS min_event_id,
        |  CAST(max(event_id) AS BIGINT) AS max_event_id,
        |  CAST(sum(user_id) AS BIGINT) AS sum_user_id,
        |  CAST(min(user_id) AS BIGINT) AS min_user_id,
        |  CAST(max(user_id) AS BIGINT) AS max_user_id
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "spc1_span_corruption" -> {
      val off = graft.functions.PortableHash
        .hash60Sql("'sc'", "doc_id || '_' || (i0 // 20)")
      s"""WITH tok AS (SELECT doc_id,
         |    string_split(${graft.text.TextFunctions.normalizeSql("text")}, ' ') AS toks
         |  FROM documents),
         |tk AS (SELECT doc_id, unnest(toks) AS tok,
         |    generate_subscripts(toks, 1) - 1 AS i0 FROM tok),
         |c AS (SELECT doc_id, tok, i0, i0 // 20 AS blk, i0 % 20 AS p,
         |    $off % 18 AS off FROM tk),
         |inp AS (SELECT doc_id,
         |    string_agg(CASE WHEN p = off THEN '<extra_id_' || blk || '>'
         |      ELSE tok END, ' ' ORDER BY i0) AS input
         |  FROM c WHERE NOT (p > off AND p <= off + 2) GROUP BY doc_id),
         |tgt AS (SELECT doc_id,
         |    string_agg(CASE WHEN p = off
         |        THEN '<extra_id_' || blk || '> ' || tok
         |      ELSE tok END, ' ' ORDER BY i0) AS target,
         |    CAST(sum(CASE WHEN p = off THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_spans,
         |    CAST(count(*) AS BIGINT) AS n_corrupted
         |  FROM c WHERE p BETWEEN off AND off + 2 GROUP BY doc_id)
         |SELECT i.doc_id, sha256(input) AS input_sha,
         |  sha256(coalesce(target, '')) AS target_sha,
         |  coalesce(n_spans, 0) AS n_spans,
         |  coalesce(n_corrupted, 0) AS n_corrupted
         |FROM inp i LEFT JOIN tgt USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "ct1_chat_template" -> {
      val norm = graft.text.TextFunctions.normalizeSql("text")
      s"""WITH t0 AS (SELECT CAST(doc_id % 40 AS INTEGER) AS conv_id,
         |    CAST(doc_id // 40 AS INTEGER) AS i,
         |    CASE WHEN (doc_id // 40) % 3 = 2 THEN 'assistant'
         |      WHEN (doc_id // 40) % 3 = 1 THEN 'user'
         |      ELSE 'system' END AS role,
         |    text AS content,
         |    len(string_split($norm, ' ')) AS ntok
         |  FROM documents),
         |r AS (SELECT conv_id,
         |    string_agg('<|' || role || '|>' || chr(10) || content ||
         |        chr(10) || '<|end|>', chr(10) ORDER BY i, role)
         |      AS rendered,
         |    CAST(count(*) AS BIGINT) AS n_turns,
         |    CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |    CAST(sum(CASE WHEN role = 'assistant' THEN ntok ELSE 0 END)
         |      AS BIGINT) AS n_masked_tokens
         |  FROM t0 GROUP BY conv_id)
         |SELECT conv_id, sha256(rendered) AS rendered_sha, n_turns,
         |  n_tokens, n_masked_tokens,
         |  CAST((n_masked_tokens * 1000) // greatest(n_tokens, 1)
         |    AS BIGINT) AS mask_permille
         |FROM r ORDER BY conv_id""".stripMargin
    },

    // pp1: both extremes via tie-deterministic windows (reward ±, id),
    // margin/near-tie/singleton drops in the WHERE, texts re-attached
    // and sha'd.
    "pp1_preference_pairs" ->
      """WITH cands AS (SELECT doc_id % 150 AS prompt_id, doc_id AS id,
        |    CAST((doc_id * 13) % 97 AS DOUBLE) / 100.0 AS r, text
        |  FROM documents WHERE (doc_id * 13) % 97 < 40),
        |rk AS (SELECT *,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY r DESC, id) AS rb,
        |    row_number() OVER (PARTITION BY prompt_id
        |      ORDER BY r ASC, id) AS rw
        |  FROM cands),
        |c AS (SELECT prompt_id, id AS chosen_id, r AS cr, text AS ct
        |  FROM rk WHERE rb = 1),
        |w AS (SELECT prompt_id, id AS rejected_id, r AS wr, text AS wt
        |  FROM rk WHERE rw = 1),
        |n AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM cands GROUP BY prompt_id)
        |SELECT c.prompt_id, c.chosen_id, round(c.cr, 6) AS chosen_reward,
        |  w.rejected_id, round(w.wr, 6) AS rejected_reward,
        |  round(c.cr - w.wr, 6) AS margin, n.n_candidates,
        |  sha256(c.ct) AS chosen_sha, sha256(w.wt) AS rejected_sha
        |FROM c JOIN w USING (prompt_id) JOIN n USING (prompt_id)
        |WHERE c.chosen_id <> w.rejected_id
        |  AND c.cr - w.wr >= 0.15::DOUBLE
        |ORDER BY c.prompt_id""".stripMargin,

    // rj1: accepted-only window for the survivor, counts from the full
    // pool, permille via integer division.
    "rj1_rejection_sampling" ->
      """WITH cands AS (SELECT doc_id % 40 AS prompt_id, doc_id AS id,
        |    CAST((doc_id * 29) % 101 AS DOUBLE) / 100.0 AS r
        |  FROM documents),
        |acc AS (SELECT *, row_number() OVER (PARTITION BY prompt_id
        |    ORDER BY r DESC, id) AS rn
        |  FROM cands WHERE r >= 0.75::DOUBLE),
        |n AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM cands GROUP BY prompt_id),
        |na AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_accepted
        |  FROM acc GROUP BY prompt_id)
        |SELECT a.prompt_id, a.id AS best_id, round(a.r, 6) AS best_reward,
        |  n.n_candidates, na.n_accepted,
        |  CAST((na.n_accepted * 1000) // n.n_candidates AS BIGINT)
        |    AS accept_permille
        |FROM acc a JOIN n USING (prompt_id) JOIN na USING (prompt_id)
        |WHERE a.rn = 1 ORDER BY a.prompt_id""".stripMargin,

    "rl1_repo_concat" ->
      """WITH f AS (SELECT 'r' || (doc_id % 25) AS repo,
        |    'p' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS path,
        |    doc_id AS id, text AS body
        |  FROM documents),
        |c AS (SELECT repo, count(*) AS n_files,
        |    string_agg('<file: ' || path || '>' || chr(10) || body,
        |      chr(10) || chr(10) ORDER BY path, id) AS doc
        |  FROM f GROUP BY repo)
        |SELECT repo, CAST(n_files AS INTEGER) AS n_files,
        |  CAST(length(doc) AS INTEGER) AS n_chars,
        |  sha256(doc) AS doc_sha
        |FROM c ORDER BY repo""".stripMargin,

    "er1_fuzzy_match" ->
      """WITH base AS (SELECT p_partkey,
        |    p_name || ' #' || (p_partkey % 50) AS name FROM part),
        |l AS (SELECT p_partkey AS lid, name AS lname,
        |    substr(name, 1, 2) || right(name, 2) AS bk FROM base),
        |bs AS (SELECT bk FROM l GROUP BY bk HAVING count(*) <= 100000),
        |r AS (SELECT p_partkey + 100000 AS rid,
        |    substr(name, 1, 2) || substr(name, 4) AS rname,
        |    substr(name, 1, 2) || right(name, 2) AS bk
        |  FROM base WHERE p_partkey % 4 = 0),
        |cand AS (SELECT r.rid, l.lid,
        |    levenshtein(l.lname, r.rname) AS dist
        |  FROM r JOIN bs USING (bk) JOIN l USING (bk)
        |  WHERE levenshtein(l.lname, r.rname) <= 2),
        |rk AS (SELECT rid, lid, dist,
        |    row_number() OVER (PARTITION BY rid ORDER BY dist, lid) AS rk,
        |    count(*) OVER (PARTITION BY rid) AS n_cands
        |  FROM cand)
        |SELECT rid, lid, CAST(dist AS INTEGER) AS dist,
        |  CAST(n_cands AS BIGINT) AS n_cands
        |FROM rk WHERE rk = 1 ORDER BY rid""".stripMargin,

    "an1_rolling_anomaly" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, day, n,
        |    sum(n) OVER w AS s1, sum(n * n) OVER w AS s2,
        |    count(n) OVER w AS win_n
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, n, CAST(win_n AS BIGINT) AS win_n,
        |  round(CAST(s1 AS DOUBLE) / win_n, 6) AS mean,
        |  CASE WHEN win_n >= 2 AND win_n * s2 - s1 * s1 > 0
        |    THEN round(CAST(n * win_n - s1 AS DOUBLE) /
        |      sqrt(CAST((win_n * s2 - s1 * s1) * win_n AS DOUBLE)
        |        / (win_n - 1)), 4)
        |    ELSE 0.0::DOUBLE END AS z
        |FROM r ORDER BY event_type, day""".stripMargin,

    "boot1_bootstrap_ci" -> {
      import graft.functions.PortableHash
      val cases = graft.analyze.Bootstrap.PoissonCdf.zipWithIndex
        .map { case (t, k) => s"WHEN u < ${t}::DOUBLE THEN $k" }
        .mkString(" ")
      s"""WITH reps AS (SELECT unnest(range(1, 21)) AS b),
         |w AS (SELECT r.b, d.doc_id, d.n_chars,
         |    CAST(${PortableHash.hash60Sql("r.b", "CAST(d.doc_id AS VARCHAR)")}
         |      AS DOUBLE) / 1152921504606846976 AS u
         |  FROM documents d CROSS JOIN reps r),
         |pw AS (SELECT b, n_chars,
         |    CAST(CASE $cases ELSE 7 END AS BIGINT) AS wt FROM w),
         |per AS (SELECT b, CAST(sum(wt) AS BIGINT) AS n_eff,
         |    CAST(sum(wt * n_chars) AS BIGINT) AS wsum
         |  FROM pw GROUP BY b),
         |means AS (SELECT CAST(b AS INTEGER) AS b, n_eff,
         |    round(CAST(wsum AS DOUBLE) / n_eff, 6) AS mean_q FROM per),
         |ci AS (SELECT list(mean_q ORDER BY mean_q) AS arr FROM means),
         |pt AS (SELECT round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6)
         |    AS point FROM documents)
         |SELECT m.b, m.n_eff, m.mean_q, pt.point,
         |  round(ci.arr[2], 6) AS ci_lo, round(ci.arr[19], 6) AS ci_hi
         |FROM means m CROSS JOIN pt CROSS JOIN ci
         |ORDER BY m.b""".stripMargin
    },

    "ewma1_volume_trend" ->
      """WITH RECURSIVE daily AS (SELECT event_type,
        |    CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT event_type, day, x,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS INTEGER) AS i
        |  FROM daily),
        |r AS (SELECT event_type, i, day, x, x * 1000000 AS s
        |    FROM rk WHERE i = 1
        |  UNION ALL
        |  SELECT k.event_type, k.i, k.day, k.x,
        |    (k.x * 1000000 + r.s) // 2
        |  FROM rk k JOIN r ON k.event_type = r.event_type
        |    AND k.i = r.i + 1)
        |SELECT event_type, day, x AS n, CAST(s AS BIGINT) AS ewma_micro,
        |  round(CAST(s AS DOUBLE) / 1000000, 6) AS ewma
        |FROM r ORDER BY event_type, day""".stripMargin,

    "sj1_salted_agg" ->
      """SELECT l_returnflag,
        |  SUM(CAST(round(l_quantity * 1e2) AS BIGINT)) / 1e2 AS sum_qty,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "cb1_cube_revenue" ->
      s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
         |  coalesce(o_orderpriority, 'ALL') AS priority,
         |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INTEGER) AS gid,
         |  CAST(count(*) AS BIGINT) AS n_orders,
         |  ${Oracle.moneySumSql("o_totalprice")} AS revenue
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY gid, status, priority""".stripMargin,

    "bl1_bleu_pairs" -> {
      val norm = TextFunctions.normalizeSql("text")
      s"""WITH tok AS (SELECT doc_id, string_split($norm, ' ') AS toks
         |  FROM documents),
         |cand AS (SELECT doc_id // 2 AS pair_id, toks AS ct FROM tok
         |  WHERE doc_id % 2 = 0),
         |ref AS (SELECT doc_id // 2 AS pair_id, toks AS rt FROM tok
         |  WHERE doc_id % 2 = 1),
         |p AS MATERIALIZED (SELECT c.pair_id, ct, rt,
         |    len(ct) AS cand_len, len(rt) AS ref_len
         |  FROM cand c JOIN ref USING (pair_id)
         |  WHERE len(ct) >= 2 AND len(rt) >= 2),
         |cg1 AS (SELECT pair_id, g, count(*) AS cc FROM (
         |    SELECT pair_id, unnest(ct) AS g FROM p) GROUP BY 1, 2),
         |rg1 AS (SELECT pair_id, g, count(*) AS rc FROM (
         |    SELECT pair_id, unnest(rt) AS g FROM p) GROUP BY 1, 2),
         |m1 AS (SELECT pair_id, CAST(sum(least(cc, rc)) AS BIGINT) AS m1
         |  FROM cg1 JOIN rg1 USING (pair_id, g) GROUP BY pair_id),
         |cg2 AS (SELECT pair_id, g, count(*) AS cc FROM (
         |    SELECT pair_id, unnest(list_transform(generate_series(2, len(ct)),
         |      i -> ct[i - 1] || ' ' || ct[i])) AS g FROM p) GROUP BY 1, 2),
         |rg2 AS (SELECT pair_id, g, count(*) AS rc FROM (
         |    SELECT pair_id, unnest(list_transform(generate_series(2, len(rt)),
         |      i -> rt[i - 1] || ' ' || rt[i])) AS g FROM p) GROUP BY 1, 2),
         |m2 AS (SELECT pair_id, CAST(sum(least(cc, rc)) AS BIGINT) AS m2
         |  FROM cg2 JOIN rg2 USING (pair_id, g) GROUP BY pair_id),
         |scored AS (SELECT p.pair_id,
         |    CAST(cand_len AS INTEGER) AS cand_len,
         |    CAST(ref_len AS INTEGER) AS ref_len,
         |    round(coalesce(m1.m1, 0) / CAST(cand_len AS DOUBLE), 6) AS p1,
         |    round(coalesce(m2.m2, 0) / CAST(cand_len - 1 AS DOUBLE), 6) AS p2
         |  FROM p LEFT JOIN m1 USING (pair_id) LEFT JOIN m2 USING (pair_id))
         |SELECT pair_id, cand_len, ref_len, p1, p2,
         |  round(sqrt(p1 * p2), 6) AS bleu2
         |FROM scored ORDER BY pair_id""".stripMargin
    },

    "tw1_token_windows" -> {
      val norm = TextFunctions.normalizeSql("text")
      s"""WITH tok AS (SELECT doc_id, string_split($norm, ' ') AS toks
         |  FROM documents),
         |base AS (SELECT doc_id, toks FROM tok WHERE len(toks) > 0),
         |st AS (SELECT doc_id, toks,
         |    unnest(generate_series(0, len(toks) - 1, 8)) AS start
         |  FROM base)
         |SELECT doc_id,
         |  CAST(start // 8 AS INTEGER) AS window_id,
         |  CAST(start AS INTEGER) AS start,
         |  CAST(len(toks[start + 1 : start + 16]) AS INTEGER) AS n_tokens,
         |  array_to_string(toks[start + 1 : start + 16], ' ') AS window_text
         |FROM st ORDER BY doc_id, window_id""".stripMargin
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
