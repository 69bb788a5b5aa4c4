package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.tables.Tables
import Oracle._

/** Relational operator pack — SURVEY.md §2.2 (filters), §2.3 (joins),
  * §2.4 (aggregations), §2.5 (windows), §2.7 (set ops), §2.8 (scalars),
  * exercised over the driver's TPC-H-ish tables so every operator has a
  * DuckDB-checkable oracle.
  *
  * Scale posture: all aggregates are partial-aggregable (map-side combine);
  * joins keep the small side (customer/orders subsets, dimension tables)
  * broadcastable; top-k is `orderBy.limit(k)` which Spark executes as
  * per-partition TakeOrdered without a global sort.
  */
object RelationalPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A6-style multi-aggregate groupBy (reference: status/language stats,
    // chunks_backend.py:1044-1121). Exact integer-scaled money sums.
    "q1_pricing_summary" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("long")).as("sum_qty"),
          moneySum($"l_extendedprice").cast("double").as("sum_base_price"),
          moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
            .cast("double").as("sum_disc_price"),
          moneyAvg($"l_quantity").cast("double").as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // A1 distinct counts: countDistinct (reference nunique/value_counts).
    "q2_status_counts" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d)
        .groupBy($"o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          countDistinct($"o_custkey").as("n_customers"),
          moneySum($"o_totalprice").cast("double").as("sum_total"))
    }),

    // J1-style join + agg + top-k (W2). Dimension side (filtered customer)
    // broadcasts; lineitem never leaves the executors.
    "q3_top_revenue_orders" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      val ord = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey")
        .agg(moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey".asc)
        .limit(10)
    }),

    // W1/W2 rank-per-group: reference reassigns rank after every rerank
    // stage (search.py:1049); here as row_number over a window.
    "q4_top_orders_per_customer" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
        .filter($"o_custkey" <= 100)
    }),

    // W3 max-normalization window (search.py:1709-1715: score/max(score)).
    "q5_normalized_scores" -> ((s, d) => {
      import s.implicits._
      // Global max as a scalar aggregate broadcast back in — not an
      // empty-frame window (which would move the whole filtered table to
      // one partition). The filtered subtree runs twice; both runs are
      // partial-aggregable scans, which is the right 100 TB trade.
      val purchases = Tables.events(s, d).filter($"event_type" === "purchase")
      val mx = purchases.agg(max($"value").as("max_value"))
      purchases
        .crossJoin(broadcast(mx))
        .withColumn("norm_value", $"value" / $"max_value")
        .select($"event_id", $"value", $"norm_value")
        .orderBy($"event_id")
        .limit(100)
    }),

    // J3/J4 anti-join (unembedded/changed detection re-expressed).
    // Filtered to first-year orders so the result is non-degenerate
    // (every customer has SOME order in this synthetic data).
    "q6_customers_without_orders" -> ((s, d) => {
      import s.implicits._
      val early = Tables.orders(s, d)
        .filter($"o_orderdate" < lit("1996-01-01").cast("timestamp"))
      Tables.customer(s, d)
        .join(early, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_nationkey")
        .orderBy($"c_custkey")
        .limit(300)
    }),

    // OLAP rollup: subtotal lattice over (returnflag, linestatus) with
    // grouping_id disambiguating the levels — Spark's rollup mirrored
    // by DuckDB GROUP BY ROLLUP + GROUPING().
    "rb1_rollup" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_lines"),
          moneySum($"l_quantity").cast("double").as("sum_qty"))
        .orderBy($"gid", $"l_returnflag", $"l_linestatus")
    }),

    // Pivot: per-source language histogram as wide columns (absent
    // combinations zero-filled), mirrored by conditional aggregation.
    "pv1_pivot" -> ((s, d) => {
      Tables.documents(s, d).groupBy(col("source"))
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("source"))
    }),

    // Deequ-style constraint guardrails: unique key, referential
    // integrity, row-level range/domain invariants, non-null — each a
    // violation count a pipeline gates on. Violations are PLANTED
    // (duplicated keys with an orphan FK and a negative price) so the
    // detectors are exercised, not just trivially zero.
    "rc1_constraints" -> ((s, d) => {
      import graft.analyze.DataQuality
      val orders = Tables.orders(s, d)
      val planted = orders.filter(col("o_orderkey") % 997 === 7)
        .withColumn("o_custkey", lit(-1L))
        .withColumn("o_totalprice", lit(-5.0))
      val checked = orders.unionByName(planted)
      DataQuality.summarize(Seq(
        "orders_pk_unique" ->
          DataQuality.duplicateKeys(checked, Seq("o_orderkey")),
        "orders_fk_customer" ->
          DataQuality.orphans(checked, "o_custkey",
            Tables.customer(s, d), "c_custkey"),
        "orders_price_positive" ->
          DataQuality.violating(checked, col("o_totalprice") > 0),
        "orders_status_domain" ->
          DataQuality.violating(checked,
            col("o_orderstatus").isin("O", "F", "P")),
        "lineitem_qty_range" ->
          DataQuality.violating(Tables.lineitem(s, d),
            col("l_quantity") > 0 && col("l_quantity") <= 50),
        "customer_name_nonnull" ->
          DataQuality.nulls(Tables.customer(s, d), "c_name")))
        .withColumnRenamed("check", "chk")
        .orderBy(col("chk"))
    }),

    // Semi-join (EXISTS): orders having a returned line.
    "q7_orders_with_returns" -> ((s, d) => {
      import s.implicits._
      val returned = Tables.lineitem(s, d).filter($"l_returnflag" === "R")
      Tables.orders(s, d)
        .join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // J6 range/interval join (blame↔chunk line-range join analog):
    // equi-key + non-equi time-range predicate.
    "q8_shipped_within_30d" -> ((s, d) => {
      import s.implicits._
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      li.join(ord, $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 30 DAYS"))
        .agg(
          count(lit(1)).as("n_lines"),
          moneySum($"l_extendedprice").cast("double").as("sum_price"))
    }),

    // §2.7 set op: UNION of two projections (Cypher UNION analog).
    "q9_union_entities" -> ((s, d) => {
      import s.implicits._
      val c = Tables.customer(s, d)
        .select($"c_nationkey".as("nationkey"), lit("customer").as("kind"))
      val sup = Tables.supplier(s, d)
        .select($"s_nationkey".as("nationkey"), lit("supplier").as("kind"))
      c.unionByName(sup)
        .groupBy($"nationkey", $"kind").agg(count(lit(1)).as("n"))
    }),

    // A18 time-bucketed aggregation (story-phase analog): daily buckets.
    "q10_daily_event_stats" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .groupBy(to_date($"ts").as("day"), $"event_type")
        .agg(
          count(lit(1)).as("n"),
          moneySum($"value").cast("double").as("sum_value"))
    }),

    // W4 exponential time-decay weighting (knowledge_graph.py:180-220
    // semantics: 0.5^(age_days/half_life)), per-row, deterministic.
    "q11_time_decay" -> ((s, d) => {
      import s.implicits._
      val asOf = lit("2024-02-01").cast("date")
      Tables.events(s, d)
        .withColumn("age_days", datediff(asOf, to_date($"ts")))
        .withColumn("decayed",
          round($"value" * pow(lit(0.5), $"age_days" / lit(7.0)), 6))
        .select($"event_id", $"age_days", $"decayed")
        .orderBy($"event_id")
        .limit(200)
    }),

    // §2.8 scalar functions: JSON extraction (props parse), string ops,
    // conditional classification (smells-style when/otherwise rules).
    // Two-level aggregate so the JSON parse happens EXACTLY once per
    // row: a single-projection `k` referenced from the bucket whens and
    // the sum gets inlined by CollapseProject into ~4 parses per row.
    // Here the hot scan parses once into the partial agg on
    // (event_type, k); bucketing runs on the tiny aggregated set.
    "q12_json_and_case" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .select($"event_type",
          get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"event_type", $"k")
        .agg(count(lit(1)).as("n0"), sum($"k".cast("long")).as("sum_k0"))
        .withColumn("bucket",
          when($"k" < 25, "low").when($"k" < 75, "mid").otherwise("high"))
        .groupBy($"event_type", $"bucket")
        .agg(sum($"n0").as("n"), sum($"sum_k0").as("sum_k"))
    }),

    // P2/P9 predicate pack: IN-list + between + LIKE pushdown shapes.
    "q13_filtered_parts" -> ((s, d) => {
      import s.implicits._
      Tables.part(s, d)
        .filter($"p_brand".isin("Brand#1", "Brand#2", "Brand#3") &&
          $"p_size".between(5, 25) && $"p_type".like("%ECONOMY%"))
        .select($"p_partkey", $"p_name", $"p_brand", $"p_size")
        .orderBy($"p_partkey")
    }),

    // Sessionization (gaps-and-islands): per-user sessions split on
    // >30-minute inactivity gaps — the batch twin of the streaming
    // session-window semantics in graft.streaming. All-integer gap math
    // (epoch micros) so the oracle is exact.
    "q15_sessionization" -> ((s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val gapUs = 30L * 60 * 1000 * 1000
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
        .withColumn("new_session",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > gapUs, 1).otherwise(0))
        .withColumn("session_id",
          sum($"new_session").over(byUser).cast("int"))
        .groupBy($"user_id", $"session_id")
        .agg(
          min($"ts").as("session_start"),
          max($"ts").as("session_end"),
          count(lit(1)).as("n_events"),
          moneySum($"value").cast("double").as("sum_value"))
        .filter($"user_id" <= 50)
    }),

    // As-of join (click→purchase attribution): for every purchase, the
    // latest click by the same user at-or-before it — ONE partitioned
    // window over the tagged union, NOT a range join (which pairs each
    // purchase with every prior click before deduping). All ts math in
    // epoch micros so the oracle is exact; nulls = never-clicked users.
    "af1_asof_attribution" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts")
      graft.util.AsOfJoin.asOf(purchases, "event_id", clicks, "event_id",
          "user_id", "ts", Seq("event_id", "ts"))
        .select($"event_id", $"user_id",
          unix_micros($"ts").as("ts_us"),
          $"asof_event_id".as("click_id"),
          unix_micros($"asof_ts").as("click_ts_us"),
          (unix_micros($"ts") - unix_micros($"asof_ts")).as("lag_us"))
        .orderBy($"event_id")
    }),

    // Ordered funnel: signup → first click strictly after → first
    // purchase strictly after that — per-stage conditional min over a
    // user-keyed join, all integer micros.
    "fn1_funnel" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).select($"user_id",
        unix_micros($"ts").as("tus"), $"event_type")
      graft.analyze.Funnel.ordered(e, "user_id", "tus", "event_type",
          Seq("signup", "click", "purchase"))
        .orderBy($"user_id")
    }),

    // Weekly cohort retention: cohort = week of first signup; retained
    // = any activity in a later week. Integer week math in epoch micros.
    "rt1_retention" -> ((s, d) => {
      import s.implicits._
      val e = Tables.events(s, d).select($"user_id",
        unix_micros($"ts").as("tus"), $"event_type")
      graft.analyze.Retention.weeklyCohorts(e, "user_id", "tus",
          "event_type", "signup")
        .orderBy($"cohort_week", $"week_offset")
    }),

    // Multi-way dim join through the star schema (region→nation→customer
    // →orders→lineitem), revenue by region: the canonical broadcast chain.
    "q14_revenue_by_region" -> ((s, d) => {
      import s.implicits._
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(moneySum($"l_extendedprice" * (lit(1) - $"l_discount"), 4)
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }))

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  CAST(${moneySumSql("l_extendedprice")} AS DOUBLE) AS sum_base_price,
         |  CAST(${moneySumSql("l_extendedprice * (1 - l_discount)", 4)} AS DOUBLE) AS sum_disc_price,
         |  CAST(${moneyAvgSql("l_quantity")} AS DOUBLE) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_status_counts" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |  COUNT(DISTINCT o_custkey) AS n_customers,
         |  CAST(${moneySumSql("o_totalprice")} AS DOUBLE) AS sum_total
         |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q3_top_revenue_orders" ->
      s"""SELECT l_orderkey,
         |  CAST(${moneySumSql("l_extendedprice * (1 - l_discount)", 4)} AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q4_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders)
        |WHERE rn <= 3 AND o_custkey <= 100""".stripMargin,

    "q5_normalized_scores" ->
      """SELECT event_id, value, value / (MAX(value) OVER ()) AS norm_value
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id LIMIT 100""".stripMargin,

    "q6_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate < TIMESTAMP '1996-01-01')
        |ORDER BY c_custkey LIMIT 300""".stripMargin,

    "rb1_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
         |  COUNT(*) AS n_lines,
         |  CAST(${moneySumSql("l_quantity")} AS DOUBLE) AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "pv1_pivot" ->
      """SELECT source,
        |  CAST(count(CASE WHEN lang = 'de' THEN 1 END) AS BIGINT) AS de,
        |  CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS en,
        |  CAST(count(CASE WHEN lang = 'es' THEN 1 END) AS BIGINT) AS es,
        |  CAST(count(CASE WHEN lang = 'fr' THEN 1 END) AS BIGINT) AS fr,
        |  CAST(count(CASE WHEN lang = 'zh' THEN 1 END) AS BIGINT) AS zh
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "rc1_constraints" ->
      """WITH planted AS (SELECT o_orderkey, CAST(-1 AS BIGINT) AS o_custkey,
        |    o_orderstatus, CAST(-5.0 AS DOUBLE) AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 997 = 7),
        |checked AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority FROM orders
        |  UNION ALL SELECT * FROM planted)
        |SELECT chk, violations FROM (
        |  SELECT 'orders_pk_unique' AS chk, CAST((SELECT count(*)
        |    FROM checked WHERE o_orderkey IN (SELECT o_orderkey
        |      FROM checked GROUP BY o_orderkey HAVING count(*) > 1))
        |    AS BIGINT) AS violations
        |  UNION ALL
        |  SELECT 'orders_fk_customer', CAST((SELECT count(*) FROM checked
        |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |    AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders_price_positive', CAST((SELECT count(*) FROM checked
        |    WHERE NOT coalesce(o_totalprice > 0, FALSE)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'orders_status_domain', CAST((SELECT count(*) FROM checked
        |    WHERE NOT coalesce(o_orderstatus IN ('O', 'F', 'P'), FALSE))
        |    AS BIGINT)
        |  UNION ALL
        |  SELECT 'lineitem_qty_range', CAST((SELECT count(*) FROM lineitem
        |    WHERE NOT coalesce(l_quantity > 0 AND l_quantity <= 50, FALSE))
        |    AS BIGINT)
        |  UNION ALL
        |  SELECT 'customer_name_nonnull', CAST((SELECT count(*) FROM customer
        |    WHERE c_name IS NULL) AS BIGINT))
        |ORDER BY chk""".stripMargin,

    "q7_orders_with_returns" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin,

    "q8_shipped_within_30d" ->
      s"""SELECT COUNT(*) AS n_lines,
         |  CAST(${moneySumSql("l_extendedprice")} AS DOUBLE) AS sum_price
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE l_shipdate >= o_orderdate
         |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY""".stripMargin,

    "q9_union_entities" ->
      """SELECT nationkey, kind, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS kind FROM supplier)
        |GROUP BY nationkey, kind""".stripMargin,

    "q10_daily_event_stats" ->
      s"""SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,
         |  CAST(${moneySumSql("value")} AS DOUBLE) AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q11_time_decay" ->
      """SELECT event_id,
        |  CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS INTEGER) AS age_days,
        |  round(value * pow(0.5, date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') / 7.0), 6) AS decayed
        |FROM events ORDER BY event_id LIMIT 200""".stripMargin,

    "q12_json_and_case" ->
      """SELECT event_type,
        |  CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) < 25 THEN 'low'
        |       WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) < 75 THEN 'mid'
        |       ELSE 'high' END AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q13_filtered_parts" ->
      """SELECT p_partkey, p_name, p_brand, p_size FROM part
        |WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND p_size BETWEEN 5 AND 25 AND p_type LIKE '%ECONOMY%'
        |ORDER BY p_partkey""".stripMargin,

    "q15_sessionization" ->
      s"""WITH marked AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
         |      OR epoch_us(CAST(ts AS TIMESTAMP))
         |         - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w > 1800000000
         |    THEN 1 ELSE 0 END AS new_session
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
         |sessions AS (
         |  SELECT user_id, event_id, ts, value,
         |    CAST(SUM(new_session) OVER (PARTITION BY user_id
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS INTEGER) AS session_id
         |  FROM marked)
         |SELECT user_id, session_id,
         |  MIN(CAST(ts AS TIMESTAMP)) AS session_start,
         |  MAX(CAST(ts AS TIMESTAMP)) AS session_end,
         |  COUNT(*) AS n_events,
         |  CAST(${moneySumSql("value")} AS DOUBLE) AS sum_value
         |FROM sessions WHERE user_id <= 50
         |GROUP BY user_id, session_id""".stripMargin,

    "af1_asof_attribution" ->
      s"""WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         |    event_id FROM events WHERE event_type = 'click'),
         |p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
         |    event_id FROM events WHERE event_type = 'purchase'),
         |u AS (
         |  SELECT user_id, tus, 0 AS side, event_id AS ord,
         |    event_id AS c_id, tus AS c_tus, NULL::BIGINT AS p_id
         |  FROM c
         |  UNION ALL
         |  SELECT user_id, tus, 1, event_id,
         |    NULL::BIGINT, NULL::BIGINT, event_id
         |  FROM p),
         |w AS (SELECT *,
         |    last_value(c_id IGNORE NULLS) OVER win AS click_id,
         |    last_value(c_tus IGNORE NULLS) OVER win AS click_ts_us
         |  FROM u WINDOW win AS (PARTITION BY user_id
         |    ORDER BY tus, side, ord ROWS UNBOUNDED PRECEDING))
         |SELECT p_id AS event_id, user_id, tus AS ts_us,
         |  click_id, click_ts_us, tus - click_ts_us AS lag_us
         |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin,

    "fn1_funnel" ->
      s"""WITH e AS (SELECT user_id, event_type,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
         |s1 AS (SELECT user_id, min(tus) AS ts_1 FROM e
         |  WHERE event_type = 'signup' GROUP BY user_id),
         |s2 AS (SELECT s1.user_id, ts_1,
         |    min(CASE WHEN e.tus > ts_1 THEN e.tus END) AS ts_2
         |  FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
         |    AND e.event_type = 'click'
         |  GROUP BY s1.user_id, ts_1),
         |s3 AS (SELECT s2.user_id, ts_1, ts_2,
         |    min(CASE WHEN e.tus > ts_2 THEN e.tus END) AS ts_3
         |  FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
         |    AND e.event_type = 'purchase'
         |  GROUP BY s2.user_id, ts_1, ts_2)
         |SELECT user_id, ts_1, ts_2, ts_3,
         |  CAST((CASE WHEN ts_1 IS NOT NULL THEN 1 ELSE 0 END)
         |    + (CASE WHEN ts_2 IS NOT NULL THEN 1 ELSE 0 END)
         |    + (CASE WHEN ts_3 IS NOT NULL THEN 1 ELSE 0 END)
         |    AS INTEGER) AS stage
         |FROM s3 ORDER BY user_id""".stripMargin,

    "rt1_retention" ->
      s"""WITH e AS (SELECT user_id, event_type,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
         |c AS (SELECT user_id,
         |    min(tus) // ${graft.analyze.Retention.WeekUs} AS cohort_week
         |  FROM e WHERE event_type = 'signup' GROUP BY user_id),
         |a AS (SELECT DISTINCT user_id,
         |    tus // ${graft.analyze.Retention.WeekUs} AS week FROM e)
         |SELECT cohort_week, week - cohort_week AS week_offset,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM c JOIN a USING (user_id)
         |WHERE week >= cohort_week
         |GROUP BY cohort_week, week - cohort_week
         |ORDER BY cohort_week, week_offset""".stripMargin,

    "q14_revenue_by_region" ->
      s"""SELECT r_name,
         |  CAST(${moneySumSql("l_extendedprice * (1 - l_discount)", 4)} AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin)
}
