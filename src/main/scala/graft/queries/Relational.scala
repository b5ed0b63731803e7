package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Exact._
import graft.operators.CoreOps

/** The reference's relational surface (SURVEY.md §2) re-expressed over the
  * driver's TPC-H-ish test tables, each with a DuckDB oracle.
  *
  * Determinism contract (needed for hash-compare and for reproducible results
  * at 100 TB): sums of non-integral doubles go through [[graft.functions.Exact]]
  * (order-independent decimal accumulation); order-dependent-by-nature stats
  * (stddev/variance/percentile) are rounded to 4 decimals on both sides;
  * every LIMIT / row_number has a total-order tiebreak.
  */
object Relational {

  private def ts(s: String) = to_timestamp(lit(s))

  // ---------------------------------------------------------------- scans

  /** S1/P1-P4: projection + pushed-down closed-interval time predicate +
    * range predicate. `.explain` shows PushedFilters + pruned ReadSchema. */
  private val q01 = QueryDef(
    "q01_scan_filter",
    (s, d) => CoreOps.scanWithPredicates(
      Tables.lineitem(s, d),
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
      "l_orderkey", None, "l_shipdate",
      Some(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
      Some(java.sql.Timestamp.valueOf("1996-12-31 00:00:00")))
      .where(col("l_quantity") >= 45),
    """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      |  AND l_quantity >= 45""".stripMargin)

  /** S3/O2: point lookup by primary key, LIMIT 1. */
  private val q02 = QueryDef(
    "q02_pk_lookup",
    (s, d) => Tables.orders(s, d)
      .where(col("o_orderkey") === 42)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .limit(1),
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      |FROM orders WHERE o_orderkey = 42 LIMIT 1""".stripMargin)

  /** S4/O1: latest-row tail read (ledger pattern) — TakeOrderedAndProject,
    * i.e. per-partition top-1 then driver merge; no global sort. */
  private val q03 = QueryDef(
    "q03_latest_event",
    (s, d) => Tables.events(s, d)
      .orderBy(col("ts").desc, col("event_id").desc)
      .select("event_id", "ts", "event_type", "value")
      .limit(1),
    """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
      |FROM events ORDER BY ts DESC, event_id DESC LIMIT 1""".stripMargin)

  // ---------------------------------------------------------------- joins

  /** J1: active-keys distinct join (reference FindActiveBusses,
    * processor/main.py:169-182) — time-filtered fact × broadcast dim. */
  private val q04 = QueryDef(
    "q04_active_keys",
    (s, d) => CoreOps.activeKeys(
      Tables.orders(s, d), Tables.customer(s, d),
      col("o_custkey") === col("c_custkey"),
      col("o_orderdate"), ts("1997-01-01"), ts("1997-12-31"),
      Seq(col("o_custkey"), col("c_nationkey"))),
    """SELECT DISTINCT o_custkey, c_nationkey
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'""".stripMargin)

  /** A1: scalar count of the distinct active keys (ValueResult analog). */
  private val q05 = QueryDef(
    "q05_active_count",
    (s, d) => q04.spark(s, d).agg(count(lit(1)).as("active_customers")),
    """SELECT CAST(count(*) AS BIGINT) AS active_customers FROM (
      |  SELECT DISTINCT o_custkey, c_nationkey
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
      |) t""".stripMargin)

  /** Multi-join aggregate (TPC-H Q5 shape): fact × 2 mid dims × 3 broadcast
    * dims, one shuffle for the final groupBy. Exercises join reorder + AQE. */
  private val q06 = QueryDef(
    "q06_regional_revenue",
    (s, d) => {
      val c = Tables.customer(s, d); val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d); val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d);   val r = Tables.region(s, d)
      l.join(o.where(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(su), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r.where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    },
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name""".stripMargin)

  /** J2: non-equi interval join (window×telemetry correlation analog):
    * equi key + range predicate, so it still plans as a shuffled hash join
    * on the key with the range as a post-join filter — no cartesian. */
  private val q07 = QueryDef(
    "q07_interval_join",
    (s, d) => Tables.orders(s, d)
      .join(Tables.lineitem(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late")),
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
      |FROM orders JOIN lineitem
      |  ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      |GROUP BY o_orderpriority""".stripMargin)

  /** Semi join: keys with ≥1 match in a time slice (EXISTS). */
  private val q08 = QueryDef(
    "q08_semi_join",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .where(col("o_orderdate").between(ts("1995-01-01"), ts("1995-03-31"))),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name"),
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31')""".stripMargin)

  /** Anti join: keys with no match in a time slice (NOT EXISTS). */
  private val q09 = QueryDef(
    "q09_anti_join",
    (s, d) => Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .where(col("o_orderdate").between(ts("1995-01-01"), ts("1995-03-31"))),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name"),
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-03-31')""".stripMargin)

  // ----------------------------------------------------------- aggregates

  /** A3-A5/A8/A9: pricing-summary hash aggregate (TPC-H Q1 shape). Integral
    * doubles sum exactly; monetary sums use exact decimal accumulation. */
  private val q10 = QueryDef(
    "q10_pricing_summary",
    (s, d) => graft.operators.Fanout.spread(Tables.lineitem(s, d)
        .where(col("l_shipdate") <= ts("2001-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order")),
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  SUM(l_quantity) / count(*) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin)

  /** A6: guarded ratio — NULL on non-positive denominator, never ±Inf
    * (reference processor/main.py:509-513). */
  private val q11 = QueryDef(
    "q11_guarded_ratio",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        dsumIf(col("event_type") === "purchase", col("value"))
          .as("purchase_sum"),
        dsumIf(col("event_type") === "click", col("value")).as("click_sum"))
      .withColumn("purchase_per_click",
        guardedRatio(col("purchase_sum"), col("click_sum"))),
    """SELECT user_id, purchase_sum, click_sum,
      |  CASE WHEN click_sum > 0 THEN purchase_sum / click_sum END AS purchase_per_click
      |FROM (
      |  SELECT user_id,
      |    COALESCE(CAST(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 0.0) AS purchase_sum,
      |    COALESCE(CAST(CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 0.0) AS click_sum
      |  FROM events GROUP BY user_id
      |) t""".stripMargin)

  /** A7/A8: conditional count over a compound predicate + fraction of total
    * (reference dwell-time / door-open-fraction, processor/main.py:533-543). */
  private val q12 = QueryDef(
    "q12_dwell_fraction",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        countIf(col("event_type") === "click" && col("value") < 50)
          .as("dwell_s"),
        count(lit(1)).as("total_s"))
      .withColumn("dwell_fraction",
        col("dwell_s").cast("double") / col("total_s").cast("double")),
    """SELECT user_id, dwell_s, total_s,
      |  CAST(dwell_s AS DOUBLE) / CAST(total_s AS DOUBLE) AS dwell_fraction
      |FROM (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'click' AND value < 50 THEN 1 ELSE 0 END) AS BIGINT) AS dwell_s,
      |    CAST(count(*) AS BIGINT) AS total_s
      |  FROM events GROUP BY user_id
      |) t""".stripMargin)

  /** A2: exact median (pandas-style linear interpolation — Spark `percentile`
    * and DuckDB `quantile_cont` share the formula). Scale mode: swap for
    * percentile_approx. */
  private val q13 = QueryDef(
    "q13_median",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(round(percentile(col("value"), lit(0.5)), 4).as("median_value")),
    """SELECT event_type, round(quantile_cont(value, 0.5), 4) AS median_value
      |FROM events GROUP BY event_type""".stripMargin)

  /** A13: describe() — count/min/max/quartiles/mean in one aggregation. */
  private val q14 = QueryDef(
    "q14_describe",
    (s, d) => CoreOps.describeStats(
      Tables.events(s, d), Seq(col("event_type")), col("value")),
    """SELECT event_type,
      |  CAST(count(value) AS BIGINT) AS n,
      |  min(value) AS vmin, max(value) AS vmax,
      |  round(quantile_cont(value, 0.25), 4) AS p25,
      |  round(quantile_cont(value, 0.50), 4) AS p50,
      |  round(quantile_cont(value, 0.75), 4) AS p75,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(value) AS mean_v
      |FROM events GROUP BY event_type""".stripMargin)

  /** A9-A12: dispersion stats — sample stddev/variance (ddof=1, pandas
    * default) and 95th percentile. */
  private val q15 = QueryDef(
    "q15_dispersion",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        davg(col("value")).as("mean_v"),
        round(stddev_samp(col("value")), 4).as("std_v"),
        round(var_samp(col("value")), 4).as("var_v"),
        round(percentile(col("value"), lit(0.95)), 4).as("p95_v")),
    """SELECT event_type,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(value) AS mean_v,
      |  round(stddev_samp(value), 4) AS std_v,
      |  round(var_samp(value), 4) AS var_v,
      |  round(quantile_cont(value, 0.95), 4) AS p95_v
      |FROM events GROUP BY event_type""".stripMargin)

  // ----------------------------------------------- analytic window functions

  /** W1/W2: first/second difference over an ordered per-key signal
    * (accel/jerk, reference processor/main.py:563-565). Row-level output;
    * IEEE subtraction is order-free so no rounding needed. */
  private val q16 = QueryDef(
    "q16_diff_lag",
    (s, d) => CoreOps.diff2(
      Tables.events(s, d),
      Seq(col("user_id")), Seq(col("ts"), col("event_id")),
      col("value"), "accel", "jerk")
      .select("user_id", "event_id", "accel", "jerk"),
    """WITH diffs AS (
      |  SELECT user_id, ts, event_id,
      |    COALESCE(value - LAG(value) OVER w, 0.0) AS accel
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT user_id, event_id, accel,
      |  COALESCE(accel - LAG(accel) OVER w2, 0.0) AS jerk
      |FROM diffs
      |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)

  /** W1/W2 + A9/A10/A12 composed: per-key comfort metrics over the derived
    * diffs (reference ComfortAndSafetyPerMinute, processor/main.py:558-573).
    * The diff window and the groupBy share the user_id partitioning — one
    * shuffle total. */
  private val q17 = QueryDef(
    "q17_comfort_metrics",
    (s, d) => CoreOps.diff2(
      Tables.events(s, d),
      Seq(col("user_id")), Seq(col("ts"), col("event_id")),
      col("value"), "accel", "jerk")
      .groupBy(col("user_id"))
      .agg(
        davg(col("accel")).as("accel_mean"),
        round(stddev_samp(col("accel")), 4).as("accel_std"),
        round(percentile(col("jerk"), lit(0.95)), 4).as("jerk_p95")),
    """WITH diffs AS (
      |  SELECT user_id, ts, event_id,
      |    COALESCE(value - LAG(value) OVER w, 0.0) AS accel
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), diffs2 AS (
      |  SELECT user_id, accel,
      |    COALESCE(accel - LAG(accel) OVER w2, 0.0) AS jerk
      |  FROM diffs
      |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT user_id,
      |  CAST(CAST(SUM(CAST(accel AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(accel) AS accel_mean,
      |  round(stddev_samp(accel), 4) AS accel_std,
      |  round(quantile_cont(jerk, 0.95), 4) AS jerk_p95
      |FROM diffs2 GROUP BY user_id""".stripMargin)

  /** W3-W6: gaps-and-islands session runs — one row per maximal contiguous
    * run of a boolean flag per key (reference HaltBrakeApplied sessions,
    * processor/main.py:299-337), whole-partition computation replacing the
    * reference's cross-minute lookback loop. */
  private val q18 = QueryDef(
    "q18_flag_runs",
    (s, d) => CoreOps.flagRuns(
      Tables.events(s, d),
      Seq(col("user_id")), Seq(col("ts"), col("event_id")),
      col("value") >= 250),
    """WITH flagged AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    (value >= 250) AS flag
      |  FROM events
      |), chg AS (
      |  SELECT *, CASE WHEN LAG(flag) OVER w IS NULL
      |                   OR LAG(flag) OVER w <> flag THEN 1 ELSE 0 END AS c
      |  FROM flagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), runs AS (
      |  SELECT *, SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                         ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM chg
      |)
      |SELECT user_id, min(ts) AS start_ts, max(ts) AS end_ts,
      |  CAST(count(*) AS BIGINT) AS n_rows
      |FROM runs WHERE flag GROUP BY user_id, run_id""".stripMargin)

  // -------------------------------------------- sort / top-k / time windows

  /** Top-k per group via row_number with a total-order tiebreak — plans as a
    * windowed rank inside each hash partition, no global sort. */
  private val q19 = QueryDef(
    "q19_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select("c_mktsegment", "rk", "c_custkey", "c_acctbal")
    },
    """SELECT c_mktsegment, rk, c_custkey, c_acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    row_number() OVER (PARTITION BY c_mktsegment
      |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM customer
      |) t WHERE rk <= 3""".stripMargin)

  /** E1/E3: tumbling 1-minute event-time windows keyed by type — the batch
    * equivalent of the reference's EveryMinute × algorithm grid
    * (SURVEY §2.8). date_trunc keeps the grouping key codegen-friendly. */
  private val q20 = QueryDef(
    "q20_minute_window",
    (s, d) => Tables.events(s, d)
      .groupBy(date_trunc("minute", col("ts")).as("minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")),
    """SELECT CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute, event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin)

  /** Set ops: UNION ALL of two slices then aggregate (reference lookback-page
    * concat, processor/main.py:277,287). */
  private val q21 = QueryDef(
    "q21_union_slices",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      l.where(col("l_quantity") <= 5).select("l_returnflag")
        .unionByName(l.where(col("l_quantity") >= 45).select("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
    },
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT l_returnflag FROM lineitem WHERE l_quantity <= 5
      |  UNION ALL
      |  SELECT l_returnflag FROM lineitem WHERE l_quantity >= 45
      |) t GROUP BY l_returnflag""".stripMargin)

  /** Hierarchical rollup (extension beyond the reference surface — grouping
    * sets come free with the declarative plan): per (returnflag, linestatus)
    * plus subtotals and grand total. */
  private val q22 = QueryDef(
    "q22_rollup",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n")),
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)

  /** Running (prefix) sum per key — cumulative window aggregate; sequential
    * in-order accumulation is deterministic on both engines. */
  private val q23 = QueryDef(
    "q23_running_sum",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("running_value",
          sum(col("value").cast(graft.functions.Exact.SumDecimal)).over(w)
            .cast("double"))
        .select("user_id", "event_id", "running_value")
    },
    """SELECT user_id, event_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS running_value
      |FROM events""".stripMargin)

  /** Scale-mode approximations: HyperLogLog distinct counts and t-digest
    * percentiles — the documented 100 TB substitutes for exact
    * countDistinct/percentile. No DuckDB oracle (sketch algorithms differ
    * across engines); the driver records a rows-only check, and
    * ApproxSpec bounds the error against the exact operators. */
  private val q24 = QueryDef(
    "q24_approx_scale_mode",
    (s, d) => Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_median"),
        count(lit(1)).as("n")),
    None)

  /** As-of join: each purchase gets the user's most recent prior click —
    * composed from built-ins (one keyed window pass), oracled against
    * DuckDB's native ASOF JOIN. */
  private val q25 = QueryDef(
    "q25_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      CoreOps.asofJoin(
        ev.where(col("event_type") === "purchase"),
        ev.where(col("event_type") === "click"),
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ts",
        carry = Map("ts" -> "last_click_ts", "value" -> "last_click_value"))
        .select("user_id", "event_id", "ts", "last_click_ts",
          "last_click_value")
    },
    """SELECT p.user_id, p.event_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |  CAST(c.ts AS TIMESTAMP) AS last_click_ts,
      |  c.value AS last_click_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)

  /** JSON metadata extraction (events.props is a JSON string — the shape of
    * per-record metadata in training pipelines). */
  private val q26 = QueryDef(
    "q26_json_extract",
    (s, d) => Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("prop_k")),
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      |FROM events""".stripMargin)

  /** Pivot: wide per-key feature table (one column per event type) — the
    * shape a feature-engineering pipeline feeds to training. Expressed as
    * conditional aggregation in the oracle (portable, same values). */
  private val q27 = QueryDef(
    "q27_pivot",
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(dsum(col("value")))
        .na.fill(0.0, types)
    },
    """SELECT user_id,
      |  COALESCE(CAST(CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 0.0) AS click,
      |  COALESCE(CAST(CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 0.0) AS error,
      |  COALESCE(CAST(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 0.0) AS purchase,
      |  COALESCE(CAST(CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 0.0) AS signup,
      |  COALESCE(CAST(CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(28,10)) END) AS VARCHAR) AS DOUBLE), 0.0) AS view
      |FROM events GROUP BY user_id""".stripMargin)

  /** Bivariate stats: correlation/covariance between the value signal and
    * the JSON-extracted metadata field. */
  private val q28 = QueryDef(
    "q28_corr_covar",
    (s, d) => Tables.events(s, d)
      .withColumn("prop_k", get_json_object(col("props"), "$.k").cast("double"))
      .groupBy(col("event_type"))
      .agg(
        round(corr(col("value"), col("prop_k")), 4).as("corr_vk"),
        round(covar_samp(col("value"), col("prop_k")), 4).as("covar_vk")),
    """SELECT event_type,
      |  round(corr(value, prop_k), 4) AS corr_vk,
      |  round(covar_samp(value, prop_k), 4) AS covar_vk
      |FROM (SELECT event_type, value,
      |        CAST(json_extract_string(props, '$.k') AS DOUBLE) AS prop_k
      |      FROM events) t
      |GROUP BY event_type""".stripMargin)

  /** Sliding (hopping) event-time windows: 5-minute windows every minute —
    * each event lands in 5 overlapping windows. */
  private val q29 = QueryDef(
    "q29_sliding_window",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value")),
    """SELECT CAST(date_trunc('minute', ts) - i * INTERVAL 1 MINUTE AS TIMESTAMP)
      |    AS window_start,
      |  event_type,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_value
      |FROM events, UNNEST(generate_series(0, 4)) AS t(i)
      |GROUP BY 1, 2""".stripMargin)

  /** Promo-revenue ratio (TPC-H Q14 shape): LIKE-pattern predicate on a
    * broadcast dimension, conditional exact sums, guarded percentage. */
  private val q44 = QueryDef(
    "q44_promo_ratio",
    (s, d) => Tables.lineitem(s, d)
      .where(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-07-01"))
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .agg(
        dsumIf(col("p_type").like("PROMO%"),
          col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("promo_revenue"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      .withColumn("promo_pct",
        lit(100.0) * col("promo_revenue") / col("total_revenue")),
    """SELECT promo_revenue, total_revenue,
      |  100.0 * promo_revenue / total_revenue AS promo_pct
      |FROM (
      |  SELECT
      |    COALESCE(CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |      THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)) END)
      |      AS VARCHAR) AS DOUBLE), 0.0) AS promo_revenue,
      |    CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,10)))
      |      AS VARCHAR) AS DOUBLE) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-07-01'
      |) t""".stripMargin)

  /** W4 + A13 composed — per-SESSION describe stats (the reference's 32
    * brake-session stats algorithms, other_metrics.py:41-246, faithfully
    * triggered on flag-run windows, windows.py:25-37): run detection and the
    * full describe in ONE aggregation via [[CoreOps.flagRunAgg]] — no
    * session × samples re-read. The ztbus face is
    * [[graft.ztbus.Algorithms.brakeSessionStats]] (16 columns × 2 triggers);
    * this single-column form is the oracle-checkable equivalent. */
  private val q47 = QueryDef(
    "q47_session_stats",
    (s, d) => CoreOps.flagRunAgg(
      Tables.events(s, d), Seq(col("user_id")), Seq(col("ts"), col("event_id")),
      col("value") >= 250,
      Seq(
        davg(col("value")).as("mean_v"),
        round(stddev_samp(col("value")), 4).as("std_v"),
        min(col("value")).as("vmin"),
        round(percentile(col("value"), lit(0.25)), 4).as("p25"),
        round(percentile(col("value"), lit(0.50)), 4).as("p50"),
        round(percentile(col("value"), lit(0.75)), 4).as("p75"),
        max(col("value")).as("vmax")),
      runStart = "time_from", runEnd = "time_to", runLen = "n_samples"),
    """WITH flagged AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
      |    (value >= 250) AS flag
      |  FROM events
      |), chg AS (
      |  SELECT *, CASE WHEN LAG(flag) OVER w IS NULL
      |                   OR LAG(flag) OVER w <> flag THEN 1 ELSE 0 END AS c
      |  FROM flagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), runs AS (
      |  SELECT *, SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                         ROWS UNBOUNDED PRECEDING) AS run_id
      |  FROM chg
      |)
      |SELECT user_id, min(ts) AS time_from, max(ts) AS time_to,
      |  CAST(count(*) AS BIGINT) AS n_samples,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) / count(value) AS mean_v,
      |  round(stddev_samp(value), 4) AS std_v,
      |  min(value) AS vmin,
      |  round(quantile_cont(value, 0.25), 4) AS p25,
      |  round(quantile_cont(value, 0.50), 4) AS p50,
      |  round(quantile_cont(value, 0.75), 4) AS p75,
      |  max(value) AS vmax
      |FROM runs WHERE flag GROUP BY user_id, run_id""".stripMargin)

  /** Full grouping-set lattice — CUBE over (returnflag, linestatus) with
    * `grouping_id` distinguishing the four lattice levels (a NULL group key
    * from the cube vs a NULL in the data are different rows). q22 covers
    * the ROLLUP prefix-lattice; this is the complete one. */
  private val q75 = QueryDef(
    "q75_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
        grouping_id().cast("long").as("gid")),
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty, CAST(count(*) AS BIGINT) AS n,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)

  /** Value-based (RANGE) window frame: per-user trailing 10-minute sum over
    * event time — the sensor-adjacent "rolling window by TIME, not by row
    * count" shape. The frame is keyed on epoch SECONDS (integer on both
    * engines), so rows sharing a timestamp share a frame and the result is
    * order-independent; the sum itself rides the exact-decimal pattern.
    *
    * The epoch key goes through an explicit `timestamp_ltz` hop: parquet
    * writers flip between instant (isAdjustedToUTC) and naive timestamps,
    * and Spark forbids a direct TIMESTAMP_NTZ → BIGINT cast. NTZ → LTZ
    * interprets the wall clock in the session zone (pinned UTC here), which
    * is exactly DuckDB's `epoch_us` reading of a naive timestamp; for an
    * instant-typed file the hop is a no-op. */
  private val q76 = QueryDef(
    "q76_range_frame",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("timestamp_ltz").cast("long"))
        .rangeBetween(-600, 0)
      Tables.events(s, d)
        .withColumn("win_sum",
          sum(col("value").cast(graft.functions.Exact.SumDecimal)).over(w)
            .cast("double"))
        .select("user_id", "event_id", "win_sum")
    },
    """SELECT user_id, event_id,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) OVER (
      |    PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
      |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
      |    AS win_sum
      |FROM events""".stripMargin)

  /** Analytic rank family over an ordered per-key frame: `percent_rank`,
    * `cume_dist`, and `ntile` quartiles per user's value history. All three
    * are rank-arithmetic (no floating aggregation), so cross-engine
    * equality is exact as long as the ORDER is total — `(value, event_id)`
    * breaks value ties deterministically. */
  private val q77 = QueryDef(
    "q77_rank_family",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(4).over(w).cast("long").as("quartile"))
    },
    """SELECT user_id, event_id,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cume,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin)

  val all: Seq[QueryDef] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q28, q29, q44, q47, q75, q76, q77)
}
