package graft.queries

import graft.Tables
import graft.operators.Taxonomy
import graft.util.Materialize.MatOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A named query: the Spark implementation plus (optionally) the
  * equivalent ANSI SQL for the DuckDB oracle. Column names and row order
  * must agree exactly between the two (the driver sorts columns by name
  * and hashes values).
  *
  * Cross-engine float parity rules used throughout:
  *   - aggregate in exact decimal/integer arithmetic, cast to double once
  *     at the end (double SUM is partition-order-sensitive; decimal isn't)
  *   - per-row scalar double math is IEEE-deterministic and safe
  *   - never emit raw timestamps (format to strings); never emit decimals
  *     (schema widths differ) — only string/long/double/int columns
  *   - every query ends in a total order (unique tie-break column)
  */
case class Q(name: String, oracle: Option[String],
             fn: (SparkSession, String) => DataFrame)

/** Relational operator coverage (SURVEY.md §2.2-§2.7) expressed over the
  * driver's TPC-H-ish tables. Each query names the operator family it
  * certifies.
  */
object RelationalQueries {

  // Money math parity rule: the source doubles carry <= 2 decimal places,
  // so casting each INPUT to decimal(.,2) is exact in both engines; all
  // products/sums then run in exact decimal arithmetic (order-independent)
  // and convert to double once at the end. Casting a *computed double* to
  // decimal instead would diverge: Spark rounds via the shortest string
  // representation, DuckDB via the exact binary value.
  private val dec = "decimal(23,8)" // for <=2dp inputs: exact in both engines
  private def d2(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  // Fixed 7-day epoch week bucket as a FLOOR division (ADVICE r14):
  // Spark's `div` truncates toward zero while the DuckDB oracle's `//`
  // floors, so a bare `cast(ts as long) div 604800` diverges for
  // pre-1970 timestamps (the timestamp->long cast itself floor-divides
  // micros on both engines). pmod is non-negative for a positive
  // divisor, so (x - pmod(x, w)) div w is exact integer floor division
  // at any sign — parity holds on any epoch, not just the fixtures'.
  private[queries] def weekFloor = expr(
    "(cast(ts as long) - pmod(cast(ts as long), 604800)) div 604800")

  val all: Seq[Q] = Seq(

    // A: multi-aggregate groupBy with exact accumulation (TPC-H Q1 shape)
    Q("q01_pricing_summary", Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(d2(col("l_extendedprice"))).cast("double").as("sum_base"),
          sum(d2(col("l_extendedprice")) * (lit(1) - d2(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          sum(d2(col("l_extendedprice")) * (lit(1) - d2(col("l_discount")))
            * (lit(1) + d2(col("l_tax"))))
            .cast("double").as("sum_charge"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),

    // K: ORDER BY ... LIMIT compiles to TakeOrderedAndProject (no global sort)
    Q("q02_top_orders", Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10"""),
      (s, d) => Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)),

    // J: 3-way join; customer is broadcast (dims stay broadcast-sized at
    // any lineitem scale), lineitem⋈orders shuffles on the join key once
    Q("q03_segment_revenue", Some("""
      SELECT c_mktsegment,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          sum(d2(col("l_extendedprice")) * (lit(1) - d2(col("l_discount"))))
            .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy("c_mktsegment")),

    // J/semi: EXISTS as left_semi — no fan-out, no dedup needed
    Q("q04_priority_semi", Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
      (s, d) => Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") >= 45),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")),

    // J/anti: NOT EXISTS as left_anti (reference orphan pattern J8)
    Q("q05_custs_without_big_orders", Some("""
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_custs
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      GROUP BY n_name
      ORDER BY n_name"""),
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 100000)
          .select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_custs"))
        .orderBy("n_name")),

    // F: predicate pushdown — all three filters reach the parquet scan
    Q("q06_filtered_revenue", Some("""
      SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem
      WHERE EXTRACT(year FROM l_shipdate) = 1996
        AND l_discount BETWEEN 0.03 AND 0.07
        AND l_quantity < 24"""),
      (s, d) => Tables.lineitem(s, d)
        .filter(year(col("l_shipdate")) === 1996 &&
          col("l_discount").between(0.03, 0.07) &&
          col("l_quantity") < 24)
        .agg(
          sum(d2(col("l_extendedprice")) * d2(col("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))),

    // W/K8: per-group top-n via ranking window
    Q("q07_top_orders_per_segment", Some("""
      SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey) t
      WHERE rn <= 3
      ORDER BY c_mktsegment, rn"""),
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
          .orderBy("c_mktsegment", "rn")
      }),

    // W: running-sum window frame with exact accumulation
    Q("q08_running_quantity", Some("""
      SELECT l_orderkey, l_linenumber,
        CAST(SUM(CAST(l_quantity AS DECIMAL(23,8)))
          OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem
      WHERE l_orderkey % 50 = 0
      ORDER BY l_orderkey, l_linenumber"""),
      (s, d) => {
        val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .filter(col("l_orderkey") % 50 === 0)
          .withColumn("running_qty",
            sum(col("l_quantity").cast(dec)).over(w).cast("double"))
          .select("l_orderkey", "l_linenumber", "running_qty")
          .orderBy("l_orderkey", "l_linenumber")
      }),

    // U: union + distinct across two sources
    Q("q09_active_nations", Some("""
      SELECT nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier) t
      ORDER BY nationkey"""),
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .unionByName(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy("nationkey")),

    // J8: referential-integrity audit — both anti-join directions
    Q("q10_orphan_audit", Some("""
      SELECT check_name, n FROM (
        SELECT 'lineitem_without_order' AS check_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        UNION ALL
        SELECT 'order_without_customer' AS check_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders
        WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) t
      ORDER BY check_name"""),
      (s, d) => {
        val a = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("n"))
          .withColumn("check_name", lit("lineitem_without_order"))
        val b = Tables.orders(s, d)
          .join(Tables.customer(s, d).select("c_custkey"),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n"))
          .withColumn("check_name", lit("order_without_customer"))
        a.unionByName(b).select("check_name", "n").orderBy("check_name")
      }),

    // A7 analog: group shares via window-total (single extra exchange)
    Q("q11_event_type_share", Some("""
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""),
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("share",
          col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy()).cast("double"))
        .orderBy("event_type")),

    // A8: exact interpolated percentiles (benchmark-style latency stats)
    Q("q12_price_percentiles", Some("""
      SELECT o_orderstatus,
        quantile_cont(o_totalprice, 0.25) AS p25,
        quantile_cont(o_totalprice, 0.50) AS p50,
        quantile_cont(o_totalprice, 0.95) AS p95,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
      (s, d) => Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          percentile(col("o_totalprice"), lit(0.25)).as("p25"),
          percentile(col("o_totalprice"), lit(0.50)).as("p50"),
          percentile(col("o_totalprice"), lit(0.95)).as("p95"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // W: sessionization — lag + conditional cumulative flag (A8/W family)
    Q("q13_user_sessions", Some("""
      WITH x AS (
        SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec FROM events),
      y AS (
        SELECT user_id,
          sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS gap
        FROM x)
      SELECT user_id,
        CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        CAST(COUNT(*) AS BIGINT) AS n_events
      FROM y
      GROUP BY user_id
      ORDER BY user_id"""),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("sec", "event_id")
        Tables.events(s, d)
          .withColumn("sec", col("ts").cast("long"))
          .withColumn("gap", col("sec") - lag("sec", 1).over(w))
          .groupBy("user_id")
          .agg(
            sum(when(col("gap").isNull || col("gap") > 1800, 1L).otherwise(0L))
              .as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      }),

    // time-bucketed aggregation (streaming-window analog, batch form)
    Q("q14_hourly_events", Some("""
      SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(value AS DECIMAL(23,8))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour, event_type"""),
      (s, d) => Tables.events(s, d)
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd HH").as("hour"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(dec)).cast("double").as("sum_value"))
        .orderBy("hour", "event_type")),

    // X9: JSON-ish props extraction (regexp — engine-portable)
    Q("q15_props_extract", Some("""
      SELECT event_type,
        CAST(SUM(k) AS BIGINT) AS sum_k,
        CAST(MAX(k) AS BIGINT) AS max_k,
        CAST(COUNT(k) AS BIGINT) AS n
      FROM (SELECT event_type,
              CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS BIGINT) AS k
            FROM events) t
      GROUP BY event_type
      ORDER BY event_type"""),
      (s, d) => Tables.events(s, d)
        .withColumn("k",
          regexp_extract(col("props"), "\"k\":\\s*([0-9]+)", 1).cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(col("k")).as("n"))
        .orderBy("event_type")),

    // J5: transitive closure over a 3-level hierarchy
    // (customer -> nation -> region), iterative fixpoint == WITH RECURSIVE
    Q("q16_geo_closure", Some("""
      WITH RECURSIVE edges AS (
        SELECT 'c' || CAST(c_custkey AS VARCHAR) AS child,
               'n' || CAST(c_nationkey AS VARCHAR) AS parent FROM customer
        UNION ALL
        SELECT 'n' || CAST(n_nationkey AS VARCHAR),
               'r' || CAST(n_regionkey AS VARCHAR) FROM nation),
      closure(node, ancestor) AS (
        SELECT child, parent FROM edges
        UNION
        SELECT c.node, e.parent FROM closure c JOIN edges e ON c.ancestor = e.child)
      SELECT node, ancestor FROM closure ORDER BY node, ancestor"""),
      (s, d) => {
        val custEdges = Tables.customer(s, d).select(
          concat(lit("c"), col("c_custkey").cast("string")).as("child"),
          concat(lit("n"), col("c_nationkey").cast("string")).as("parent"))
        val natEdges = Tables.nation(s, d).select(
          concat(lit("n"), col("n_nationkey").cast("string")).as("child"),
          concat(lit("r"), col("n_regionkey").cast("string")).as("parent"))
        Taxonomy.ancestorClosure(custEdges.unionByName(natEdges))
          .orderBy("node", "ancestor")
      }),

    // K8: argmax per group (best customer per nation)
    Q("q17_best_customer_per_nation", Some("""
      SELECT n_name, c_custkey, c_acctbal FROM (
        SELECT n_name, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY n_name
                             ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer JOIN nation ON c_nationkey = n_nationkey) t
      WHERE rn = 1
      ORDER BY n_name"""),
      (s, d) => {
        val w = Window.partitionBy("n_name")
          .orderBy(desc("c_acctbal"), asc("c_custkey"))
        Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("n_name", "c_custkey", "c_acctbal")
          .orderBy("n_name")
      }),

    // A: hierarchical aggregation (ROLLUP) — beyond the reference's
    // surface, standard for pipeline reporting; exact decimal sums
    Q("q36_rollup_revenue", Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        COALESCE(l_linestatus, 'ALL') AS linestatus,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""),
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(d2(col("l_extendedprice"))).cast("double").as("sum_base"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_base"), col("n"))
        .orderBy("returnflag", "linestatus")),

    // F5/F6 analog: label/text predicate + projection (pushdown visible
    // in explain: PushedFilters + 3-column ReadSchema)
    Q("q18_part_filter", Some("""
      SELECT p_partkey, p_name, p_retailprice
      FROM part
      WHERE lower(p_type) LIKE '%economy%' AND p_size >= 5
      ORDER BY p_partkey
      LIMIT 20"""),
      (s, d) => Tables.part(s, d)
        .filter(lower(col("p_type")).contains("economy") && col("p_size") >= 5)
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(20)),

    // J4: broader-join (taxonomy parent lookup shape)
    Q("q19_nation_region", Some("""
      SELECT n_name, r_name
      FROM nation JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_name"""),
      (s, d) => Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_name", "r_name")
        .orderBy("n_name")),

    // Cohort retention (round 14): the classic warehouse triangle —
    // weekly signup cohorts x weeks-since-cohort active-user counts.
    // Weeks are FIXED 7-day epoch buckets (epoch_sec div 604800):
    // integer arithmetic with zero calendar semantics, identical on
    // any engine, and the week of min(ts) == min(week) since the
    // bucket is monotone in ts. Two shuffles (per-user min + the
    // cohort-cell aggregate); rate is one division of exact counts
    Q("q144_cohort_retention", Some("""
      WITH e AS (
        SELECT user_id, epoch_us(ts) // 1000000 // 604800 AS wk
        FROM events),
      cohort AS (SELECT user_id, min(wk) AS cw FROM e GROUP BY user_id),
      act AS (SELECT DISTINCT user_id, wk FROM e),
      cells AS (
        SELECT c.cw AS cohort_week, a.wk - c.cw AS week_offset,
          CAST(count(*) AS BIGINT) AS active_users
        FROM act a JOIN cohort c ON c.user_id = a.user_id
        GROUP BY 1, 2),
      sizes AS (SELECT cw AS cohort_week,
                  CAST(count(*) AS BIGINT) AS cohort_size
                FROM cohort GROUP BY cw)
      SELECT CAST(l.cohort_week AS BIGINT) AS cohort_week,
        CAST(l.week_offset AS BIGINT) AS week_offset,
        l.active_users, s.cohort_size,
        CAST(l.active_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
          AS retention_rate
      FROM cells l JOIN sizes s USING (cohort_week)
      ORDER BY cohort_week, week_offset"""),
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"),
            weekFloor.as("wk"))
        val cohort = e.groupBy("user_id").agg(min("wk").as("cohort_week"))
        val act = e.distinct()
        val cells = act.join(cohort, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (col("wk") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("active_users"))
        val sizes = cohort.groupBy("cohort_week")
          .agg(count(lit(1)).as("cohort_size"))
        cells.join(broadcast(sizes), Seq("cohort_week"))
          .select(col("cohort_week"), col("week_offset"),
            col("active_users"), col("cohort_size"),
            (col("active_users").cast("double") /
              col("cohort_size").cast("double")).as("retention_rate"))
          .orderBy("cohort_week", "week_offset")
      }),

    // Ordered event funnel (round 14): signup -> view -> click ->
    // purchase, each step's timestamp strictly after the previous
    // step's (min-timestamp semantics per step). The per-step frames
    // are successive filtered min-aggregates + equi-joins on user_id —
    // never a per-user event-sequence window — so the plan is k
    // bounded shuffles for a k-step funnel at any event volume.
    // Conversion ratios run over the 4-row step table (bounded window)
    Q("q145_event_funnel", Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      s1 AS (SELECT user_id, min(us) AS t FROM e
             WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.us) AS t FROM e
             JOIN s1 ON s1.user_id = e.user_id
             WHERE e.event_type = 'view' AND e.us > s1.t GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.us) AS t FROM e
             JOIN s2 ON s2.user_id = e.user_id
             WHERE e.event_type = 'click' AND e.us > s2.t GROUP BY e.user_id),
      s4 AS (SELECT e.user_id, min(e.us) AS t FROM e
             JOIN s3 ON s3.user_id = e.user_id
             WHERE e.event_type = 'purchase' AND e.us > s3.t GROUP BY e.user_id),
      steps AS (
        SELECT 1 AS step, 'signup' AS step_name,
          CAST(count(*) AS BIGINT) AS users FROM s1
        UNION ALL SELECT 2, 'view', CAST(count(*) AS BIGINT) FROM s2
        UNION ALL SELECT 3, 'click', CAST(count(*) AS BIGINT) FROM s3
        UNION ALL SELECT 4, 'purchase', CAST(count(*) AS BIGINT) FROM s4)
      SELECT step, step_name, users,
        CAST(users AS DOUBLE) /
          CAST(lag(users) OVER (ORDER BY step) AS DOUBLE) AS conv_from_prev,
        CAST(users AS DOUBLE) /
          CAST(first_value(users) OVER (ORDER BY step) AS DOUBLE)
          AS conv_from_first
      FROM steps ORDER BY step"""),
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .materializeOnce(eager = false) // four step filters, one scan
        def step(ofType: String, prev: DataFrame): DataFrame =
          e.filter(col("event_type") === ofType)
            .join(prev.withColumnRenamed("t", "__pt"), Seq("user_id"))
            .filter(col("us") > col("__pt"))
            .groupBy("user_id").agg(min("us").as("t"))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("us").as("t"))
        val s2 = step("view", s1)
        val s3 = step("click", s2)
        val s4 = step("purchase", s3)
        val steps = Seq((s1, 1, "signup"), (s2, 2, "view"),
          (s3, 3, "click"), (s4, 4, "purchase"))
          .map { case (df, i, n) =>
            df.agg(count(lit(1)).as("users"))
              .select(lit(i).as("step"), lit(n).as("step_name"),
                col("users"))
          }.reduce(_ union _)
        val w = Window.orderBy("step") // 4 rows — bounded
        steps
          .withColumn("conv_from_prev",
            col("users").cast("double") /
              lag("users", 1).over(w).cast("double"))
          .withColumn("conv_from_first",
            col("users").cast("double") /
              first("users").over(w).cast("double"))
          .orderBy("step")
      }),

    // Weekly burstiness z-scores (round 14): per event-type weekly
    // counts on the DENSE week grid (zero weeks included — they carry
    // the anomaly signal), z = (n·c − S) / sqrt(n·SS − S²) — the
    // population z-score rearranged so every operand is an exact
    // integer and the float tail is ONE correctly-rounded sqrt + ONE
    // division (bit-identical across engines; round-6 for display).
    // The grid is (#types × #weeks) rows — metadata-sized; the only
    // corpus-scale shuffle is the (type, week) count aggregate
    Q("q153_event_burstiness", Some("""
      WITH e AS (SELECT event_type,
              epoch_us(ts) // 1000000 // 604800 AS wk FROM events),
      cnt AS (SELECT event_type, wk, CAST(count(*) AS BIGINT) AS c
              FROM e GROUP BY 1, 2),
      span AS (SELECT min(wk) AS w0, max(wk) AS w1 FROM e),
      grid AS (SELECT t.event_type, g.wk
               FROM (SELECT DISTINCT event_type FROM e) t
               CROSS JOIN (SELECT unnest(generate_series(
                 (SELECT w0 FROM span), (SELECT w1 FROM span))) AS wk) g),
      cells AS (SELECT g.event_type, g.wk, coalesce(c.c, 0) AS c
                FROM grid g LEFT JOIN cnt c
                ON c.event_type = g.event_type AND c.wk = g.wk),
      st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s,
               CAST(sum(c * c) AS BIGINT) AS ss
             FROM cells GROUP BY event_type)
      SELECT c.event_type, CAST(c.wk AS BIGINT) AS week,
        CAST(c.c AS BIGINT) AS n_events,
        CASE WHEN st.n * st.ss - st.s * st.s > 0
             THEN round(CAST(st.n * c.c - st.s AS DOUBLE) /
                        sqrt(CAST(st.n * st.ss - st.s * st.s AS DOUBLE)), 6)
             ELSE NULL END AS z
      FROM cells c JOIN st ON st.event_type = c.event_type
      ORDER BY c.event_type, week"""),
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type"),
            weekFloor.as("wk"))
          .materializeOnce(eager = false) // counts + span + types, one scan
        val cnt = e.groupBy("event_type", "wk")
          .agg(count(lit(1)).as("c"))
        val span = e.agg(min("wk").as("w0"), max("wk").as("w1"))
        val grid = e.select("event_type").distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"),
            explode(sequence(col("w0"), col("w1"))).as("wk"))
        val cells = grid.join(cnt, Seq("event_type", "wk"), "left")
          .select(col("event_type"), col("wk"),
            coalesce(col("c"), lit(0L)).as("c"))
          .materializeOnce(eager = false) // feeds st AND the output join
        val st = cells.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("s"),
            sum(col("c") * col("c")).as("ss"))
        cells.join(broadcast(st), Seq("event_type"))
          .select(col("event_type"), col("wk").as("week"),
            col("c").as("n_events"),
            when(col("n") * col("ss") - col("s") * col("s") > 0,
              round((col("n") * col("c") - col("s")).cast("double") /
                sqrt((col("n") * col("ss") - col("s") * col("s"))
                  .cast("double")), 6)).as("z"))
          .orderBy("event_type", "week")
      }),

    // Per-user inter-event gap percentiles (round 14): the recurrence
    // cadence audit — for each event type, exact nearest-rank
    // percentiles of the gap between a user's SUCCESSIVE events of
    // that type. The sequence window is keyed (user, type) — user
    // histories are short, so no hot-type giant partition; the
    // percentile is the distributed prefix rank, never a per-type
    // sorted window. Gaps are exact integer seconds
    Q("q158_event_gaps", Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                   event_id FROM events),
      s AS (SELECT user_id, event_type, us,
              lead(us) OVER (PARTITION BY user_id, event_type
                ORDER BY us, event_id) AS nxt
            FROM e),
      g AS (SELECT event_type, (nxt - us) // 1000000 AS gap_s
            FROM s WHERE nxt IS NOT NULL),
      r AS (SELECT event_type, gap_s,
              row_number() OVER (PARTITION BY event_type
                ORDER BY gap_s) AS rk,
              count(*) OVER (PARTITION BY event_type) AS n
            FROM g)
      SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
        CAST(max(CASE WHEN rk = CAST(ceil(0.25 * n) AS BIGINT)
                 THEN gap_s END) AS BIGINT) AS p25,
        CAST(max(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT)
                 THEN gap_s END) AS BIGINT) AS p50,
        CAST(max(CASE WHEN rk = CAST(ceil(0.9 * n) AS BIGINT)
                 THEN gap_s END) AS BIGINT) AS p90
      FROM r GROUP BY event_type ORDER BY event_type"""),
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(col("us").asc, col("event_id").asc)
        val gaps = e
          .withColumn("nxt", lead("us", 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("event_type"),
            expr("(nxt - us) div 1000000").as("gap_s"))
        graft.operators.CorpusStats.exactPercentiles(
            gaps, "gap_s", "event_type", Seq(0.25, 0.5, 0.9))
          .withColumnRenamed("n_docs", "n_gaps")
          .orderBy("event_type")
      }),

    // Event-type transition matrix (round 14): per-user ordered
    // event_type bigrams → Markov transition counts and row-normalized
    // probabilities — the session-flow audit next to q145's fixed
    // funnel (the funnel asserts one path; this measures ALL of them).
    // The sequence window is user-keyed; the matrix is (#types)² rows;
    // p is one division of exact counts
    Q("q159_event_transitions", Some("""
      WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
                   event_id FROM events),
      s AS (SELECT user_id, event_type AS prev,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY us, event_id) AS nxt
            FROM e),
      t AS (SELECT prev, nxt, CAST(count(*) AS BIGINT) AS n
            FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
      r AS (SELECT prev, CAST(sum(n) AS BIGINT) AS row_n
            FROM t GROUP BY prev)
      SELECT t.prev, t.nxt, t.n,
        CAST(t.n AS DOUBLE) / CAST(r.row_n AS DOUBLE) AS p
      FROM t JOIN r ON r.prev = t.prev
      ORDER BY t.prev, t.nxt"""),
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us"), col("event_id"))
        val w = Window.partitionBy("user_id")
          .orderBy(col("us").asc, col("event_id").asc)
        val trans = e
          .withColumn("nxt", lead("event_type", 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("prev"), col("nxt"))
          .agg(count(lit(1)).as("n"))
        val rows = trans.groupBy("prev").agg(sum("n").as("row_n"))
        trans.join(broadcast(rows), Seq("prev"))
          .select(col("prev"), col("nxt"), col("n"),
            (col("n").cast("double") / col("row_n").cast("double"))
              .as("p"))
          .orderBy("prev", "nxt")
      })
  )
}
