package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.2): projection/filter,
  * every join flavor, hash aggregation, window functions, sorts/top-k,
  * set ops, rollup/cube, scalar string/date/math/json functions,
  * scalar subqueries, HAVING.
  *
  * Every query here is a declarative DataFrame plan — no RDDs, no
  * collect — so Catalyst handles pushdown/pruning and AQE handles
  * runtime re-planning at scale. Dimension tables (region/nation/
  * supplier/customer at TPC-H ratios) are explicitly `broadcast` so
  * the fact-table joins never shuffle the large side.
  *
  * == Numeric determinism policy ==
  * The driver hash-compares result values against a DuckDB oracle, so
  * every value must be bit-reproducible regardless of partitioning or
  * engine:
  *  - money sums go through DECIMAL (`dsum`/`drevenue`) — decimal
  *    addition is associative, so parallel partial aggregation cannot
  *    perturb the result, and the final cast to double is identical
  *    in both engines;
  *  - averages are expressed as exact-decimal-sum ÷ count, rounded at
  *    6 dp (a position where a finite-decimal true value cannot sit
  *    exactly on the rounding half-boundary);
  *  - single-row derived values are rounded at ≥ their true decimal
  *    granularity (e.g. a 2 dp × 2 dp product at 4 dp), which makes
  *    rounding the identity on the true value.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  /** Exact sum of a 2-dp money column, as a deterministic double. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(12,2)")).cast("double")

  /** Deterministic mean of a 2-dp money column, rounded at 6 dp. */
  private def davg(c: Column): Column =
    round(sum(c.cast("decimal(12,2)")).cast("double") / count(lit(1)), 6)

  /** Exact sum of extendedprice*(1-discount) via decimal. */
  private def drevenue(ep: Column, disc: Column): Column =
    sum(ep.cast("decimal(12,2)") * (lit(1) - disc.cast("decimal(4,2)"))).cast("double")

  // SQL twins of the helpers above (DuckDB).
  private def sqlDsum(c: String) =
    s"CAST(sum(CAST($c AS DECIMAL(12,2))) AS DOUBLE)"
  private def sqlDavg(c: String) =
    s"round(CAST(sum(CAST($c AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6)"
  private def sqlDrevenue(ep: String, disc: String) =
    s"CAST(sum(CAST($ep AS DECIMAL(12,2)) * (1 - CAST($disc AS DECIMAL(4,2)))) AS DOUBLE)"

  // ---------------------------------------------------------------
  // Queries
  // ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q01: TPC-H Q1-style pricing summary — partial (map-side) agg +
    // final agg on 2 low-cardinality keys; scan prunes to 7 columns.
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          drevenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          sum(col("l_extendedprice").cast("decimal(12,2)")
            * (lit(1) - col("l_discount").cast("decimal(4,2)"))
            * (lit(1) + col("l_tax").cast("decimal(4,2)"))).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),

    // q02: filter + projection — predicates and the 4-column read
    // schema must reach the parquet scan (PushedFilters). The 2dp×2dp
    // product is rounded at 4 dp = its exact granularity.
    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity").between(5, 15) &&
          col("l_discount") > 0.05 && col("l_returnflag") === "R")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"),
          col("l_quantity"))
    }),

    // q03: TPC-H Q3-style shipping priority — 3-way join, group,
    // deterministic top-10 (exact decimal revenue + key tiebreak).
    "q03_shipping_priority" -> ((s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < ts("1997-01-01"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > ts("1997-01-01"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // q04: inner join + aggregation by market segment.
    "q04_join_inner_agg" -> ((s, d) => {
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total_spend"),
          davg(col("o_totalprice")).as("avg_spend"))
    }),

    // q05: left outer join — customers with zero orders kept.
    "q05_join_left_outer" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
    }),

    // q84: right-outer join — the probe side preserved instead of the
    // build side (orders ⟖ customer keeps order-less customers). Plans
    // identically to q05's left-outer with sides swapped; gated
    // separately so every join type in SURVEY §2.2's inventory has
    // its own oracle entry.
    "q84_join_right_outer" -> ((s, d) => {
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_custkey"), col("c_mktsegment"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend"))
    }),

    // q06: left-semi join (EXISTS).
    "q06_join_semi" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // q07: left-anti join (NOT EXISTS) — customers with no high-value
    // order (every customer has *some* order in this data, so the
    // unfiltered anti-join would be vacuously empty). Raw 2-dp value:
    // round-2 is the identity on the true value.
    "q07_join_anti" -> ((s, d) => {
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"))
    }),

    // q08: star-schema join lineitem⋈supplier⋈nation⋈region with all
    // dims broadcast — the fact table never shuffles.
    "q08_region_revenue" -> ((s, d) => {
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // q09: window top-N per group (row_number, deterministic order).
    "q09_window_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"),
          // BIGINT on output: Spark row_number is INT, DuckDB's BIGINT
          col("rn").cast("long").as("rn"))
    }),

    // q10: running aggregate + lag over an ordered per-key frame.
    // The running sum goes through decimal so the cumulative value is
    // exact at every prefix.
    "q10_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(12,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
        .withColumn("prev_price",
          round(coalesce(lag(col("o_totalprice"), 1).over(w), lit(0.0)), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("prev_price"))
    }),

    // q11: global sort + limit → Spark plans TakeOrderedAndProject
    // (no full sort materialization).
    "q11_topk_price" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(25)
    }),

    // q12–q14: set operations on two customer key-sets.
    "q12_set_union" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = t(s, d, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      a.union(b).distinct()
    }),
    "q13_set_intersect" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = t(s, d, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      a.intersect(b)
    }),
    "q14_set_except" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val b = t(s, d, "customer").filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      a.except(b)
    }),

    // q205: BAG-semantics set ops — exceptAll keeps max(na−nb, 0)
    // copies per value, intersectAll min(na, nb) — the multiplicity
    // algebra q12-q14's set forms erase. Driven on a genuinely
    // duplicate-heavy column (suppliers appear on many lineitems);
    // per-key counts of both results in one output so the gate pins
    // the exact multiplicities, not just membership.
    "q205_set_ops_all" -> ((s, d) => {
      val a = t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R").select(col("l_suppkey"))
      val b = t(s, d, "lineitem")
        .filter(col("l_linestatus") === "F").select(col("l_suppkey"))
      val ea = a.exceptAll(b).groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_except"))
      val ia = a.intersectAll(b).groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n_intersect"))
      ea.join(ia, Seq("l_suppkey"), "full_outer")
        .select(col("l_suppkey"),
          coalesce(col("n_except"), lit(0L)).as("n_except"),
          coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
    }),

    // q15: distinct aggregation (exact count-distinct per group).
    "q15_distinct_agg" -> ((s, d) => {
      t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          countDistinct(col("s_suppkey")).as("n_suppliers"),
          dsum(col("s_acctbal")).as("total_bal"))
    }),

    // q16: ROLLUP — hierarchical subtotals.
    "q16_rollup" -> ((s, d) => {
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
    }),

    // q17: CUBE — all grouping-set combinations.
    "q17_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    }),

    // q18: scalar string functions (regexp_extract/substr/upper/length).
    "q18_string_funcs" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int").as("brand_num"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_prefix"))
    }),

    // q19: date functions + group by calendar parts.
    "q19_date_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
    }),

    // q20: conditional aggregation (CASE WHEN inside agg); the share
    // is an exact integer ratio — deterministic before rounding.
    "q20_case_agg" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          count(when(col("o_totalprice") > 150000, 1)).as("n_big"),
          round(count(when(col("o_totalprice") > 150000, 1)) / count(lit(1)), 6).as("big_share"))
    }),

    // q21: HAVING (post-aggregation filter).
    "q21_having" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .filter(col("n") >= 40)
    }),

    // q22: scalar subquery — compare to the global mean. The 1-row
    // aggregate is broadcast, never collected on the driver; the
    // threshold is an exact decimal mean so the strict comparison
    // cannot flip on summation order.
    "q22_scalar_subquery" -> ((s, d) => {
      val c = t(s, d, "customer")
      val avgBal = c.agg(
        (sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") / count(lit(1))).as("avg_bal"))
      c.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
    }),

    // q23: scalar math functions.
    "q23_math_funcs" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_orderkey") % 100 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_quantity")), 4).as("sqrt_qty"),
          round(pow(col("l_discount") + 1, 2), 4).as("pow_disc"),
          round(abs(col("l_quantity") - 25), 2).as("abs_dev"),
          ceil(col("l_extendedprice")).as("ceil_price"),
          floor(col("l_extendedprice")).as("floor_price"),
          round(log(col("l_extendedprice")), 4).as("ln_price"))
    }),

    // q24: JSON extraction from the events props column; mean as an
    // exact integer ratio.
    "q24_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(
          round(sum(col("k")) / count(lit(1)), 6).as("avg_k"),
          sum(col("k")).as("sum_k"),
          count(lit(1)).as("n"))
    }),

    // q25: event-time tumbling window (batch form: date_trunc hour —
    // identical bucketing to window(ts, '1 hour') for aligned windows).
    "q25_events_hourly" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // q26: sessionization — 30-minute inactivity gap, pure window
    // functions (microsecond-exact interval arithmetic, no epoch
    // truncation). Batch twin of streaming session_window.
    "q26_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") > col("prev_ts") + expr("INTERVAL '30' MINUTE"), 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // q39: approximate distinct-count (HyperLogLog++). The sketch
    // estimate itself is engine-specific, so the oracled columns are
    // the exact count plus an accuracy flag: the oracle asserts
    // `approx_ok = TRUE`, i.e. Spark's HLL estimate landed within
    // 10% (5× the requested 2% rsd) of the exact answer — a real
    // cross-engine check instead of the old rows-only record.
    "q39_approx_distinct" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("exact_users"), col("n"),
          (abs(col("approx_users") - col("exact_users")) <=
            col("exact_users") * 0.1).as("approx_ok"))
    }))

  // ---------------------------------------------------------------
  // DuckDB oracle SQL — same semantics, same column names, same
  // decimal/rounding policy. Integer sums are cast to BIGINT (DuckDB
  // widens to HUGEINT); year()/month() cast to INT (DuckDB returns
  // BIGINT).
  // ---------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sqlDsum("l_quantity")} AS sum_qty,
         | ${sqlDsum("l_extendedprice")} AS sum_base_price,
         | ${sqlDrevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
         | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
         |   * (1 - CAST(l_discount AS DECIMAL(4,2)))
         |   * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
         | ${sqlDavg("l_quantity")} AS avg_qty,
         | ${sqlDavg("l_extendedprice")} AS avg_price,
         | ${sqlDavg("l_discount")} AS avg_disc,
         | count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | round(l_extendedprice*(1-l_discount),4) AS net_price, l_quantity
        |FROM lineitem
        |WHERE l_quantity BETWEEN 5 AND 15 AND l_discount > 0.05 AND l_returnflag = 'R'""".stripMargin,

    "q03_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         | ${sqlDrevenue("l_extendedprice", "l_discount")} AS revenue
         |FROM customer, orders, lineitem
         |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
         |  AND l_orderkey = o_orderkey
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |  AND l_shipdate > TIMESTAMP '1997-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q04_join_inner_agg" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         | ${sqlDsum("o_totalprice")} AS total_spend,
         | ${sqlDavg("o_totalprice")} AS avg_spend
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin,

    "q05_join_left_outer" ->
      s"""SELECT c_custkey, count(o_orderkey) AS n_orders,
         | coalesce(${sqlDsum("o_totalprice")}, 0.0) AS spend
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey""".stripMargin,

    "q84_join_right_outer" ->
      s"""SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
         | coalesce(${sqlDsum("o_totalprice")}, 0.0) AS spend
         |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_custkey, c_mktsegment""".stripMargin,

    "q06_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q07_join_anti" ->
      """SELECT c_custkey, c_name, round(c_acctbal,2) AS acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "q08_region_revenue" ->
      s"""SELECT r_name,
         | ${sqlDrevenue("l_extendedprice", "l_discount")} AS revenue,
         | count(*) AS n_items
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin,

    "q09_window_topn" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS price, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q10_window_running" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
        | round(coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey), 0.0),2) AS prev_price
        |FROM orders""".stripMargin,

    "q11_topk_price" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin,

    "q12_set_union" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000""".stripMargin,

    "q13_set_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000""".stripMargin,

    "q14_set_except" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_custkey FROM customer WHERE c_acctbal > 5000""".stripMargin,

    "q205_set_ops_all" ->
      """WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
        | b AS (SELECT l_suppkey FROM lineitem WHERE l_linestatus = 'F'),
        | ea AS (SELECT l_suppkey, count(*) AS n_except
        |   FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1),
        | ia AS (SELECT l_suppkey, count(*) AS n_intersect
        |   FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1)
        |SELECT COALESCE(ea.l_suppkey, ia.l_suppkey) AS l_suppkey,
        | CAST(COALESCE(n_except, 0) AS BIGINT) AS n_except,
        | CAST(COALESCE(n_intersect, 0) AS BIGINT) AS n_intersect
        |FROM ea FULL OUTER JOIN ia ON ea.l_suppkey = ia.l_suppkey""".stripMargin,

    "q15_distinct_agg" ->
      s"""SELECT n_name,
         | CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
         | ${sqlDsum("s_acctbal")} AS total_bal
         |FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,

    "q16_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         | ${sqlDsum("l_quantity")} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q17_cube" ->
      s"""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
         | ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)""".stripMargin,

    "q18_string_funcs" ->
      """SELECT p_partkey,
        | CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
        | upper(p_name) AS name_upper,
        | CAST(length(p_name) AS INT) AS name_len,
        | substr(p_name, 1, 5) AS name_prefix
        |FROM part""".stripMargin,

    "q19_date_funcs" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
         | CAST(month(o_orderdate) AS INT) AS order_month,
         | count(*) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY 1, 2""".stripMargin,

    "q20_case_agg" ->
      """SELECT o_orderstatus,
        | count(CASE WHEN o_totalprice > 150000 THEN 1 END) AS n_big,
        | round(count(CASE WHEN o_totalprice > 150000 THEN 1 END) * 1.0 / count(*), 6) AS big_share
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q21_having" ->
      s"""SELECT l_partkey, count(*) AS n, ${sqlDsum("l_quantity")} AS qty
         |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 40""".stripMargin,

    "q22_scalar_subquery" ->
      """SELECT c_custkey, round(c_acctbal,2) AS acctbal FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |                   FROM customer)""".stripMargin,

    "q23_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | round(sqrt(l_quantity),4) AS sqrt_qty,
        | round(pow(l_discount + 1, 2),4) AS pow_disc,
        | round(abs(l_quantity - 25),2) AS abs_dev,
        | CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_price,
        | CAST(floor(l_extendedprice) AS BIGINT) AS floor_price,
        | round(ln(l_extendedprice),4) AS ln_price
        |FROM lineitem WHERE l_orderkey % 100 = 0""".stripMargin,

    "q24_json_extract" ->
      """SELECT event_type,
        | round(sum(k) * 1.0 / count(*), 6) AS avg_k,
        | CAST(sum(k) AS BIGINT) AS sum_k,
        | count(*) AS n
        |FROM (SELECT event_type,
        |   CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,

    "q25_events_hourly" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket, event_type,
         | count(*) AS n, ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q26_sessionize" ->
      """SELECT user_id,
        | CAST(sum(new_session) AS BIGINT) AS n_sessions,
        | count(*) AS n_events
        |FROM (
        |  SELECT user_id,
        |   CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_session
        |  FROM (
        |    SELECT user_id, ts,
        |     lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |    FROM events))
        |GROUP BY user_id""".stripMargin,

    // the oracle pins approx_ok TRUE: the hash compare then fails iff
    // Spark's HLL estimate strays beyond 10% of the exact count
    "q39_approx_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        | count(*) AS n, TRUE AS approx_ok
        |FROM events GROUP BY 1""".stripMargin)
}
