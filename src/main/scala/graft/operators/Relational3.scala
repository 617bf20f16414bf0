package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third relational batch: the correlated-subquery / decision-support
  * shapes of SURVEY §2.2 that q01–q85 didn't exercise — the TPC-H
  * Q13/Q17/Q18/Q22/Q2 patterns (outer-join count distribution,
  * per-group correlated average, HAVING-sum semi-join, scalar-average
  * anti-join, and min-per-group equality join).
  *
  * Scale posture: every query is a declarative plan whose only
  * shuffles are the unavoidable keyed aggregations; the correlated
  * subqueries are decorrelated by hand into aggregate-then-join form
  * (the same rewrite Catalyst's decorrelator would produce), with the
  * aggregate restricted to the filtered keys FIRST so the per-group
  * statistics are computed over the narrow slice, not the full fact
  * table. Numeric policy follows [[Relational]]: decimal sums,
  * exact-sum/count averages rounded at 6 dp.
  */
object Relational3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(12,2)")).cast("double")

  private def davg(c: Column): Column =
    round(sum(c.cast("decimal(12,2)")).cast("double") / count(lit(1)), 6)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q86: TPC-H Q13 — customer order-count distribution through a
    // left outer join with an ON-clause filter. Two keyed shuffles
    // (custkey, then the tiny c_count domain); the first aggregation
    // is partial/final so the join output never concentrates.
    "q86_custdist" -> ((s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    }),

    // q87: TPC-H Q17 — small-quantity-order revenue. The correlated
    // `l_quantity < 0.2 * avg(per-part quantity)` is decorrelated:
    // restrict lineitem to the brand's parts FIRST (broadcast the
    // filtered part dim), compute the per-part average over that
    // slice only, then join the slice back to the tiny per-part
    // aggregate. At 100 TB the per-part stats table is |parts of one
    // brand| rows — broadcast-able by construction.
    "q87_small_qty_revenue" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val li = t(s, d, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgq = li.groupBy(col("l_partkey").as("a_partkey"))
        .agg((sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
          / count(lit(1))).as("avg_qty"))
      li.join(broadcast(avgq), col("l_partkey") === col("a_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    }),

    // q88: TPC-H Q18 — large-volume orders: HAVING-sum over lineitem,
    // then join the few qualifying orderkeys back to orders+customer.
    // The qualifying set after `sum > 250` is tiny, so AQE converts
    // the orders join to broadcast at runtime; the only big shuffle
    // is the per-orderkey aggregation. Deterministic top-100 via
    // (totalprice, orderkey) tiebreak.
    "q88_large_orders" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250.0)
      t(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), round(col("o_totalprice"), 2).as("o_totalprice"),
          col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // q89: TPC-H Q22 — positive-balance customers above the global
    // average with no urgent orders, bucketed by a derived country
    // code. The scalar average is a 1-row aggregate cross-joined
    // (broadcast) into the scan; "no urgent orders" is a left-anti
    // join that shuffles only custkeys of urgent orders.
    "q89_idle_customers" -> ((s, d) => {
      val c = t(s, d, "customer")
      val avgBal = c.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy((col("c_nationkey") % 5).cast("int").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
    }),

    // q91: top-3 orders per customer through the NATIVE two-phase
    // top-k operator (graft.plans.TopKPerGroupExec — LogicalPlan +
    // SparkStrategy + SparkPlan, injected by GraftExtensions). The
    // window row_number formulation shuffles every order row; the
    // native plan's partial phase caps the exchange at 3 rows per
    // customer per input partition. Oracle is the window form.
    "q91_topk_native" -> ((s, d) => {
      graft.plans.TopKPerGroup.topK(
        t(s, d, "orders"),
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        k = 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
    }),

    // q189: top-5 line values per return flag through the NATIVE
    // graft_topk TypedImperativeAggregate (functions/LongTopK.scala) —
    // the aggregate-function-level twin of q91's whole-plan operator.
    // The heap buffer keeps the partial-aggregate state at O(k) longs
    // per (partition, group) where collect_list+slice would carry the
    // whole group through the shuffle. Values are exact cents
    // (DECIMAL-routed, q01 money policy); result exploded to scalar
    // rows so ordering is gated too. SQL surface: the same function is
    // registered as `graft_topk` by GraftExtensions (spec-covered).
    "q189_native_topk_agg" -> ((s, d) => {
      val cents = expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(graft.functions.LongTopK.column(cents, 5).as("top5"))
        .select(col("l_returnflag"), posexplode(col("top5")))
        .toDF("l_returnflag", "rk", "cents")
    }),

    // q98: explicit bloom-filter join pruning — the build side's keys
    // are compacted into a bloom filter (a scalar subquery, ~100 KB
    // for 100k keys), the probe scan is pre-filtered by membership,
    // and the exact semi-join afterwards removes the false positives,
    // so the result is EXACT while the join shuffle carries only the
    // ~selectivity fraction of lineitem. This is Catalyst's own
    // InjectRuntimeFilter mechanism (same catalyst expressions),
    // surfaced declaratively for pipelines that want the pruning
    // guaranteed rather than threshold-dependent.
    "q98_bloom_prune" -> ((s, d) => {
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val bf = urgent.agg(
        graft.scale.ScaleOps.bloomAgg(col("o_orderkey"), 100000L).as("bf"))
      t(s, d, "lineitem")
        .filter(graft.scale.ScaleOps.bloomMightContain(bf.scalar(), col("l_orderkey")))
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
    }),

    // q90: TPC-H Q2 pattern — cheapest supplier per part (no partsupp
    // table in this schema, so unit cost is derived as the minimum
    // observed extendedprice/quantity per part×supplier). min() over
    // identical double sets is order-independent, so the min-equality
    // join is deterministic without rounding. The per-part min table
    // is |parts| rows; the final equality join is keyed on partkey and
    // both post-aggregation sides are far smaller than lineitem.
    "q90_min_cost_supplier" -> ((s, d) => {
      // the p_size predicate reaches lineitem FIRST (broadcast
      // semi-reduction): per-part minima are unchanged by dropping
      // other parts' rows, so the big aggregation runs over the
      // filtered slice — TPC-H Q2's partsupp-pruning, Spark-first.
      // One shuffle chain: agg on (partkey, suppkey), then the
      // per-part min as a window over the already-aggregated cost
      // relation (≤ |filtered parts| × |suppliers| rows — the window's
      // repartition on partkey moves almost nothing).
      val p15 = t(s, d, "part").filter(col("p_size") === 15)
        .select(col("p_partkey"), col("p_name"))
      val cost = t(s, d, "lineitem")
        .join(broadcast(p15), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"), col("p_name"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
      cost
        .withColumn("min_cost", min(col("unit_cost")).over(w))
        .filter(col("unit_cost") === col("min_cost"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey").as("p_partkey"), col("p_name"), col("s_name"),
          round(col("s_acctbal"), 2).as("s_acctbal"), col("unit_cost"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q189_native_topk_agg" ->
      """WITH v AS (SELECT l_returnflag,
        |   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM lineitem),
        | r AS (SELECT l_returnflag, cents,
        |   row_number() OVER (PARTITION BY l_returnflag
        |     ORDER BY cents DESC) AS rn FROM v)
        |SELECT l_returnflag, CAST(rn - 1 AS INT) AS rk, cents
        |FROM r WHERE rn <= 5""".stripMargin,
    "q86_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        | SELECT c_custkey, count(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        | GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,

    "q87_small_qty_revenue" ->
      """WITH li AS (
        | SELECT l_partkey, l_quantity, l_extendedprice
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand = 'Brand#23'),
        |a AS (
        | SELECT l_partkey AS a_partkey,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty
        | FROM li GROUP BY l_partkey)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
        |  AS avg_yearly,
        | count(*) AS n_small
        |FROM li JOIN a ON l_partkey = a_partkey
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q88_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        | round(o_totalprice, 2) AS o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey,
        |   CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 250.0) q
        | ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q89_idle_customers" ->
      """WITH avg_bal AS (
        | SELECT round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |   / count(*), 6) AS avg_bal
        | FROM customer WHERE c_acctbal > 0.0)
        |SELECT CAST(c_nationkey % 5 AS INT) AS cntrycode,
        | count(*) AS numcust,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
        |FROM customer, avg_bal
        |WHERE c_acctbal > avg_bal
        | AND NOT EXISTS (SELECT 1 FROM orders
        |   WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q91_topk_native" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,

    "q98_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "q90_min_cost_supplier" ->
      """WITH cost AS (
        | SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
        | FROM lineitem GROUP BY l_partkey, l_suppkey),
        |best AS (
        | SELECT l_partkey AS b_partkey, min(unit_cost) AS min_cost
        | FROM cost GROUP BY l_partkey)
        |SELECT p_partkey, p_name, s_name, round(s_acctbal, 2) AS s_acctbal, unit_cost
        |FROM cost
        |JOIN best ON l_partkey = b_partkey AND unit_cost = min_cost
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_size = 15""".stripMargin)
}
