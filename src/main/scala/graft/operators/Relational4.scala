package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth relational batch: the REMAINING classic decision-support
  * patterns (TPC-H Q4–Q21) that q01–q152 had not yet exercised,
  * adapted to the driver schema (no partsupp / commitdate /
  * receiptdate / shipmode — see the per-query notes for the faithful
  * substitution used in each case).
  *
  * Together with q01/q03 (Q1/Q3) and q86–q90 (Q13/Q17/Q18/Q22/Q2)
  * this closes the full 22-query TPC-H pattern inventory: every
  * decision-support join/agg/subquery shape the standard benchmark
  * exercises now has an oracle-gated twin here.
  *
  * Scale posture: fact-fact joins (lineitem⋈orders) shuffle once on
  * orderkey and reuse that partitioning for downstream windows;
  * every dimension join is an explicit `broadcast`; correlated
  * subqueries are decorrelated into aggregate-then-join form with the
  * aggregate computed over the narrowest possible slice (the
  * [[Relational3]] discipline). Numeric policy follows [[Relational]]:
  * decimal money sums cast to double, ratios rounded at 6 dp,
  * count-based classes via NULL-skipping `count(CASE…)` (BIGINT in
  * both engines — DuckDB's `sum(INT)→HUGEINT` widening never enters).
  */
object Relational4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def ts(lit0: String): Column = to_timestamp(lit(lit0))

  private def dsum(c: Column): Column =
    sum(c.cast("decimal(12,2)")).cast("double")

  /** Exact per-row net revenue ep*(1-disc) as DECIMAL — summable in
    * any order, conditionally maskable without losing exactness. */
  private def vol(ep: Column, disc: Column): Column =
    ep.cast("decimal(12,2)") * (lit(1) - disc.cast("decimal(4,2)"))

  private def drevenue(ep: Column, disc: Column): Column =
    sum(vol(ep, disc)).cast("double")

  private val sqlVol =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
  private val sqlDrevenue = s"CAST(sum($sqlVol) AS DOUBLE)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q153: TPC-H Q4 — order priority checking. The schema has no
    // commitdate/receiptdate, so "late line" is l_shipdate more than
    // 60 days after o_orderdate. EXISTS becomes a left-semi join whose
    // extra inequality rides in the join condition; the semi join
    // shuffles only (orderkey, shipdate) pairs and the quarter filter
    // on orders prunes the probe side at the scan.
    "q153_priority_check" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-07-01") &&
          col("o_orderdate") < ts("1996-10-01"))
      val l = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    }),

    // q154: TPC-H Q5 — local supplier volume. One fact-fact shuffle
    // (lineitem⋈orders on orderkey); customer/supplier/nation/region
    // all broadcast; the c_nationkey = s_nationkey locality predicate
    // is a post-join filter on two broadcast-sourced columns. The
    // ASIA/year filters reach the scans.
    "q154_local_volume" -> ((s, d) => {
      val asiaNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1997-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      t(s, d, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .filter(col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
    }),

    // q155: TPC-H Q6 — forecast revenue change. Scan-only: all three
    // predicates and the 2-column read schema reach the parquet scan
    // (PushedFilters), the aggregate is a partial/final pair over a
    // 1-row group. The discount BETWEEN is written against the exact
    // 2-dp domain values so double comparison is exact.
    "q155_forecast_revenue" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")
            * col("l_discount").cast("decimal(4,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // q156: TPC-H Q7 — volume shipping between two nations, both
    // directions, by ship year. Same single fact-fact shuffle as
    // q154; the two-nation disjunction is applied after the broadcast
    // joins attach both nation names. supp/cust nation columns come
    // from two broadcast copies of the nation dim (aliased).
    "q156_nation_volume" -> ((s, d) => {
      val supN = t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val cusN = t(s, d, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      val o = t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
        .join(broadcast(cusN), col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
    }),

    // q157: TPC-H Q8 — national market share: the fraction of EUROPE
    // customers' PROMO-part revenue supplied by NATION_3, per order
    // year. The share is a conditional-sum / sum ratio over the SAME
    // exact decimal volume (NULL-else CASE, so no widening literal),
    // divided in double and rounded at 6 dp.
    "q157_market_share" -> ((s, d) => {
      val eurNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val supN = t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(eurNations), col("c_nationkey") === col("n_nationkey"),
          "left_semi")
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part").filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3",
            vol(col("l_extendedprice"), col("l_discount")))).cast("double") /
          sum(vol(col("l_extendedprice"), col("l_discount"))).cast("double"),
          6).as("mkt_share"))
    }),

    // q158: TPC-H Q9 — product-type profit. No partsupp, so unit cost
    // is the catalog p_retailprice; profit = Σ ep·(1−disc) −
    // retail·qty, all in exact decimal. Part is broadcast here; at
    // 100 TB the part dim (~20 M rows, few hundred MB) still fits the
    // broadcast budget, and if not, the join degrades to one extra
    // keyed shuffle without changing the plan shape.
    "q158_product_profit" -> ((s, d) => {
      val supN = t(s, d, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val green = t(s, d, "part").filter(col("p_name").like("red%"))
        .select(col("p_partkey"), col("p_retailprice"))
      t(s, d, "lineitem")
        .join(broadcast(green), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(supN), col("s_nationkey") === col("sn_key"))
        .groupBy(col("supp_nation").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum(vol(col("l_extendedprice"), col("l_discount")) -
          col("p_retailprice").cast("decimal(12,2)")
            * col("l_quantity").cast("decimal(4,1)"))
          .cast("double").as("sum_profit"))
    }),

    // q159: TPC-H Q10 — returned-item reporting: top 20 customers by
    // lost revenue in a quarter. lineitem(R)⋈orders(quarter) is the
    // one shuffle; customer+nation broadcast; deterministic order via
    // exact decimal revenue with custkey tiebreak.
    "q159_returned_items" -> ((s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1997-10-01") &&
          col("o_orderdate") < ts("1998-01-01"))
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"), col("n_name"))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // q160: TPC-H Q11 — important stock. partsupp value is replaced
    // by shipped value (qty·retailprice) of NATION_5 suppliers; the
    // 0.05% global threshold is a 1-row aggregate broadcast into the
    // HAVING. The supplier-nation restriction semi-reduces lineitem
    // via a broadcast join BEFORE the partkey aggregation, so the big
    // shuffle carries only the nation's slice.
    "q160_important_stock" -> ((s, d) => {
      val supp5 = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val slice = t(s, d, "lineitem")
        .join(broadcast(supp5), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          (col("p_retailprice").cast("decimal(12,2)")
            * col("l_quantity").cast("decimal(4,1)")).as("v"))
      val total = slice.agg(sum(col("v")).as("total_v"))
      slice.groupBy(col("l_partkey"))
        .agg(sum(col("v")).as("value_d"))
        .join(broadcast(total))
        // exact decimal comparison — value > 0.05% of total, no
        // double rounding anywhere near the threshold.
        .filter(col("value_d") * lit(2000) > col("total_v"))
        .select(col("l_partkey").as("p_partkey"),
          col("value_d").cast("double").as("value"))
    }),

    // q161: TPC-H Q12 — shipping-mode class counts. No shipmode
    // column, so the class is derived from the order→ship lag
    // (FAST <30 d, NORMAL, SLOW ≥90 d) — the same
    // case-classification × priority-split aggregation shape. Counts
    // use NULL-skipping count(CASE…) so both engines emit BIGINT.
    "q161_ship_class" -> ((s, d) => {
      val highPrio = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      val lag = datediff(col("l_shipdate"), col("o_orderdate"))
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"),
          col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
        .groupBy(when(lag < 30, "FAST").when(lag >= 90, "SLOW")
          .otherwise("NORMAL").as("ship_class"))
        .agg(count(when(highPrio, lit(1))).as("high_line_count"),
          count(when(!highPrio, lit(1))).as("low_line_count"))
    }),

    // q162: TPC-H Q14 — promo revenue share for one ship month: a
    // conditional-over-total ratio on the same exact decimal volume,
    // single row, round 6. Part is a broadcast of (partkey, type).
    "q162_promo_share" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-09-01") &&
          col("l_shipdate") < ts("1997-10-01"))
        .join(broadcast(t(s, d, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO",
            vol(col("l_extendedprice"), col("l_discount")))).cast("double") /
          sum(vol(col("l_extendedprice"), col("l_discount"))).cast("double"),
          6).as("promo_revenue_pct"))
    }),

    // q163: TPC-H Q15 — top supplier(s) by quarterly revenue. The
    // per-supplier aggregate is tiny (|supplier| rows); the MAX is a
    // window over that relation (no second scan), and the equality
    // join back is exact because both sides are the same decimal sum.
    "q163_top_supplier" -> ((s, d) => {
      // the global MAX arrives as a broadcast 1-row aggregate over the
      // PERSISTED per-supplier relation, not an un-partitioned window:
      // Window.partitionBy() funnels every supplier row (~1e8 at
      // 100 TB) through one task just to annotate a scalar, while the
      // agg's partial max never moves more than one value per
      // partition. Persisting rev keeps the lineitem scan single-pass.
      val rev = graft.CacheRegistry.getOrPersist(s, s"relational4.q163rev:$d") {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1997-01-01") &&
            col("l_shipdate") < ts("1997-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(sum(vol(col("l_extendedprice"), col("l_discount"))).as("r"))
      }
      rev.crossJoin(broadcast(rev.agg(max(col("r")).as("mx"))))
        .filter(col("r") === col("mx"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("r").cast("double").as("total_revenue"))
    }),

    // q164: TPC-H Q16 — supplier diversity per part attribute. The
    // partsupp relation is replaced by the DISTINCT (partkey,
    // suppkey) pairs actually shipped; the NOT-IN complaint-supplier
    // exclusion is a broadcast anti-join (negative balance here).
    // count(DISTINCT suppkey) per (brand, type, size) over the pair
    // set — two keyed shuffles, both post-reduction.
    "q164_supplier_diversity" -> ((s, d) => {
      val parts = t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#2" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 15, 22, 30, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSupp = t(s, d, "supplier").filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey"))
      t(s, d, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("p_brand"), col("p_type"), col("p_size"))
        .distinct()
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // q165: TPC-H Q19 — disjunctive bracket revenue: three OR'd
    // (brand, size, quantity) brackets. The part-side conjuncts ride
    // the broadcast dim; the combined disjunction is a single filter
    // the optimizer can partially push (common p_size ≥ 1 bound);
    // one broadcast join, no shuffle before the 1-row agg.
    "q165_bracket_revenue" -> ((s, d) => {
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = t(s, d, "lineitem")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      li.filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
        .agg(drevenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // q166: TPC-H Q20 — excess shippers of red parts: suppliers whose
    // 1997 shipped quantity of some red part exceeds 2× the global
    // average per (supplier, part) pair. The scalar threshold is a
    // 1-row broadcast; the comparison is kept in exact integer/decimal
    // cross-multiplied form (pair·cnt > 2·total) so no division or
    // rounding sits near the cut. Supplier list via left-semi.
    "q166_excess_shippers" -> ((s, d) => {
      val red = t(s, d, "part").filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val pairs = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
        .join(broadcast(red), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(12,1)")).as("q"))
      val tot = pairs.agg(sum(col("q")).as("tq"), count(lit(1)).as("np"))
      val qualifying = pairs.join(broadcast(tot))
        .filter(col("q") * col("np") > col("tq") * lit(2))
        .select(col("l_suppkey"))
      t(s, d, "supplier")
        .join(qualifying, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
    }),

    // q167: TPC-H Q21 — suppliers who kept orders waiting: on
    // multi-supplier 'F' orders, the UNIQUE last supplier to ship
    // (exists another supplier; not exists another equally-late one).
    // Both EXISTS collapse into window counts over the per-(order,
    // supplier) max-shipdate relation, which is already partitioned
    // by orderkey from its groupBy — the window reuses that exchange.
    "q167_waiting_suppliers" -> ((s, d) => {
      val perSupp = t(s, d, "lineitem")
        .join(t(s, d, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("l_shipdate")).as("s_max"))
      val w = Window.partitionBy(col("l_orderkey"))
      val flagged = perSupp
        .withColumn("o_max", max(col("s_max")).over(w))
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_last", count(when(col("s_max") === col("o_max"), 1)).over(w))
        .filter(col("n_supp") >= 2 && col("n_last") === 1 &&
          col("s_max") === col("o_max"))
      flagged
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }))

  def oracleSql: Map[String, String] = Map(
    "q153_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,

    "q154_local_volume" ->
      s"""SELECT n_name, $sqlDrevenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name""".stripMargin,

    "q155_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q156_nation_volume" ->
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         | CAST(year(l_shipdate) AS INT) AS l_year, $sqlDrevenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3""".stripMargin,

    "q157_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         | round(CAST(sum(CASE WHEN sn.n_name = 'NATION_3' THEN $sqlVol END)
         |     AS DOUBLE)
         |   / CAST(sum($sqlVol) AS DOUBLE), 6) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region ON cn.n_regionkey = r_regionkey
         |WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1""".stripMargin,

    "q158_product_profit" ->
      s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
         | CAST(sum($sqlVol - CAST(p_retailprice AS DECIMAL(12,2))
         |   * CAST(l_quantity AS DECIMAL(4,1))) AS DOUBLE) AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE 'red%'
         |GROUP BY 1, 2""".stripMargin,

    "q159_returned_items" ->
      s"""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal, n_name,
         | $sqlDrevenue AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-10-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q160_important_stock" ->
      """WITH slice AS (
        | SELECT l_partkey,
        |  CAST(p_retailprice AS DECIMAL(12,2))
        |    * CAST(l_quantity AS DECIMAL(4,1)) AS v
        | FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | WHERE EXISTS (SELECT 1 FROM supplier JOIN nation
        |    ON s_nationkey = n_nationkey
        |   WHERE s_suppkey = l_suppkey AND n_name = 'NATION_5')),
        |tot AS (SELECT sum(v) AS total_v FROM slice)
        |SELECT l_partkey AS p_partkey, CAST(sum(v) AS DOUBLE) AS value
        |FROM slice, tot
        |GROUP BY l_partkey, total_v
        |HAVING sum(v) * 2000 > total_v""".stripMargin,

    "q161_ship_class" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) < 30 THEN 'FAST'
        |  WHEN date_diff('day', o_orderdate, l_shipdate) >= 90 THEN 'SLOW'
        |  ELSE 'NORMAL' END AS ship_class,
        | count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 END) AS high_line_count,
        | count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |   THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,

    "q162_promo_share" ->
      s"""SELECT round(100.0 *
         |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN $sqlVol END) AS DOUBLE)
         |  / CAST(sum($sqlVol) AS DOUBLE), 6) AS promo_revenue_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,

    "q163_top_supplier" ->
      s"""WITH rev AS (
         | SELECT l_suppkey, sum($sqlVol) AS r
         | FROM lineitem
         | WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |   AND l_shipdate < TIMESTAMP '1997-04-01'
         | GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE r = (SELECT max(r) FROM rev)""".stripMargin,

    "q164_supplier_diversity" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#2' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 15, 22, 30, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY 1, 2, 3""".stripMargin,

    "q165_bracket_revenue" ->
      s"""SELECT $sqlDrevenue AS revenue, count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
         |    AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
         |    AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q166_excess_shippers" ->
      """WITH pairs AS (
        | SELECT l_suppkey, l_partkey,
        |  sum(CAST(l_quantity AS DECIMAL(12,1))) AS q
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_name LIKE 'red%'
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        | GROUP BY 1, 2),
        |tot AS (SELECT sum(q) AS tq, count(*) AS np FROM pairs)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE EXISTS (SELECT 1 FROM pairs, tot
        |  WHERE l_suppkey = s_suppkey AND q * np > tq * 2)""".stripMargin,

    "q167_waiting_suppliers" ->
      """WITH per_supp AS (
        | SELECT l_orderkey, l_suppkey, max(l_shipdate) AS s_max
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'
        | GROUP BY 1, 2),
        |flagged AS (
        | SELECT l_suppkey,
        |  max(s_max) OVER (PARTITION BY l_orderkey) AS o_max,
        |  count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
        |  s_max
        | FROM per_supp),
        |uniq AS (
        | SELECT l_orderkey, count(*) AS n_last
        | FROM per_supp
        | JOIN (SELECT l_orderkey AS ok, max(s_max) AS o_max
        |   FROM per_supp GROUP BY 1) mx
        |  ON l_orderkey = ok AND s_max = o_max
        | GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM per_supp p
        |JOIN (SELECT l_orderkey AS ok2, max(s_max) AS om2, count(*) AS ns2
        |  FROM per_supp GROUP BY 1) w ON p.l_orderkey = ok2
        |JOIN uniq u ON p.l_orderkey = u.l_orderkey
        |JOIN supplier ON p.l_suppkey = s_suppkey
        |WHERE p.s_max = om2 AND ns2 >= 2 AND u.n_last = 1
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 20""".stripMargin)
}
