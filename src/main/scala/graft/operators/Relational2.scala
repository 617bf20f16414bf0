package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Second relational batch: the join/window/agg shapes SURVEY §2.2
  * lists that the first batch didn't exercise — full outer join,
  * non-equi (range) join in its scale-correct binned form, GROUPING
  * SETS, rank/dense_rank/ntile windows, array functions, and a
  * custom typed Aggregator UDAF.
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Geometric mean as a typed [[Aggregator]] (UDAF surface): log-sum
    * buffer, mergeable across partitions — the same partial/final
    * shape Spark's built-in aggregates have, so it scales like one.
    */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    override def merge(x: (Double, Long), y: (Double, Long)): (Double, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Double, Long)): Double = math.exp(r._1 / r._2)
    override def bufferEncoder: org.apache.spark.sql.Encoder[(Double, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    override def outputEncoder: org.apache.spark.sql.Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q40: full outer join — unmatched rows survive on both sides
    // (parts filtered to a subset so both null sides are non-trivial).
    "q40_join_full_outer" -> ((s, d) => {
      val p = t(s, d, "part").filter(col("p_size") > 45)
      t(s, d, "lineitem")
        .join(p, col("l_partkey") === col("p_partkey"), "full_outer")
        .groupBy(col("p_brand"))
        .agg(
          count(col("l_orderkey")).as("n_items"),
          countDistinct(col("p_partkey")).as("n_parts"),
          count(when(col("l_orderkey").isNull, 1)).as("n_unsold"))
    }),

    // q41: range join, binned. The naive theta join is O(N²); binning
    // each price to 0.1-wide buckets and replicating one side to the
    // 3 covering buckets turns it into an equi-join that
    // hash-partitions at any scale. The oracle replicates the same
    // binning, so fp-edge bucket assignment matches by construction.
    "q41_range_join_binned" -> ((s, d) => {
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          floor(col("p_retailprice") * 10).cast("long").as("bin"))
      val a = p.select(col("p_partkey").as("p_a"), col("p_retailprice").as("price_a"),
        explode(array(col("bin") - 1, col("bin"), col("bin") + 1)).as("bin"))
      val b = p.select(col("p_partkey").as("p_b"), col("p_retailprice").as("price_b"),
        col("bin"))
      a.join(b, Seq("bin"))
        .filter(col("p_a") < col("p_b") &&
          abs(col("price_a") - col("price_b")) <= 0.1)
        .select(col("p_a"), col("p_b"),
          round(col("price_a"), 2).as("price_a"), round(col("price_b"), 2).as("price_b"))
    }),

    // q42: GROUPING SETS (beyond rollup/cube) via the SQL surface.
    "q42_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("li_gs")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
          | count(*) AS n
          |FROM li_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    }),

    // q43: rank family — rank/dense_rank are tie-stable by value;
    // ntile/lead get a unique-key tiebreak in their ordering.
    "q43_window_rank" -> ((s, d) => {
      val byPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      val stable = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rnk", rank().over(byPrice))
        .withColumn("drnk", dense_rank().over(byPrice))
        .withColumn("quartile", ntile(4).over(stable))
        .withColumn("next_price",
          round(coalesce(lead(col("o_totalprice"), 1).over(stable), lit(0.0)), 2))
        .filter(col("rnk") <= 5)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk"), col("drnk"),
          col("quartile"), col("next_price"))
    }),

    // q44: array functions — collect to a sorted array per order;
    // arrays are serialized to strings so the oracle compare is
    // representation-stable.
    "q44_array_funcs" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lines"))
        .select(
          col("l_orderkey"),
          concat_ws(",", col("lines")).as("line_list"),
          size(col("lines")).as("n_lines"),
          array_contains(col("lines"), 3).as("has_line3"),
          concat_ws(",", slice(col("lines"), 1, 2)).as("first_two"))
    }),

    // q46: exact percentiles (sort-based, linear interpolation —
    // the same definition as DuckDB's quantile_cont).
    "q46_percentiles" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("med_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("med_price"),
          count(lit(1)).as("n"))
    }),

    // q47: statistical aggregates (stddev/corr/covar). Both engines
    // use numerically-stable co-moment merges whose partial order
    // differs, so results are rounded where only measure-zero
    // boundary hits could diverge.
    "q47_stats_agg" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
          round(var_samp(col("l_discount")), 6).as("var_disc"))
    }),

    // q50: sliding windows in batch form — each event explodes to its
    // 4 covering (1h window, 15min slide) starts; the same window()
    // semantics Structured Streaming uses, as a plain shuffle-able
    // explode+agg at any scale.
    "q50_sliding_windows" -> ((s, d) => {
      val trunc15 = date_trunc("hour", col("ts")) +
        expr("INTERVAL '15' MINUTE") * floor(minute(col("ts")) / 15)
      t(s, d, "events")
        .withColumn("w_start", explode(sequence(
          trunc15 - expr("INTERVAL '45' MINUTE"), trunc15,
          expr("INTERVAL '15' MINUTE"))))
        .groupBy(col("w_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"))
    }),

    // q51: arg-max aggregation (max_by) with a deterministic integer
    // ordinal (cents ⊕ key) so ties cannot flip between engines.
    "q51_argmax" -> ((s, d) => {
      val ord = (round(col("c_acctbal") * 100).cast("long") * 10000000L + col("c_custkey"))
      t(s, d, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          max_by(col("c_name"), ord).as("top_customer"),
          round(max(col("c_acctbal")), 2).as("top_acctbal"))
    }),

    // q52: pivot — long→wide on order status (fixed column set so the
    // plan is a single pass, no distinct-values pre-query).
    "q52_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot(col("o_orderstatus"), Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
    }),

    // q45: custom UDAF — geometric mean of extendedprice per flag.
    // q192: schema-typed JSON parse + NULL-SAFE equality join — the
    // two SQL surfaces the inventory still lacked. from_json parses
    // props against an explicit struct schema (the typed path vs
    // q24's stringly get_json_object; the absent `missing` field
    // proves typed-null handling: its count must be 0). The derived
    // key goes NULL on multiples of 10, and the broadcast dim join
    // uses <=> so the NULL bucket MATCHES the dim's NULL row instead
    // of dropping — the semantics difference between = and null-safe
    // equality is exactly what the 'none' row's count gates.
    "q192_json_null_safe" -> ((s, d) => {
      val ev = t(s, d, "events")
        .withColumn("p", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT, missing STRING")))
        .withColumn("k10",
          when(col("p.k") % 10 === 0, lit(null).cast("int"))
            .otherwise((col("p.k") % 10).cast("int")))
      val dim = s.createDataFrame(
        s.sparkContext.parallelize(
          org.apache.spark.sql.Row(null, "none") +:
            (1 to 9).map(i => org.apache.spark.sql.Row(Integer.valueOf(i), s"b$i"))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k10v",
            org.apache.spark.sql.types.IntegerType, nullable = true),
          org.apache.spark.sql.types.StructField("label",
            org.apache.spark.sql.types.StringType, nullable = false))))
      ev.join(broadcast(dim), col("k10") <=> col("k10v"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"),
          count(col("p.missing")).as("n_missing"))
    }),

    "q45_udaf_geomean" -> ((s, d) => {
      val geo = udaf(GeoMean)
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(geo(col("l_extendedprice")), 4).as("geo_price"),
          count(lit(1)).as("n"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q192_json_null_safe" ->
      """WITH ev AS (
        |  SELECT user_id,
        |   CAST(props->>'k' AS INT) AS k,
        |   props->>'missing' AS missing
        |  FROM events),
        | keyed AS (
        |  SELECT user_id, missing,
        |   CASE WHEN k % 10 = 0 THEN NULL ELSE k % 10 END AS k10
        |  FROM ev),
        | dim AS (SELECT * FROM (VALUES (NULL, 'none'), (1, 'b1'), (2, 'b2'),
        |   (3, 'b3'), (4, 'b4'), (5, 'b5'), (6, 'b6'), (7, 'b7'),
        |   (8, 'b8'), (9, 'b9')) AS t(k10v, label))
        |SELECT label, count(*) AS n_events,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        | CAST(count(missing) AS BIGINT) AS n_missing
        |FROM keyed JOIN dim ON k10 IS NOT DISTINCT FROM k10v
        |GROUP BY label""".stripMargin,
    "q40_join_full_outer" ->
      """SELECT p_brand, count(l_orderkey) AS n_items,
        | CAST(count(DISTINCT p_partkey) AS BIGINT) AS n_parts,
        | count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS n_unsold
        |FROM lineitem FULL OUTER JOIN
        | (SELECT * FROM part WHERE p_size > 45) p
        | ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "q41_range_join_binned" ->
      """WITH p AS (SELECT p_partkey, p_retailprice,
        |   CAST(floor(p_retailprice * 10) AS BIGINT) AS bin FROM part),
        | a AS (SELECT p_partkey AS p_a, p_retailprice AS price_a,
        |   unnest([bin - 1, bin, bin + 1]) AS bin FROM p),
        | b AS (SELECT p_partkey AS p_b, p_retailprice AS price_b, bin FROM p)
        |SELECT p_a, p_b, round(price_a, 2) AS price_a, round(price_b, 2) AS price_b
        |FROM a JOIN b USING (bin)
        |WHERE p_a < p_b AND abs(price_a - price_b) <= 0.1""".stripMargin,

    "q42_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin,

    "q43_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk, drnk, quartile, next_price FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(rank() OVER w1 AS INT) AS rnk,
        |  CAST(dense_rank() OVER w1 AS INT) AS drnk,
        |  CAST(ntile(4) OVER w2 AS INT) AS quartile,
        |  round(coalesce(lead(o_totalprice, 1) OVER w2, 0.0), 2) AS next_price
        | FROM orders
        | WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
        |  w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rnk <= 5""".stripMargin,

    "q44_array_funcs" ->
      """SELECT l_orderkey,
        | array_to_string(lines, ',') AS line_list,
        | CAST(len(lines) AS INT) AS n_lines,
        | list_contains(lines, 3) AS has_line3,
        | array_to_string(lines[1:2], ',') AS first_two
        |FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
        |  FROM lineitem GROUP BY l_orderkey)""".stripMargin,

    "q46_percentiles" ->
      """SELECT l_returnflag,
        | round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
        | round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
        | round(quantile_cont(l_extendedprice, 0.5), 4) AS med_price,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q47_stats_agg" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 6) AS sd_qty,
        | round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        | round(var_samp(l_discount), 6) AS var_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q45_udaf_geomean" ->
      """SELECT l_returnflag,
        | round(exp(avg(ln(l_extendedprice))), 4) AS geo_price,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q50_sliding_windows" ->
      """SELECT w_start, event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM (SELECT event_type, value,
        |   unnest(generate_series(t15 - INTERVAL 45 MINUTE, t15, INTERVAL 15 MINUTE)) AS w_start
        |  FROM (SELECT event_type, value,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP))
        |     + INTERVAL 15 MINUTE * CAST(floor(minute(ts) / 15) AS INT) AS t15
        |   FROM events))
        |GROUP BY 1, 2""".stripMargin,

    "q51_argmax" ->
      """SELECT c_mktsegment,
        | arg_max(c_name, CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey)
        |   AS top_customer,
        | round(max(c_acctbal), 2) AS top_acctbal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "q52_pivot" ->
      """SELECT o_orderpriority,
        | count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        | count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        | count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin)
}
