package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable substitutes for un-partitioned (or whole-group) window
  * functions.
  *
  * A global row_number / cumulative sum written as
  * `Window.orderBy(...)` with no partitionBy — or a per-group one
  * whose groups are huge — funnels every row (or every group) through
  * a single task. Fine at sf0.1; a straight cliff at 100 TB (the r5
  * verdict's q138/q112 findings). These helpers keep the exact
  * ordering semantics but distribute the work:
  *
  *  1. `repartitionByRange` on the sort key makes
  *     `spark_partition_id()` a coarse prefix of the total order
  *     (range partition i holds keys strictly below partition i+1's);
  *  2. each partition computes its local rank / running sum in
  *     parallel (the window partitions by partition id, so no task
  *     sees more than one partition's rows);
  *  3. a tiny O(partitions [× groups]) offset relation — per-partition
  *     totals, cumulated in partition-id order — is broadcast back and
  *     shifts local values to global ones.
  *
  * The offset cumulation itself runs through a single task, but over
  * O(partitions) rows, not O(rows) — that is the whole point.
  * Correctness does not depend on where the range boundaries fall
  * (sampling variance only moves rows between adjacent partitions,
  * never reorders them), so the helpers are deterministic for any
  * total order; callers must include a unique tiebreak column.
  */
object ScalableRank {

  /** Both consumers of the range exchange (the ranking window and the
    * offset counts) MUST read one materialization of it: range
    * boundaries come from sampling whose seed varies per
    * materialization, so two independent exchanges could disagree on
    * where partitions split and silently mis-rank. Spark's exchange
    * reuse (on by default, and what ReusedExchange/stage-cache
    * provide under AQE) guarantees this; refuse to run without it.
    */
  private def requireExchangeReuse(df: DataFrame): Unit =
    require(df.sparkSession.conf.get("spark.sql.exchange.reuse", "true").toBoolean,
      "ScalableRank needs spark.sql.exchange.reuse=true: the offset and " +
        "rank branches must observe one materialization of the range exchange")

  /** Appends a 1-based global row number over the total order `ord`
    * as column `out`. Equivalent to
    * `row_number().over(Window.orderBy(ord: _*))` without the
    * single-task funnel.
    */
  def globalRowNumber(df: DataFrame, out: String, ord: Column*): DataFrame = {
    requireExchangeReuse(df)
    // Local rank WITHOUT a second corpus exchange: a window partitioned
    // by spark_partition_id() would hash-shuffle the whole input again
    // (Catalyst can't see that pid values align 1:1 with the existing
    // range partitions). Instead the partitions are sorted in place and
    // monotonically_increasing_id() — (partitionId << 33) + rowOffset
    // by its documented layout — yields the 0-based offset within the
    // sorted partition directly. The subtraction below is exact while a
    // partition holds < 2^33 rows (8.6e9 — far past any sane partition
    // sizing), and ScalableRankSpec pins the whole construction against
    // the window formulation, so a layout change cannot slip through.
    val ranged = df.repartitionByRange(ord: _*)
      .sortWithinPartitions(ord: _*)
      .withColumn("_srk_pid", spark_partition_id())
      .withColumn("_srk_r",
        monotonically_increasing_id() - col("_srk_pid").cast("long") * lit(1L << 33) + 1L)
    // offsets: per-pid counts (no ordering needed) cumulated over the
    // tiny O(partitions) relation, broadcast back
    val offs = ranged.groupBy(col("_srk_pid")).agg(count(lit(1)).as("_srk_c"))
      .withColumn("_srk_off", coalesce(sum(col("_srk_c")).over(
        Window.orderBy(col("_srk_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_srk_pid"), col("_srk_off"))
    ranged.join(broadcast(offs), "_srk_pid")
      .withColumn(out, col("_srk_off") + col("_srk_r"))
      .drop("_srk_pid", "_srk_r")
      .drop("_srk_off")
  }

  /** Appends, per `groupCols` group in `orderCol` order, the running
    * (inclusive) sum of `weightCol` as `out` and the group total as
    * `totalOut` (q141's per-type percentile ranks come from this,
    * fed by a value histogram). Equivalent to
    * `sum(w).over(Window.partitionBy(g).orderBy(v).rowsBetween(unboundedPreceding, currentRow))`
    * plus `sum(w).over(Window.partitionBy(g))`, but no task ever holds
    * a whole group: the range partition on (group, order) splits big
    * groups across partitions, and the per-(partition, group) offsets
    * stitch the pieces back together.
    */
  def groupedCumSum(df: DataFrame, groupCols: Seq[String], orderCol: String,
      weightCol: String, out: String, totalOut: String): DataFrame = {
    requireExchangeReuse(df)
    val gcols = groupCols.map(col)
    val ord = col(orderCol)
    val ranged = df.repartitionByRange((gcols :+ ord): _*)
      .withColumn("_srk_pid", spark_partition_id())
    val intra = ranged.withColumn("_srk_cum",
      sum(col(weightCol)).over(
        Window.partitionBy(col("_srk_pid") +: gcols: _*).orderBy(ord)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // per-(partition, group) totals; cumulated per group in pid order.
    // O(partitions + groups) rows: range partitioning keeps each
    // partition on a contiguous (group, order) slice, so a partition
    // touches at most (its row span / group span + 1) groups. Counted
    // from `ranged` directly (no ordering needed), so this branch
    // reuses the range exchange without the window's sort.
    val slice = ranged.groupBy(col("_srk_pid") +: gcols: _*)
      .agg(sum(col(weightCol)).as("_srk_c"))
    val offs = slice
      .withColumn("_srk_off", coalesce(sum(col("_srk_c")).over(
        Window.partitionBy(gcols: _*).orderBy(col("_srk_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_srk_pid") +: gcols :+ col("_srk_off"): _*)
    val totals = slice.groupBy(gcols: _*)
      .agg(sum(col("_srk_c")).as(totalOut))
    intra.join(broadcast(offs), "_srk_pid" +: groupCols)
      .withColumn(out, col("_srk_off") + col("_srk_cum"))
      .join(broadcast(totals), groupCols)
      .drop("_srk_pid", "_srk_cum", "_srk_off")
  }
}
