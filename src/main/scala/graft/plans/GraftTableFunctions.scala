package graft.plans

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, DateAdd, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Range => LogicalRange}
import org.apache.spark.sql.types.{DateType, StringType, IntegerType}

/** SQL table-valued functions, injected session-wide via
  * `SparkSessionExtensions.injectTableFunction` (see
  * [[graft.GraftExtensions]]) — the engine's example of extending the
  * FROM-clause surface, alongside the scalar-function
  * (`injectFunction`), optimizer-rule (`injectOptimizerRule`) and
  * planner-strategy (`injectPlannerStrategy`) extension points.
  *
  * `graft_date_spine(start, end)` produces one `d: DATE` row per
  * calendar day in the inclusive range — the canonical dimension
  * generator for zero-filled calendar joins (gap-fill, retention
  * grids, SLA day counting). It plans as a catalyst `Range` projected
  * through `date_add`, NOT a driver-materialized `LocalRelation`:
  * nothing is collected on the driver, the row count is known to the
  * optimizer (`Range.computeStats`), and a year-scale spine is
  * trivially broadcastable on the build side of a calendar join.
  */
object GraftTableFunctions {

  /** Hard cap on spine length — a fat-fingered year like 29950101
    * would otherwise plan a multi-billion-row generator. ~27k years
    * of days is far beyond any calendar analysis. */
  private val MaxDays: Long = 10_000_000L

  private def dateArg(e: Expression, pos: Int): LocalDate = e match {
    case Literal(v, _: StringType) if v != null => LocalDate.parse(v.toString)
    case Literal(v: Int, DateType) => LocalDate.ofEpochDay(v.toLong)
    case other => throw new IllegalArgumentException(
      s"graft_date_spine: argument $pos must be a date or 'yyyy-MM-dd' string literal, " +
        s"got ${other.sql}")
  }

  def dateSpine(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 2,
      s"graft_date_spine takes exactly 2 arguments (start, end), got ${args.length}")
    val start = dateArg(args.head, 1)
    val end = dateArg(args(1), 2)
    val n = ChronoUnit.DAYS.between(start, end) + 1
    require(n > 0, s"graft_date_spine: end $end precedes start $start")
    require(n <= MaxDays, s"graft_date_spine: $n days exceeds the $MaxDays cap")
    // One slice per ~8k rows: a one-year spine stays single-task, a
    // century-scale spine still parallelizes.
    val slices = math.max(1L, math.min(32L, n / 8192L)).toInt
    val range = LogicalRange(0L, n, 1L, slices)
    val day = Alias(
      DateAdd(Literal(start.toEpochDay.toInt, DateType),
        Cast(range.output.head, IntegerType)),
      "d")()
    Project(Seq(day), range)
  }
}
