package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of (temporal) join — the second whole-operator extension
  * (after [[TopKPerGroupExec]]): `LogicalPlan` node + planner
  * [[SparkStrategy]] + co-partitioned sorted-merge physical operator,
  * registered through `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.GraftExtensions]]).
  *
  * Semantics (left as-of join): every left row, joined to the right
  * row with the greatest `rightTime <= leftTime` among rows with
  * equal keys — null-extended when no such row exists. The right side
  * must be unique per (key, time); with duplicates the sort-last one
  * wins deterministically.
  *
  * Why a physical operator when [[graft.operators.AsOf]] already
  * composes it declaratively (union + running `last(_, ignoreNulls)`
  * window) — the advantages are STRUCTURAL, visible at scale, not at
  * bench size:
  *  - '''shuffle volume/shape''': the union widens every left row
  *    with a null right-struct and every right row with a null
  *    left-struct before its single combined shuffle; this operator
  *    shuffles each side in its own columnar shape.
  *  - '''exchange elision''': a union of two scans is never
  *    pre-partitioned, so the composed plan ALWAYS pays its shuffle;
  *    here each side declares `ClusteredDistribution` independently,
  *    so bucketed / pre-partitioned inputs join with ZERO exchanges
  *    (asserted in AsOfJoinSpec — `EnsureRequirements` adds nothing).
  *  - '''bounded rewrite''': the window copies the matched right
  *    struct into every left row inside the sort buffer; the merge
  *    streams with one buffered right row per key.
  * Measured honestly at sf0.1 (100 k events): the codegen'd window
  * composition is FASTER (0.13 s vs 0.39 s) — the interpreted
  * per-row merge loses to whole-stage codegen while constants
  * dominate; both stay registered (q53 composed, q181 native) with
  * the same DuckDB ASOF oracle, and the composed form remains the
  * default recommendation below bucketed-layout scale.
  *
  * Null keys follow join semantics: a null in any key column matches
  * nothing (the merge skips them on both sides).
  */
case class AsOfJoinLogical(
    leftKeys: Seq[Expression],
    leftTime: Expression,
    rightKeys: Seq[Expression],
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan,
    forward: Boolean = false) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinLogical =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    leftTime: Expression,
    rightKeys: Seq[Expression],
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // key rows projected to UnsafeRow for cheap binary comparison;
      // time projected to a 1-col row compared with a natural ordering
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(
        lKeys.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(
        Seq(lTime.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      val rBuf = rIter.buffered
      // backward: last right row whose (key, time) is <= the current
      // left (key, time); valid only while its key equals the left key
      var matchKey: InternalRow = null
      var matchRow: InternalRow = null

      def keyHasNull(k: InternalRow): Boolean = {
        var i = 0
        while (i < lKeys.length) { if (k.isNullAt(i)) return true; i += 1 }
        false
      }
      // A NULL time never as-of-matches, on either side and in either
      // direction — the SQL-comparison semantics the oracle computes.
      // Without the explicit guard the natural ordering (null lowest)
      // made the two directions disagree: backward matched a null left
      // time only to null-time right rows, forward matched it to the
      // key's EARLIEST right row.
      def timeIsNull(t: InternalRow): Boolean = t.isNullAt(0)

      if (!forward) lIter.map { l =>
        val lk = lKeyProj(l)
        if (keyHasNull(lk) || timeIsNull(lTimeProj(l))) {
          joined(l, nullRight)
        } else {
          // lTimeProj and rTimeProj are DISTINCT projections with
          // separate result buffers, so no defensive copy is needed
          // for the comparison below
          val lt = lTimeProj(l)
          // advance the right cursor through every row at or before
          // (lk, lt); remember the latest one whose key equals lk
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0 || keyHasNull(rk) ||
                (kc == 0 && timeIsNull(rTimeProj(r)))) {
              // stale key, null key, or null right time (sorts first in
              // the key, can never match): skip, invalidates nothing
              rBuf.next()
            } else if (kc == 0 &&
                timeOrd.compare(rTimeProj(r), lt) <= 0) {
              matchKey = rk.copy()
              matchRow = rBuf.next().copy()
            } else {
              advance = false // right is ahead of this left row
            }
          }
          if (matchRow != null && keyOrd.compare(matchKey, lk) == 0)
            joined(l, matchRow)
          else
            joined(l, nullRight)
        }
      } else lIter.map { l =>
        // FORWARD: first right row with key == lk and rTime >= lTime.
        // Everything the cursor consumes can never match a later left
        // row: later lefts are lexicographically >= (lk, lt), so a
        // right row behind either the key or (same-key) the time is
        // permanently stale. The matching head is NOT consumed — it
        // may serve several left rows — only copied out per emission.
        val lk = lKeyProj(l)
        if (keyHasNull(lk) || timeIsNull(lTimeProj(l))) {
          joined(l, nullRight)
        } else {
          val lt = lTimeProj(l)
          var advance = true
          while (advance && rBuf.hasNext) {
            val r = rBuf.head
            val rk = rKeyProj(r)
            val kc = keyOrd.compare(rk, lk)
            // a null right time sorts first within the key and is
            // consumed by the rTime < lt stale test below (lt is
            // non-null here), so no extra guard is needed
            if (kc < 0 || keyHasNull(rk) ||
                (kc == 0 && timeOrd.compare(rTimeProj(r), lt) < 0)) {
              rBuf.next() // permanently stale for this and all later lefts
            } else {
              advance = false // head is the candidate (or a later key)
            }
          }
          if (rBuf.hasNext && keyOrd.compare(rKeyProj(rBuf.head), lk) == 0)
            joined(l, rBuf.head.copy())
          else
            joined(l, nullRight)
        }
      }
    }
  }
}

/** Plans [[AsOfJoinLogical]] as the co-partitioned sorted merge. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinLogical(lk, lt, rk, rt, l, r, fwd) =>
      AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r), fwd) :: Nil
    case _ => Nil
  }
}

/** Column-level API over the native operator. */
object AsOfJoin {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.graftbridge.Bridge

  /** Native left as-of join; `rightTime` is cast to `leftTime`'s type
    * when they differ (same contract as [[graft.operators.AsOf]]).
    * Output = all left columns, then all right columns (nullable).
    * `forward = true` flips the direction: the match is the FIRST
    * right row with `rightTime >= leftTime` (next event at-or-after)
    * instead of the last one at-or-before.
    */
  def asofJoinNative(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String,
      forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val lTimeType = left.schema(lTime).dataType
    val rightCast =
      if (right.schema(rTime).dataType == lTimeType) right
      else right.withColumn(rTime, col(rTime).cast(lTimeType))
    val lPlan = Bridge.analyzed(left)
    val rPlan = Bridge.analyzed(rightCast)
    val lResolve = Bridge.resolver(left)
    val rResolve = Bridge.resolver(rightCast)
    def le(c: Column) = lResolve(Bridge.expression(c))
    def re(c: Column) = rResolve(Bridge.expression(c))
    Bridge.ofRows(left.sparkSession, AsOfJoinLogical(
      Seq(le(col(lKey))), le(col(lTime)),
      Seq(re(col(rKey))), re(col(rTime)),
      lPlan, rPlan, forward))
  }
}
