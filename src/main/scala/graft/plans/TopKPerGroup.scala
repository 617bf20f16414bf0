package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

import scala.collection.mutable

/** Native top-k-per-group operator: `LogicalPlan` node + planner
  * [[SparkStrategy]] + two-phase physical operator, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (see
  * [[graft.GraftExtensions]]).
  *
  * The composed alternative — `row_number().over(Window.partitionBy(g)
  * .orderBy(o)) <= k` — shuffles EVERY row of every group, then sorts
  * each partition before discarding all but k rows per group. This
  * operator instead runs a pre-shuffle phase that keeps a bounded
  * per-group heap (k rows max per group per input partition), so the
  * exchange moves at most `k × |groups| × |partitions|` rows — the
  * same partial/final shape hash aggregation uses, applied to top-k
  * (legal because top-k is a mergeable aggregate: dropping a row that
  * has k better rows in its own partition segment can never drop a
  * global top-k row). At 100 TB with, say, k=3 over millions of
  * groups, this is the difference between shuffling the fact table
  * and shuffling ~k rows per group.
  *
  * The final phase declares `ClusteredDistribution(groupExprs)`, so
  * `EnsureRequirements` inserts the hash exchange — or elides it when
  * the child is already partitioned on the group key (bucketed /
  * pre-repartitioned input ⇒ zero-shuffle top-k; asserted in
  * TopKPerGroupSpec).
  *
  * Memory safety: the partial phase flushes its hash state whenever
  * the number of distinct groups in a partition exceeds
  * `graft.topk.partialMaxGroups` (flushing only weakens the filter —
  * every flushed segment retains its own top-k, so correctness is
  * unaffected). The final phase holds ≤ k rows per group of its own
  * key range, the same bound as any keyed aggregation.
  */
case class TopKPerGroupLogical(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupLogical =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    partialMaxGroups: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  // group membership is untouched, so whatever partitioning the child
  // has by the time this node runs still holds for downstream ops
  override def outputPartitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = output
    val groups = groupExprs
    val sortOrder = order
    val limit = k
    val flushAt = if (partial) partialMaxGroups else Int.MaxValue
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groups, schema)
      // SortOrder already encodes direction/null placement; "best" =
      // smallest under this ordering. The queue's head is the WORST
      // retained row (max-heap), so admission is one compare.
      val ord = RowOrdering.create(sortOrder, schema)
      val state = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var flushed: Iterator[InternalRow] = Iterator.empty

      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        state.get(key) match {
          case Some(pq) =>
            if (pq.size < limit) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) { pq.dequeue(); pq.enqueue(row.copy()) }
          case None =>
            val pq = mutable.PriorityQueue.empty[InternalRow](ord)
            pq.enqueue(row.copy())
            state.put(key.copy(), pq)
        }
      }
      def drain(): Iterator[InternalRow] = {
        val out = state.valuesIterator.flatMap(_.iterator).toArray
        state.clear()
        out.iterator
      }

      new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          while (!flushed.hasNext && iter.hasNext) {
            insert(iter.next())
            if (state.size > flushAt) flushed = drain()
          }
          if (!flushed.hasNext && state.nonEmpty) flushed = drain()
          flushed.hasNext
        }
        override def next(): InternalRow = flushed.next()
      }
    }, preservesPartitioning = true)
  }
}

/** Plans [[TopKPerGroupLogical]] as partial → (exchange) → final. */
case class TopKPerGroupStrategy(partialMaxGroups: Int) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupLogical(g, o, k, child) =>
      val pre = TopKPerGroupExec(g, o, k, partial = true, partialMaxGroups, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, partialMaxGroups, pre) :: Nil
    case _ => Nil
  }
}

/** Column-level API over the native operator. */
object TopKPerGroup {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.graftbridge.Bridge

  /** Top `k` rows of `df` per `groupCols` group under `orderCols`
    * (use `col(...).desc` / `.asc`; add a unique-key tiebreak for a
    * deterministic result set, exactly as with a window rank).
    */
  def topK(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val child = Bridge.analyzed(df)
    val resolve = Bridge.resolver(df)
    val g = groupCols.map(c => resolve(Bridge.expression(c)))
    val o = orderCols.map { c =>
      resolve(Bridge.expression(c)) match {
        case s: SortOrder => s
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Bridge.ofRows(df.sparkSession, TopKPerGroupLogical(g, o, k, child))
  }
}
