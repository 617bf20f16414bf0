package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `graft_topk(col, k)` — native bounded top-k aggregate as a Catalyst
  * [[TypedImperativeAggregate]]: each partial keeps a k-element
  * min-heap, partials merge heap-into-heap, the final value is the k
  * largest inputs in descending order as `array<bigint>`.
  *
  * Why a typed-imperative aggregate and not `sort_array(collect_list)
  * (...)[0:k]`: collect_list materializes EVERY group value in the
  * aggregation buffer — O(group size) memory and shuffle bytes — and
  * only truncates after the fact. The heap buffer is O(k) at every
  * stage, so the partial-aggregate shuffle carries exactly k longs per
  * (partition, group) no matter how large the group is. Same
  * partial/final contract as the native [[graft.plans.TopKPerGroupExec]]
  * operator, expressed at the aggregate-function level so it composes
  * with any groupBy (the physical operator owns the whole-plan case).
  *
  * This is the engine's one [[TypedImperativeAggregate]] — the
  * aggregation extension point for state that doesn't fit Spark's
  * mutable-row buffer (here: a heap), completing the custom-extension
  * tour (Expression, optimizer Rule, planner Strategy + SparkPlan,
  * TVF, DSv2 connector). Deliberately exact and integer-typed: rank
  * order on BIGINT never ties ambiguously across engines, so the
  * DuckDB oracle compares bit-exactly (q189).
  *
  * Buffer serialization is a flat little-endian long array — the
  * contract Spark requires for spill/exchange of typed buffers.
  */
case class LongTopK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]] {

  // min-heap: head is the smallest retained value, evicted first
  private def emptyHeap: mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long](Ordering[Long].reverse)

  private lazy val k: Int = {
    require(kExpr.foldable, "graft_topk: k must be a literal")
    val v: Long = kExpr.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"graft_topk: bad k $other")
    }
    // reject rather than truncate: a BIGINT k above Int.MaxValue would
    // silently wrap to a small (or negative) heap bound
    require(v > 0 && v <= Int.MaxValue,
      s"graft_topk: k must be in [1, ${Int.MaxValue}], got $v")
    v.toInt
  }

  private def add(heap: mutable.PriorityQueue[Long], v: Long): Unit =
    if (heap.size < k) heap.enqueue(v)
    else if (v > heap.head) { heap.dequeue(); heap.enqueue(v) }

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] = emptyHeap

  override def update(
      heap: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) add(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(
      heap: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach(add(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(heap.toArray.sorted(Ordering[Long].reverse))

  override def serialize(heap: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * heap.size)
    heap.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val heap = emptyHeap
    while (bb.remaining() >= 8) add(heap, bb.getLong)
    heap
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk expects a BIGINT value column, got ${child.dataType.sql}")
    else if (!kExpr.foldable || !Seq(IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure("graft_topk expects a literal integer k")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): LongTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): LongTopK =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object LongTopK {
  /** DataFrame-side helper: `topk_long($"x", 5)` as an aggregate Column. */
  def column(c: Column, k: Int): Column =
    Bridge.column(LongTopK(Bridge.expression(c), Literal(k)).toAggregateExpression())
}
