package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for vector math over `array<float>`
  * embedding columns.
  *
  * The composable alternative (`aggregate(zip_with(a, b, ...))`)
  * allocates an intermediate array per row and walks generic
  * `ArrayData` through interpreted lambda dispatch; this expression
  * generates a tight primitive loop inside whole-stage codegen —
  * the difference is ~3-5× on cosine-heavy plans (q31/q32/q37).
  *
  * Accumulation is a sequential left-to-right double fold, the same
  * order as both the higher-order-function formulation and DuckDB's
  * `list_dot_product`, so oracle hash parity is preserved bit-for-bit.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Reject anything but array<float> at analysis time: getFloat() on
  // an array<double>/array<int> would silently read wrong bytes.
  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).collect {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != FloatType => t.catalogString
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got ${bad.mkString(", ")}")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Exact squared Euclidean distance between two `array<bigint>`
  * columns (integer-quantized embeddings) as a single BIGINT — the
  * scoring primitive of the integer-exact similarity queries (q176).
  * Same rationale as [[FloatVecDot]]: `aggregate(zip_with(...))`
  * walks interpreted lambdas and allocates a temporary array per
  * row (higher-order functions never enter whole-stage codegen);
  * this is a tight generated loop, measured ~4× faster on the
  * hard-negative join. All arithmetic is exact long — overflow-free
  * while |component| ≤ ~2³¹ for typical dims, far beyond any
  * milli-quantized embedding.
  */
case class LongVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = Seq(left, right).map(_.dataType).collect {
      case t if !t.isInstanceOf[ArrayType] ||
        t.asInstanceOf[ArrayType].elementType != LongType => t.catalogString
    }
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got ${bad.mkString(", ")}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_sqdist"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecSqDist =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two `array<float>` columns in double precision. */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Exact integer squared distance of two `array<bigint>` columns. */
  def vec_sqdist(a: Column, b: Column): Column =
    Bridge.column(LongVecSqDist(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm of an `array<float>` column. */
  def vec_norm(a: Column): Column = sqrt(vec_dot(a, a))
}
