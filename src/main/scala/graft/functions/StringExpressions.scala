package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native catalyst expression.
  *
  * Training-data pipelines must canonicalize text before any
  * fingerprint/dedup step: "é" as U+00E9 and as "e"+U+0301 are the
  * same text but different bytes, so md5/MinHash/SimHash fingerprints
  * diverge and near-duplicates are silently missed. Spark has no
  * built-in Unicode normalizer, so this is the engine's scalar
  * custom-Expression example for the string domain (the vector domain
  * twin is [[FloatVecDot]]): codegen'd (stays inside whole-stage
  * codegen — no UDF serialization boundary), null-intolerant, and
  * type-checked at analysis time.
  *
  * Registered in SQL as `nfc_normalize(str)` via
  * `SparkSessionExtensions.injectFunction` (see
  * [[graft.GraftExtensions]]).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and codegen.
    * Fast path: `Normalizer.isNormalized` is O(n) with no allocation,
    * and virtually all real text is already NFC — only the rare
    * decomposed string pays for the rewrite. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}

object StringFunctions {
  /** Unicode NFC canonicalization of a string column. */
  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(c)))
}
