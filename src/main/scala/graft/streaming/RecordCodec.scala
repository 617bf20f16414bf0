package graft.streaming

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.reflect.runtime.universe.TypeTag

/** Decode plug-in — the engine's equivalent of the reference's
  * caller-supplied protobuf `Parser<T>` (KPW:85-89, applied at
  * KPW:269-277). The reference fail-stops on an undecodable record
  * (KPW:272-277, acknowledged TODO); here each codec chooses a
  * [[DecodeErrorPolicy]]: FailFast reproduces the reference,
  * DeadLetter routes nulls to a quarantine output instead.
  *
  * Codecs are pure `Column → Column` transforms so decode stays
  * inside Catalyst codegen (no per-record JVM dispatch) — except
  * [[TypedCodec]], the generic escape hatch for opaque binary
  * formats, which pays the UDF cost by design.
  */
sealed trait DecodeErrorPolicy
object DecodeErrorPolicy {
  /** Undecodable record fails the query (reference semantics). */
  case object FailFast extends DecodeErrorPolicy
  /** Undecodable record decodes to null; `Pipeline` filters it to a
    * dead-letter sink. */
  case object DeadLetter extends DecodeErrorPolicy
}

trait RecordCodec {
  def schema: StructType

  /** bytes column → struct column of [[schema]] (null = decode failure). */
  def decode(bytes: Column): Column
}

/** JSON payloads (UTF-8 bytes). `from_json` yields null on corrupt
  * input, giving DeadLetter semantics for free.
  */
final case class JsonCodec(schema: StructType) extends RecordCodec {
  override def decode(bytes: Column): Column =
    from_json(bytes.cast("string"), schema)
}

/** Single-line CSV payloads. */
final case class CsvCodec(schema: StructType, sep: String = ",") extends RecordCodec {
  override def decode(bytes: Column): Column =
    from_csv(bytes.cast("string"), schema, Map("sep" -> sep))
}

/** Arbitrary binary formats via a caller-supplied decoder function —
  * the direct analog of the reference's `Parser<T>` plug-in point.
  * Production protobuf wiring note: with `spark-protobuf` on the
  * classpath this is `from_protobuf(col, messageName, descFile)`
  * (the jar is not in the offline test environment, so the seam is
  * exercised with [[TypedCodec]] + a hand-rolled binary format in
  * tests instead).
  */
final case class TypedCodec[T <: Product: TypeTag](decodeFn: Array[Byte] => T)
    extends RecordCodec {
  private val enc: Encoder[T] = Encoders.product[T]
  override val schema: StructType = enc.schema
  private val u = udf(decodeFn)
  override def decode(bytes: Column): Column = u(bytes)
}
