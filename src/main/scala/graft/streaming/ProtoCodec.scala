package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.Row
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions
import org.apache.spark.sql.types._

/** Hand-rolled protobuf wire-format codec — the reference's ONLY
  * record format (its caller-supplied `Parser<T>`, KPW:85-89, applied
  * per record at KPW:269-277; test schema test-message.proto:5-10).
  * `protobuf-java` / `spark-protobuf` are absent from the offline
  * environment, so the varint + length-delimited wire format
  * (public spec: protobuf.dev/programming-guides/encoding) is decoded
  * directly — ~100 lines for the full scalar-field surface.
  *
  * Decode semantics mirror protobuf-java's proto2 parser:
  *  - unknown fields are skipped by wire type (forward compatibility);
  *  - repeated occurrences of a scalar field: last one wins;
  *  - a `required` field missing from the payload, a truncated varint
  *    or length run, a wire-type mismatch on a known field, or a
  *    deprecated group tag ⇒ the record is UNDECODABLE — the codec
  *    returns a null struct, which [[Pipeline.start]] turns into the
  *    reference's fail-stop (FailFast, KPW:272-277) or a dead-letter
  *    row (DeadLetter), per policy;
  *  - absent `optional` fields decode to null (matching what the
  *    reference's proto→parquet writer materializes).
  */
// Serializable: descriptors are captured in executor-side closures
// (the decode UDF); PMessage is a case CLASS, so without this Java
// serialization rejects the non-serializable superclass.
sealed abstract class ProtoType(val wireType: Int, val sparkType: DataType)
  extends Serializable
object ProtoType {
  // varint (wire 0)
  case object Int32 extends ProtoType(0, IntegerType)
  case object Int64 extends ProtoType(0, LongType)
  case object UInt32 extends ProtoType(0, IntegerType) // wraps like protobuf-java
  case object UInt64 extends ProtoType(0, LongType)
  case object SInt32 extends ProtoType(0, IntegerType) // zigzag
  case object SInt64 extends ProtoType(0, LongType) // zigzag
  case object Bool extends ProtoType(0, BooleanType)
  // 64-bit (wire 1)
  case object Fixed64 extends ProtoType(1, LongType)
  case object SFixed64 extends ProtoType(1, LongType)
  case object PDouble extends ProtoType(1, DoubleType)
  // length-delimited (wire 2)
  case object PString extends ProtoType(2, StringType)
  case object PBytes extends ProtoType(2, BinaryType)
  // 32-bit (wire 5)
  case object Fixed32 extends ProtoType(5, IntegerType)
  case object SFixed32 extends ProtoType(5, IntegerType)
  case object PFloat extends ProtoType(5, FloatType)

  /** Nested message (wire 2): decodes to a Spark STRUCT of the
    * sub-descriptor, recursively — the shape `ProtoWriteSupport`
    * handles transitively for the reference (SURVEY §1.2). */
  final case class PMessage(fields: Seq[ProtoField])
    extends ProtoType(2, StructType(fields.map(f =>
      StructField(f.name, f.dataType, nullable = true))))

  /** Proto3 `map<K,V>` (wire 2): on the wire it is a repeated
    * `entry { K key = 1; V value = 2; }` submessage — exactly the
    * shape [[PMessage]] already parses — surfaced as a Spark
    * `MapType`. Later entries with a duplicate key overwrite earlier
    * ones and an absent key/value decodes to the proto3 default,
    * both per protobuf-java's map semantics (the generality
    * `ProtoWriteSupport` gets transitively for the reference's
    * any-`T extends Message` bound, KPW:63). Keys follow the proto
    * spec: integral, bool, or string only. */
  final case class PMap(keyType: ProtoType, valueType: ProtoType)
    extends ProtoType(2,
      MapType(keyType.sparkType, valueType.sparkType, valueContainsNull = false)) {
    require(keyType match {
      case Int32 | Int64 | UInt32 | UInt64 | SInt32 | SInt64 | Bool |
           Fixed32 | Fixed64 | SFixed32 | SFixed64 | PString => true
      case _ => false
    }, s"proto map key must be integral, bool, or string, got $keyType")
    require(valueType match {
      case _: PMap => false
      case _ => true
    }, "proto forbids map-of-map values")
    private[streaming] def entryFields: Seq[ProtoField] = Seq(
      ProtoField(1, "key", keyType), ProtoField(2, "value", valueType))
  }

  /** Proto3 default for an absent map entry key/value (protobuf-java
    * never yields null from a map). */
  private[streaming] def defaultOf(t: ProtoType): Any = t match {
    case Int32 | UInt32 | SInt32 | Fixed32 | SFixed32 => 0
    case Int64 | UInt64 | SInt64 | Fixed64 | SFixed64 => 0L
    case Bool => false
    case PFloat => 0.0f
    case PDouble => 0.0d
    case PString => ""
    case PBytes => Array.empty[Byte]
    case PMessage(sub) => Row.fromSeq(sub.map(_ => null))
    case m: PMap => Map.empty[Any, Any]
  }

  /** Numeric/bool scalars may arrive PACKED (one wire-2 blob of
    * concatenated payloads) when repeated — protobuf-java accepts
    * packed and unpacked interchangeably, so the codec does too. */
  def packable(t: ProtoType): Boolean = t match {
    case PString | PBytes | _: PMessage | _: PMap => false
    case _ => true
  }
}

/** One message field: proto field number, output column name, type
  * (scalar or [[ProtoType.PMessage]]), proto2 `required` flag, and
  * `repeated` (decodes to a Spark ARRAY in payload order). */
final case class ProtoField(number: Int, name: String, tpe: ProtoType,
    required: Boolean = false, repeated: Boolean = false) {
  require(!(required && repeated), s"$name: proto2 forbids required repeated")
  require(!(repeated && tpe.isInstanceOf[ProtoType.PMap]),
    s"$name: a map field is implicitly repeated on the wire; declare it plain")
  require(!(required && tpe.isInstanceOf[ProtoType.PMap]),
    s"$name: proto3 maps cannot be required")
  def dataType: DataType =
    if (repeated) ArrayType(tpe.sparkType, containsNull = false) else tpe.sparkType
}

final class ProtoDecodeException(msg: String) extends RuntimeException(msg)

/** Low-level wire-format reader/writer. Throws [[ProtoDecodeException]]
  * on malformed input — the codec maps that to "undecodable". */
object ProtoWire {

  /** Read one base-128 varint starting at `pos`; returns (value, next
    * position). Malformed when it overruns the buffer or exceeds the
    * 10-byte maximum. */
  def readVarint(b: Array[Byte], pos: Int): (Long, Int) = {
    var v = 0L
    var shift = 0
    var p = pos
    while (shift < 64) {
      if (p >= b.length) throw new ProtoDecodeException(s"truncated varint at $pos")
      val byte = b(p)
      v |= (byte & 0x7fL) << shift
      p += 1
      if ((byte & 0x80) == 0) return (v, p)
      shift += 7
    }
    throw new ProtoDecodeException(s"varint longer than 10 bytes at $pos")
  }

  private def readLittleEndian(b: Array[Byte], pos: Int, n: Int): (Long, Int) = {
    if (pos + n > b.length) throw new ProtoDecodeException(s"truncated fixed$n at $pos")
    var v = 0L
    var i = n - 1
    while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 }
    (v, pos + n)
  }

  private def zigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  /** Read one length-delimited run header; returns (start, end). */
  private def readLenRun(b: Array[Byte], pos: Int): (Int, Int) = {
    val (len, p2) = readVarint(b, pos)
    if (len < 0 || p2 + len > b.length)
      throw new ProtoDecodeException(s"length $len overruns buffer at $p2")
    (p2, p2 + len.toInt)
  }

  /** Read ONE value of `tpe` at `pos` on its native wire type;
    * returns (value, next position). For [[ProtoType.PMessage]] the
    * sub-record decodes recursively to a [[Row]] — a malformed nested
    * payload fails the whole record, like protobuf-java's parser. */
  private def readScalar(tpe: ProtoType, b: Array[Byte], pos: Int): (Any, Int) =
    tpe.wireType match {
      case 0 =>
        val (v, p2) = readVarint(b, pos)
        val value: Any = tpe match {
          case ProtoType.Int32 | ProtoType.UInt32 => v.toInt
          case ProtoType.Int64 | ProtoType.UInt64 => v
          case ProtoType.SInt32 => zigzag(v).toInt
          case ProtoType.SInt64 => zigzag(v)
          case ProtoType.Bool => v != 0L
          case t => throw new ProtoDecodeException(s"bad varint type $t")
        }
        (value, p2)
      case 1 =>
        val (v, p2) = readLittleEndian(b, pos, 8)
        val value: Any = tpe match {
          case ProtoType.PDouble => java.lang.Double.longBitsToDouble(v)
          case _ => v
        }
        (value, p2)
      case 2 =>
        val (start, end) = readLenRun(b, pos)
        val value: Any = tpe match {
          case ProtoType.PString =>
            new String(b, start, end - start, java.nio.charset.StandardCharsets.UTF_8)
          case ProtoType.PMessage(sub) =>
            Row.fromSeq(decode(sub, java.util.Arrays.copyOfRange(b, start, end))
              .toIndexedSeq)
          case _ => java.util.Arrays.copyOfRange(b, start, end)
        }
        (value, end)
      case 5 =>
        val (v, p2) = readLittleEndian(b, pos, 4)
        val value: Any = tpe match {
          case ProtoType.PFloat => java.lang.Float.intBitsToFloat(v.toInt)
          case _ => v.toInt
        }
        (value, p2)
      case w => throw new ProtoDecodeException(s"unsupported wire type $w")
    }

  /** Decode `bytes` against `fields` into column values ordered like
    * the descriptor list (null = absent optional; absent repeated =
    * empty array, protobuf's getList semantics). */
  def decode(fields: Seq[ProtoField], bytes: Array[Byte]): Array[Any] = {
    val byNumber = fields.iterator.zipWithIndex
      .map { case (f, i) => f.number -> ((f, i)) }.toMap
    val out = new Array[Any](fields.length)
    val rep = new Array[scala.collection.mutable.ArrayBuffer[Any]](fields.length)
    val maps = new Array[scala.collection.mutable.LinkedHashMap[Any, Any]](fields.length)
    fields.iterator.zipWithIndex.foreach { case (f, i) =>
      if (f.repeated) rep(i) = scala.collection.mutable.ArrayBuffer.empty[Any]
      f.tpe match {
        case _: ProtoType.PMap =>
          maps(i) = scala.collection.mutable.LinkedHashMap.empty[Any, Any]
        case _ => ()
      }
    }
    val seen = new Array[Boolean](fields.length)
    var p = 0
    while (p < bytes.length) {
      val (tag, p1) = readVarint(bytes, p)
      val fieldNum = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (fieldNum <= 0) throw new ProtoDecodeException(s"invalid field number $fieldNum")
      byNumber.get(fieldNum) match {
        case Some((f, i)) =>
          if (f.repeated && ProtoType.packable(f.tpe) && wire == 2) {
            // packed run: concatenated payloads under one wire-2 tag
            val (start, end) = readLenRun(bytes, p1)
            var q = start
            while (q < end) {
              val (v, q2) = readScalar(f.tpe, bytes, q)
              if (q2 > end)
                throw new ProtoDecodeException(
                  s"packed ${f.name}: element overruns run end $end")
              rep(i) += v
              q = q2
            }
            p = end
          } else {
            if (wire != f.tpe.wireType)
              throw new ProtoDecodeException(
                s"field ${f.name}: wire type $wire, expected ${f.tpe.wireType}")
            // value reads are INLINE (not via readScalar) on purpose:
            // this loop is the per-record ingest hot path, and the
            // (value, pos) tuple readScalar returns per field was
            // measured as a double-digit-percent throughput hit on
            // the pipeline bench
            def store(v: Any): Unit =
              if (f.repeated) rep(i) += v
              else out(i) = v // repeated occurrence of a scalar: last wins
            p = wire match {
              case 0 =>
                val (v, p2) = readVarint(bytes, p1)
                store(f.tpe match {
                  case ProtoType.Int32 | ProtoType.UInt32 => v.toInt
                  case ProtoType.Int64 | ProtoType.UInt64 => v
                  case ProtoType.SInt32 => zigzag(v).toInt
                  case ProtoType.SInt64 => zigzag(v)
                  case ProtoType.Bool => v != 0L
                  case t => throw new ProtoDecodeException(s"bad varint type $t")
                })
                p2
              case 1 =>
                val (v, p2) = readLittleEndian(bytes, p1, 8)
                store(f.tpe match {
                  case ProtoType.PDouble => java.lang.Double.longBitsToDouble(v)
                  case _ => v
                })
                p2
              case 2 =>
                val (start, end) = readLenRun(bytes, p1)
                f.tpe match {
                  case m: ProtoType.PMap =>
                    // one map ENTRY submessage: { K key = 1; V value = 2 }.
                    // Duplicate keys: last wins; absent key/value: proto3
                    // default — protobuf-java's map merge semantics.
                    val entry = decode(m.entryFields,
                      java.util.Arrays.copyOfRange(bytes, start, end))
                    val k = if (entry(0) == null) ProtoType.defaultOf(m.keyType)
                            else entry(0)
                    val v = if (entry(1) == null) ProtoType.defaultOf(m.valueType)
                            else entry(1)
                    maps(i).put(k, v)
                  case ProtoType.PString =>
                    store(new String(bytes, start, end - start,
                      java.nio.charset.StandardCharsets.UTF_8))
                  case ProtoType.PMessage(sub) =>
                    store(Row.fromSeq(decode(sub,
                      java.util.Arrays.copyOfRange(bytes, start, end)).toIndexedSeq))
                  case _ =>
                    store(java.util.Arrays.copyOfRange(bytes, start, end))
                }
                end
              case 5 =>
                val (v, p2) = readLittleEndian(bytes, p1, 4)
                store(f.tpe match {
                  case ProtoType.PFloat => java.lang.Float.intBitsToFloat(v.toInt)
                  case _ => v.toInt
                })
                p2
              case w => throw new ProtoDecodeException(s"unsupported wire type $w")
            }
          }
          seen(i) = true
        case None =>
          // unknown field: skip by wire type (groups 3/4 unsupported)
          p = wire match {
            case 0 => readVarint(bytes, p1)._2
            case 1 => readLittleEndian(bytes, p1, 8)._2
            case 2 => readLenRun(bytes, p1)._2
            case 5 => readLittleEndian(bytes, p1, 4)._2
            case w => throw new ProtoDecodeException(s"unsupported wire type $w")
          }
      }
    }
    fields.iterator.zipWithIndex.foreach { case (f, i) =>
      if (f.required && !seen(i))
        throw new ProtoDecodeException(s"missing required field ${f.name}")
      if (f.repeated) out(i) = rep(i).toSeq
      f.tpe match {
        // absent map = empty map (protobuf getMap semantics, the
        // sibling of absent-repeated = empty array above)
        case _: ProtoType.PMap => out(i) = maps(i).toMap
        case _ => ()
      }
    }
    out
  }

  // ---- encoder (tests + the oracle-gated roundtrip query) ----

  def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeLittleEndian(out: java.io.ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  /** Canonical encoding: fields in descriptor order, nulls omitted,
    * repeated fields written unpacked element-by-element (the decoder
    * accepts packed too), nested messages ([[ProtoType.PMessage]])
    * recursively from a [[Row]] or value Seq. */
  def encode(fields: Seq[ProtoField], values: Seq[Any]): Array[Byte] = {
    require(fields.length == values.length, "one value per field")
    val out = new java.io.ByteArrayOutputStream()
    fields.iterator.zip(values.iterator).foreach { case (f, v) =>
      if (v != null) {
        f.tpe match {
          case m: ProtoType.PMap =>
            // one tagged `entry { key = 1; value = 2 }` submessage per
            // mapping, like protobuf-java's map serializer
            v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, mv) =>
              writeVarint(out, (f.number.toLong << 3) | 2L)
              val inner = encode(m.entryFields, Seq(k, mv))
              writeVarint(out, inner.length.toLong); out.write(inner, 0, inner.length)
            }
          case _ =>
            if (f.repeated) v.asInstanceOf[Seq[Any]].foreach(writeOne(out, f, _))
            else writeOne(out, f, v)
        }
      }
    }
    out.toByteArray
  }

  private def writeOne(out: java.io.ByteArrayOutputStream, f: ProtoField, v: Any): Unit = {
    writeVarint(out, (f.number.toLong << 3) | f.tpe.wireType)
    f.tpe match {
          case ProtoType.Int32 => writeVarint(out, v.asInstanceOf[Int].toLong) // sign-extends like protobuf
          case ProtoType.UInt32 => writeVarint(out, v.asInstanceOf[Int].toLong & 0xffffffffL)
          case ProtoType.Int64 | ProtoType.UInt64 => writeVarint(out, v.asInstanceOf[Long])
          case ProtoType.SInt32 =>
            val x = v.asInstanceOf[Int].toLong; writeVarint(out, (x << 1) ^ (x >> 63))
          case ProtoType.SInt64 =>
            val x = v.asInstanceOf[Long]; writeVarint(out, (x << 1) ^ (x >> 63))
          case ProtoType.Bool => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
          case ProtoType.Fixed64 | ProtoType.SFixed64 =>
            writeLittleEndian(out, v.asInstanceOf[Long], 8)
          case ProtoType.PDouble =>
            writeLittleEndian(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]), 8)
          case ProtoType.PString =>
            val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
          case ProtoType.PBytes =>
            val b = v.asInstanceOf[Array[Byte]]
            writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
          case ProtoType.Fixed32 | ProtoType.SFixed32 =>
            writeLittleEndian(out, v.asInstanceOf[Int].toLong & 0xffffffffL, 4)
          case ProtoType.PFloat =>
            writeLittleEndian(out,
              java.lang.Float.floatToIntBits(v.asInstanceOf[Float]).toLong & 0xffffffffL, 4)
          case ProtoType.PMessage(sub) =>
            val inner = v match {
              case r: Row => encode(sub, r.toSeq)
              case s: Seq[_] => encode(sub, s)
              case other => throw new IllegalArgumentException(
                s"${f.name}: nested message value must be Row or Seq, got ${other.getClass}")
            }
            writeVarint(out, inner.length.toLong); out.write(inner, 0, inner.length)
          case _: ProtoType.PMap =>
            throw new IllegalStateException(
              s"${f.name}: map fields are encoded entry-by-entry in encode()")
    }
  }
}

/** Protobuf [[RecordCodec]] over a field-descriptor list (the generic
  * equivalent of supplying a `Parser<T>` to the reference's builder,
  * KPW:683-687). Decode runs as one deserializer call per record —
  * the same cost shape as `spark-protobuf`'s `from_protobuf`, which
  * this swaps in for verbatim when the jar is available.
  */
final case class ProtoCodec(fields: Seq[ProtoField]) extends RecordCodec {
  require(fields.nonEmpty, "at least one field")
  require(fields.map(_.number).distinct.length == fields.length, "duplicate field numbers")
  require(fields.map(_.name).distinct.length == fields.length, "duplicate field names")

  override val schema: StructType =
    StructType(fields.map(f => StructField(f.name, f.dataType, nullable = true)))

  // null iff undecodable — the RecordCodec contract FailFast/DeadLetter key on
  private val u = functions.udf(new UDF1[Array[Byte], Row] {
    override def call(bytes: Array[Byte]): Row =
      if (bytes == null) null
      else try Row.fromSeq(ProtoWire.decode(fields, bytes).toIndexedSeq)
      catch { case _: ProtoDecodeException => null }
  }, schema)

  override def decode(bytes: Column): Column = u(bytes)
}

/** The reference's test schema (test-message.proto:5-10): descriptor,
  * codec, and a canonical encoder for fixtures and the gate query. */
object SampleMessageProto {
  val fields: Seq[ProtoField] = Seq(
    ProtoField(1, "query", ProtoType.PString, required = true),
    ProtoField(2, "timestamp", ProtoType.Int64, required = true),
    ProtoField(3, "page_number", ProtoType.Int32),
    ProtoField(4, "result_per_page", ProtoType.Int32))

  def codec: ProtoCodec = ProtoCodec(fields)

  def encode(query: String, timestamp: Long, pageNumber: Integer,
      resultPerPage: Integer): Array[Byte] =
    ProtoWire.encode(fields, Seq(query, timestamp, pageNumber, resultPerPage))
}
