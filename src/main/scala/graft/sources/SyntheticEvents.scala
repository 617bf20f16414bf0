package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-event DataSource V2 connector — the one
  * Catalyst extension point the engine had not yet exercised natively
  * (alongside custom Expression, Rule, SparkStrategy/SparkPlan, and
  * injected TVFs).
  *
  * Why it exists, in reference terms: the reference's only source is a
  * Kafka topic polled through a consumer seam with offset bookkeeping
  * (`KafkaProtoParquetWriter.java:156-166`, poll loop at `:260`,
  * offset ack at `:348-353`). The production engine wires
  * `format("kafka")` (a config string — SURVEY §7.0), and this class
  * is the same *contract* implemented from scratch on Spark's
  * connector API so the seam itself is exercised end-to-end in-repo:
  *
  *   - a `TableProvider` registered via `DataSourceRegister`
  *     (`format("graft_synth")`),
  *   - batch scans with FILTER PUSHDOWN that becomes partition
  *     PRUNING (an `id`-range predicate shrinks the planned split
  *     set — the DSv2 analogue of parquet row-group skipping), and
  *     COLUMN PRUNING (readers materialize only requested fields),
  *   - an offset-tracked [[MicroBatchStream]] with admission control
  *     (`rowsPerBatch` = the reference's page-size/backpressure knobs,
  *     `KPW:162-165`): offsets are row indices, the checkpoint WAL
  *     replays any [start,end) range deterministically, so
  *     restart-from-checkpoint is exactly-once — the upgrade over the
  *     reference's at-least-once ack-after-finalize.
  *
  * Rows are a pure function of the row index (multiplicative-hash
  * user ids, modular event types/values), so a DuckDB `range()` oracle
  * reproduces the table exactly — the connector's results are gated
  * like any other operator (q183/q184).
  *
  * 100 TB posture: `planInputPartitions` emits `slices` independent
  * index ranges — generation is embarrassingly parallel, no driver
  * state beyond the range arithmetic; the streaming side holds zero
  * state (offsets live in the sink-side checkpoint WAL, matching how
  * a real Kafka source scales).
  */
object SyntheticEvents {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value_micro", LongType, nullable = false)))

  val eventTypes: Array[String] = Array("view", "click", "purchase", "refund", "idle")

  // All generator arithmetic stays within BIGINT for id < 2^32 so the
  // DuckDB oracle can reproduce it verbatim (no HUGEINT promotion
  // surprises: max id * 2654435761 < 2^63 for the gate sizes).
  def tsMs(id: Long): Long = 1700000000000L + id * 1000L
  def userId(id: Long): Long = (id * 2654435761L) % 1000L
  def eventType(id: Long): String = eventTypes(((id * 7 + 3) % 5).toInt)
  def valueMicro(id: Long): Long = (id * 48271L + 11L) % 1000000L

  /** The oracle-side CTE body: DuckDB SQL computing the same rows from
    * `range(lo, hi)`. Kept next to the Scala formulas so the two can
    * only drift visibly. */
  def oracleCte(lo: Long, hi: Long): String =
    s"""SELECT range AS id,
       |       1700000000000 + range * 1000 AS ts_ms,
       |       (range * 2654435761) % 1000 AS user_id,
       |       CASE (range * 7 + 3) % 5 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
       |            WHEN 2 THEN 'purchase' WHEN 3 THEN 'refund' ELSE 'idle' END AS event_type,
       |       (range * 48271 + 11) % 1000000 AS value_micro
       |FROM range($lo, $hi)""".stripMargin

  private[sources] def splitRange(lo: Long, hi: Long, slices: Int): Array[InputPartition] = {
    if (hi <= lo) return Array.empty
    val n = math.min(slices.toLong, hi - lo).toInt
    val step = (hi - lo) / n
    val extra = (hi - lo) % n
    var start = lo
    (0 until n).map { i =>
      val len = step + (if (i < extra) 1 else 0)
      val p = SynthPartition(start, start + len)
      start += len
      p
    }.toArray
  }
}

/** Entry point class for `format("graft_synth")` / FQCN loading. */
class SyntheticEvents extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft_synth"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEvents.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthTable(new CaseInsensitiveStringMap(properties))
}

private[sources] class SynthTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val numRows = options.getLong("numRows", 100000L)
  private val slices = options.getInt("slices", 8)
  private val rowsPerBatch = options.getLong("rowsPerBatch", math.max(1L, numRows / 4))
  require(numRows >= 0, s"numRows must be >= 0, got $numRows")
  // userId = id * 2654435761 must not overflow signed 64-bit: DuckDB
  // promotes the same product to HUGEINT, so overflow would silently
  // break the documented oracle-reproducible contract
  require(numRows <= Long.MaxValue / 2654435761L,
    s"numRows must be <= ${Long.MaxValue / 2654435761L} " +
      s"(userId = id * 2654435761 stays in signed 64-bit), got $numRows")
  require(slices > 0, s"slices must be > 0, got $slices")
  require(rowsPerBatch > 0, s"rowsPerBatch must be > 0, got $rowsPerBatch")

  override def name(): String = s"graft_synth($numRows)"
  override def schema(): StructType = SyntheticEvents.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(numRows, slices, rowsPerBatch)
}

/** Pushdown state machine: conjunctive `id` range predicates narrow
  * [lo, hi) and are FULLY absorbed (no residual re-evaluation);
  * everything else stays residual for Spark to evaluate post-scan. */
private[sources] class SynthScanBuilder(numRows: Long, slices: Int, rowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = numRows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SyntheticEvents.schema

  // ids live in [0, numRows) with numRows <= Long.MaxValue, so no id
  // ever equals Long.MaxValue — saturating at MaxValue keeps every
  // absorbed bound correct where a raw v+1 would wrap to MinValue and
  // silently turn an unsatisfiable filter into a full scan
  private def incSat(v: Long): Long =
    if (v == Long.MaxValue) Long.MaxValue else v + 1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case EqualTo("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long) => true
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case LessThan("id", _: java.lang.Long) => true
      case LessThanOrEqual("id", _: java.lang.Long) => true
      case _ => false
    }
    ours.foreach {
      case EqualTo(_, v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, incSat(v))
      case GreaterThan(_, v: java.lang.Long) => lo = math.max(lo, incSat(v))
      case GreaterThanOrEqual(_, v: java.lang.Long) => lo = math.max(lo, v.longValue())
      case LessThan(_, v: java.lang.Long) => hi = math.min(hi, v.longValue())
      case LessThanOrEqual(_, v: java.lang.Long) => hi = math.min(hi, incSat(v))
      case _ => ()
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new SynthScan(lo, math.max(lo, hi), slices, rowsPerBatch, required, accepted)
}

private[sources] class SynthScan(
    lo: Long, hi: Long, slices: Int, rowsPerBatch: Long,
    required: StructType, pushed: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"graft_synth range=[$lo,$hi) pushed=[${pushed.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    SyntheticEvents.splitRange(lo, hi, slices)
  override def createReaderFactory(): PartitionReaderFactory =
    SynthReaderFactory(required.fieldNames)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SynthMicroBatchStream(lo, hi, slices, rowsPerBatch, required.fieldNames)
}

private[sources] case class SynthPartition(start: Long, end: Long) extends InputPartition

private[sources] case class SynthReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SynthPartition]
    new SynthReader(p.start, p.end, fields)
  }
}

/** Per-split row generator: materializes ONLY the pruned columns, in
  * the scan's requested order. Column dispatch is resolved ONCE at
  * reader construction into an extractor array — the per-row loop
  * does no string matching and allocates only the row itself. */
private[sources] class SynthReader(start: Long, end: Long, fields: Array[String])
    extends PartitionReader[InternalRow] {
  private var cur = start - 1
  private val extractors: Array[Long => Any] = fields.map {
    case "id" => (i: Long) => i
    case "ts_ms" => SyntheticEvents.tsMs _
    case "user_id" => SyntheticEvents.userId _
    case "event_type" =>
      (i: Long) => UTF8String.fromString(SyntheticEvents.eventType(i))
    case "value_micro" => SyntheticEvents.valueMicro _
    case other => throw new IllegalArgumentException(s"unknown column: $other")
  }
  override def next(): Boolean = { cur += 1; cur < end }
  override def get(): InternalRow = {
    val values = new Array[Any](extractors.length)
    var i = 0
    while (i < extractors.length) { values(i) = extractors(i)(cur); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
  }
  override def close(): Unit = ()
}

private[sources] case class RowOffset(n: Long) extends Offset {
  override def json: String = n.toString
}

/** Offset-tracked replay: offsets are row indices; every [start,end)
  * range replans to the same deterministic splits, so checkpoint
  * recovery re-produces byte-identical batches (exactly-once end to
  * end with a transactional sink). Admission control caps each batch
  * at `rowsPerBatch` rows — the declarative form of the reference's
  * bounded consumer queue (`KPW:162-165`). */
private[sources] class SynthMicroBatchStream(
    lo: Long, hi: Long, slices: Int, rowsPerBatch: Long, fields: Array[String])
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = RowOffset(lo)
  override def deserializeOffset(json: String): Offset = RowOffset(json.toLong)
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(math.min(rowsPerBatch, Int.MaxValue.toLong).toInt)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: engine must call latestOffset(start, limit)")
  // honor the ENGINE's limit, not just our default: Trigger.Once and
  // Trigger.AvailableNow hand the source ReadAllAvailable / composite
  // limits, and silently substituting rowsPerBatch would end a
  // one-shot query after a single partial batch
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RowOffset].n
    def applyOne(l: ReadLimit): Long = l match {
      case _: ReadAllAvailable => hi
      case m: ReadMaxRows => math.min(s + m.maxRows(), hi)
      case c: CompositeReadLimit =>
        c.getReadLimits.map(applyOne).min
      case _ => math.min(s + rowsPerBatch, hi) // min-rows etc.: default cap
    }
    RowOffset(applyOne(limit))
  }
  override def reportLatestOffset(): Offset = RowOffset(hi)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    SyntheticEvents.splitRange(
      start.asInstanceOf[RowOffset].n, end.asInstanceOf[RowOffset].n, slices)
  override def createReaderFactory(): PartitionReaderFactory = SynthReaderFactory(fields)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
