package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `format("graft_audit")` — DataSource V2 WRITE path: an audit sink
  * that folds every task's rows into `(count, order-independent
  * checksum)` commit messages and publishes one JSON manifest per
  * job via temp-file + atomic rename.
  *
  * This is the reference's commit protocol re-expressed at the
  * connector layer (the read side's S1 twin, for S7/S10):
  *
  *   - task `DataWriter.commit()` = the worker's finalize — nothing
  *     is visible until the TASK declares success (a speculated or
  *     failed attempt's partial state dies with `abort()`, matching
  *     temp files that never get renamed, `KPW:327-354`);
  *   - driver `BatchWrite.commit(messages)` = ack-after-finalize —
  *     the manifest aggregates ONLY messages from committed tasks
  *     and appears atomically via `Files.move(..., ATOMIC_MOVE)`
  *     (`KPW:362-380`'s rename, readers never see a partial
  *     manifest);
  *   - `BatchWrite.abort()` = the no-ack path: temp artifacts are
  *     cleaned, the target name never appears.
  *
  * The checksum is XOR over per-row hashes (row order and partition
  * assignment can't affect it — the same order-independence argument
  * as q180's export manifest), with the row count and a per-column
  * long-sum folded in, so a lost row, a duplicated row, and a
  * corrupted column are all detected. Used as a cheap end-to-end
  * delivery audit: write the same relation twice (different
  * partitioning), equal manifests ⇔ multiset-equal datasets.
  *
  * 100 TB posture: task state is three longs regardless of row count;
  * the driver folds one tiny message per task. Nothing scales with
  * data volume except the streamed pass itself.
  */
object AuditSink {
  /** Deterministic per-row hash over atomic column values. */
  private[sources] def rowHash(row: InternalRow, schema: StructType): Long = {
    var h = 1125899906842597L // large prime seed
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i).dataType
      val v: Long =
        if (row.isNullAt(i)) 0x9e3779b97f4a7c15L
        else f match {
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i).toLong
          case ShortType => row.getShort(i).toLong
          case ByteType => row.getByte(i).toLong
          case BooleanType => if (row.getBoolean(i)) 1L else 0L
          case DoubleType => java.lang.Double.doubleToLongBits(row.getDouble(i))
          case FloatType => java.lang.Float.floatToIntBits(row.getFloat(i)).toLong
          case StringType => row.getUTF8String(i).hashCode.toLong
          case DateType => row.getInt(i).toLong
          case TimestampType | TimestampNTZType => row.getLong(i)
          case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.hashCode.toLong
          case other =>
            throw new IllegalArgumentException(
              s"graft_audit supports atomic columns only, got ${other.sql}")
        }
      // mix (finalizer from splitmix64) so column position matters
      var x = v + 0x9e3779b97f4a7c15L * (i + 1)
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      h ^= x ^ (x >>> 31)
      i += 1
    }
    h
  }

  def readManifest(path: String): Map[String, Long] = {
    val txt = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    "\"(\\w+)\"\\s*:\\s*(-?\\d+)".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
  }

  /** Shared by the batch and streaming commit paths: fold the task
    * messages and publish JSON via temp-file + ATOMIC_MOVE — one
    * implementation so the commit protocol cannot drift between the
    * two write modes. */
  private[sources] def foldResults(
      messages: Array[WriterCommitMessage]): (Long, Long, Long) = {
    var count = 0L; var xor = 0L; var sum = 0L
    messages.foreach {
      case AuditTaskResult(c, x, s) => count += c; xor ^= x; sum += s
      case null => // a task that produced no commit message (driver
      // retry/speculation edge): contributes nothing, not a MatchError
      case other => throw new IllegalStateException(
        s"graft_audit: unexpected commit message: $other")
    }
    (count, xor, sum)
  }

  // tmp names carry a per-job token: two concurrent jobs auditing to
  // the same manifest path must not clobber or abort-delete each
  // other's in-flight tmp (the final ATOMIC_MOVE stays last-wins).
  // The token scheme loses the old fixed name's self-healing (a
  // later publish overwrote a crash orphan), so each successful
  // publish sweeps STALE sibling tmps instead: a write-to-move window
  // is milliseconds, so anything minutes old is a dead job's residue,
  // never a concurrent job's in-flight file.
  private[sources] val StaleTmpMillis: Long = 10 * 60 * 1000L

  private[sources] def publishAtomic(
      target: java.nio.file.Path, token: String, json: String): Unit = {
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".${target.getFileName}.$token.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    sweepStaleTmps(target)
  }

  private def sweepStaleTmps(target: java.nio.file.Path): Unit = {
    val dir = Option(target.getParent).getOrElse(return)
    val prefix = s".${target.getFileName}."
    val cutoff = System.currentTimeMillis() - StaleTmpMillis
    // The sweep is best-effort hygiene running AFTER the manifest has
    // been atomically published — nothing it can hit may fail commit().
    // That needs two things beyond a bare IOException catch: the
    // Files.list stream must be CLOSED (each sweep otherwise leaks a
    // directory fd for the life of the executor), and the catch must
    // cover NonFatal — concurrent deletes surface as unchecked
    // DirectoryIteratorException/UncheckedIOException from the
    // iterator, not as IOException.
    try {
      val stream = Files.list(dir)
      try {
        val it = stream.iterator()
        while (it.hasNext) {
          val p = it.next()
          val n = p.getFileName.toString
          if (n.startsWith(prefix) && n.endsWith(".tmp") &&
              Files.getLastModifiedTime(p).toMillis < cutoff)
            Files.deleteIfExists(p)
        }
      } finally stream.close()
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  private[sources] def cleanupTmp(
      target: java.nio.file.Path, token: String): Unit =
    Files.deleteIfExists(
      target.resolveSibling(s".${target.getFileName}.$token.tmp"))
}

class AuditSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft_audit"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Nil) // write-only: schema comes from the query
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] class AuditTable(writeSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_audit(${options.get("path")})"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = info.options.get("path")
    require(path != null && path.nonEmpty, "graft_audit requires a path option")
    new AuditWriteBuilder(info.schema(), path)
  }
}

private[sources] class AuditWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  // truncate (SaveMode.Overwrite) and append produce the same manifest:
  // the sink's only artifact is the audit summary of THIS job's rows
  override def truncate(): WriteBuilder = this
  override def build(): Write = new Write {
    override def description(): String = s"graft_audit manifest=$path"
    override def toBatch: BatchWrite = new AuditBatchWrite(schema, path)
    override def toStreaming: StreamingWrite = new AuditStreamingWrite(schema, path)
  }
}

private[sources] case class AuditTaskResult(count: Long, xor: Long, sum: Long)
    extends WriterCommitMessage

private[sources] class AuditBatchWrite(schema: StructType, path: String) extends BatchWrite {
  // captured at write construction: abort() may only delete THIS
  // job's tmp, never a concurrent job's in-flight one
  private val jobToken = java.util.UUID.randomUUID().toString

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    AuditWriterFactory(schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (count, xor, sum) = AuditSink.foldResults(messages)
    AuditSink.publishAtomic(Paths.get(path), jobToken,
      s"""{"rows": $count, "xor": $xor, "sum": $sum, "tasks": ${messages.length}}""")
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // the no-ack path: nothing was published, only a stale temp could
    // exist (a crash between write and move) — remove it
    AuditSink.cleanupTmp(Paths.get(path), jobToken)
}

/** Streaming twin: one audit manifest PER EPOCH, each committed with
  * the same temp+ATOMIC_MOVE protocol under `<path>.epoch-<n>.json`.
  * Epoch replay after a restart re-publishes the same content to the
  * same name (REPLACE_EXISTING) — idempotent re-commit, which with a
  * deterministic source makes the per-epoch audit chain exactly-once.
  * The epoch manifests COMPOSE: xor of epoch xors / sum of sums /
  * sum of rows equal the one-shot batch audit of the same relation
  * (spec-asserted) — a streaming delivery audit that needs no state
  * beyond the files themselves. */
private[sources] class AuditStreamingWrite(schema: StructType, path: String)
    extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    AuditStreamingWriterFactory(schema)

  private def epochPath(epochId: Long) = {
    val target = Paths.get(path)
    target.resolveSibling(s"${target.getFileName}.epoch-$epochId.json")
  }

  private val jobToken = java.util.UUID.randomUUID().toString

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (count, xor, sum) = AuditSink.foldResults(messages)
    AuditSink.publishAtomic(epochPath(epochId), jobToken,
      s"""{"epoch": $epochId, "rows": $count, "xor": $xor, "sum": $sum, "tasks": ${messages.length}}""")
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    AuditSink.cleanupTmp(epochPath(epochId), jobToken)
}

private[sources] case class AuditStreamingWriterFactory(schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new AuditWriter(schema)
}

private[sources] case class AuditWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new AuditWriter(schema)
}

private[sources] class AuditWriter(schema: StructType) extends DataWriter[InternalRow] {
  private var count = 0L
  private var xor = 0L
  private var sum = 0L
  override def write(row: InternalRow): Unit = {
    count += 1
    val h = AuditSink.rowHash(row, schema)
    xor ^= h
    sum += h
  }
  override def commit(): WriterCommitMessage = AuditTaskResult(count, xor, sum)
  override def abort(): Unit = () // nothing was externalized
  override def close(): Unit = ()
}
