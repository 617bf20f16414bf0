package graft.sources

import java.nio.file.{Files, Paths}

import scala.collection.JavaConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AuditSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpManifest(): String =
    Files.createTempDirectory("audit").resolve("manifest.json").toString

  test("manifest counts every row exactly once across tasks") {
    val p = tmpManifest()
    val df = spark.range(0, 10000).select($"id", ($"id" % 7).as("k"))
      .repartition(16)
    df.write.format("graft_audit").option("path", p).mode("append").save()
    val m = AuditSink.readManifest(p)
    assert(m("rows") === 10000L)
    assert(m("tasks") === 16L)
  }

  test("checksum is partition- and order-independent (multiset property)") {
    val data = (0 until 5000).map(i => (i.toLong, s"v${i % 13}", i * 0.5))
    val df = spark.createDataset(data).toDF("id", "s", "d")
    val p1 = tmpManifest(); val p2 = tmpManifest(); val p3 = tmpManifest()
    df.repartition(4).write.format("graft_audit").option("path", p1).mode("append").save()
    df.repartition(32).orderBy($"s").write.format("graft_audit").option("path", p2).mode("append").save()
    df.union(df.limit(1)).write.format("graft_audit").option("path", p3).mode("append").save()
    val (m1, m2, m3) = (AuditSink.readManifest(p1), AuditSink.readManifest(p2), AuditSink.readManifest(p3))
    assert(m1("xor") === m2("xor"))
    assert(m1("sum") === m2("sum"))
    assert(m1("rows") === m2("rows"))
    // a duplicated row must change the audit (xor alone would cancel
    // on pairs — sum and rows both catch it)
    assert(m3("rows") !== m1("rows"))
    assert(m3("sum") !== m1("sum"))
  }

  test("failed job publishes no manifest (atomic-rename commit)") {
    val p = tmpManifest()
    val boom = udf((i: Long) => {
      if (i == 666L) throw new RuntimeException("boom")
      i
    })
    val df = spark.range(0, 1000).select(boom($"id").as("id")).repartition(4)
    intercept[Exception] {
      df.write.format("graft_audit").option("path", p).mode("append").save()
    }
    assert(!Files.exists(Paths.get(p)), "manifest must not appear for a failed job")
    // tmp names are token-suffixed now — assert no *.tmp residue at all
    val residue = Files.list(Paths.get(p).getParent).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".tmp")).toSeq
    assert(residue.isEmpty, s"no temp residue after abort: $residue")
  }

  test("streaming epoch audits compose to the batch audit of the same relation") {
    val dir = Files.createTempDirectory("audit_stream")
    val streamManifest = dir.resolve("stream.json").toString
    val batchManifest = dir.resolve("batch.json").toString
    val cp = dir.resolve("cp").toString
    val n = 20000L
    val q = spark.readStream.format("graft_synth")
      .option("numRows", n).option("slices", 4)
      .option("rowsPerBatch", 4000).load()
      .writeStream.format("graft_audit")
      .option("path", streamManifest)
      .option("checkpointLocation", cp)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.read.format("graft_synth")
      .option("numRows", n).option("slices", 4).load()
      .write.format("graft_audit").option("path", batchManifest)
      .mode("append").save()
    val epochs = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("stream.json.epoch-"))
      .map(p => AuditSink.readManifest(p.toString)).toSeq
    assert(epochs.nonEmpty)
    val batch = AuditSink.readManifest(batchManifest)
    assert(epochs.map(_("rows")).sum === batch("rows"))
    assert(epochs.map(_("xor")).reduce(_ ^ _) === batch("xor"))
    assert(epochs.map(_("sum")).sum === batch("sum"))
    // several epochs actually participated (not one giant batch)
    assert(epochs.count(_("rows") > 0) >= 4)
  }

  test("audit detects single-column corruption between two writes") {
    val p1 = tmpManifest(); val p2 = tmpManifest()
    val df = spark.range(0, 2000).select($"id", lit("x").as("s"))
    df.write.format("graft_audit").option("path", p1).mode("append").save()
    df.withColumn("s", when($"id" === 1234L, "y").otherwise($"s"))
      .write.format("graft_audit").option("path", p2).mode("append").save()
    val (m1, m2) = (AuditSink.readManifest(p1), AuditSink.readManifest(p2))
    assert(m1("rows") === m2("rows"))
    assert(m1("xor") !== m2("xor"), "corrupted column must change the checksum")
  }

  test("tmp files are per-job: cleanup never touches another job's tmp") {
    val dir = Files.createTempDirectory("graft_audit_tok")
    val target = dir.resolve("m.json")
    // job B is still in flight (fresh tmp)
    val tmpB = dir.resolve(".m.json.jobB.tmp")
    Files.write(tmpB, "b-inflight".getBytes)
    AuditSink.publishAtomic(target, "jobA", "{\"rows\": 1}")
    AuditSink.cleanupTmp(target, "jobA") // A's abort path
    assert(Files.exists(tmpB), "abort must only delete its own token's tmp")
    assert(AuditSink.readManifest(target.toString)("rows") === 1L)
    AuditSink.cleanupTmp(target, "jobB")
    assert(!Files.exists(tmpB))
  }

  test("publish sweeps stale crash orphans but never fresh in-flight tmps") {
    val dir = Files.createTempDirectory("graft_audit_sweep")
    val target = dir.resolve("m.json")
    // a job that died long ago left its tmp behind
    val stale = dir.resolve(".m.json.deadjob.tmp")
    Files.write(stale, "orphan".getBytes)
    Files.setLastModifiedTime(stale, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - AuditSink.StaleTmpMillis - 60000))
    // a concurrent job is mid-publish right now
    val fresh = dir.resolve(".m.json.livejob.tmp")
    Files.write(fresh, "in-flight".getBytes)
    // unrelated file with a near-miss name must survive too
    val other = dir.resolve("m.json.bak")
    Files.write(other, "keep".getBytes)
    AuditSink.publishAtomic(target, "jobA", "{\"rows\": 2}")
    assert(!Files.exists(stale), "stale orphan must be swept on publish")
    assert(Files.exists(fresh), "fresh in-flight tmp must survive the sweep")
    assert(Files.exists(other))
    assert(AuditSink.readManifest(target.toString)("rows") === 2L)
  }
}
