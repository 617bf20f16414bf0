package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SyntheticEventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def read(n: Long, slices: Int = 8) =
    spark.read.format("graft_synth")
      .option("numRows", n).option("slices", slices).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("batch read matches the plain-Scala generator row for row") {
    val rows = read(1000, slices = 4).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    assert(rows.length === 1000)
    val expected = (0L until 1000L).map(i =>
      (i, SyntheticEvents.tsMs(i), SyntheticEvents.userId(i),
        SyntheticEvents.eventType(i), SyntheticEvents.valueMicro(i)))
    assert(rows.sortBy(_._1).toSeq === expected)
  }

  test("id-range pushdown narrows the generated range, results stay exact") {
    // The ScanBuilder absorbs the conjunctive range into [20000,30000)
    // BEFORE split planning (narrow-then-split: the selected range gets
    // the full slice parallelism, rather than static splits with 7 of
    // 8 pruned away). The description carries the narrowed range and
    // the absorbed filters as plan-shape evidence.
    val df = read(80000).filter($"id" >= 20000L && $"id" < 30000L)
    val scan = scanOf(df)
    assert(scan.inputRDD.getNumPartitions === 8)
    assert(scan.scan.description().contains("range=[20000,30000)"))
    assert(scan.scan.description().contains("GreaterThanOrEqual"))
    assert(df.count() === 10000L)
    // boundary exactness: min/max survive the >=/< arithmetic
    val mm = df.agg(min($"id"), max($"id")).as[(Long, Long)].head()
    assert(mm === ((20000L, 29999L)))
  }

  test("equality pushdown plans a single one-row split") {
    val df = read(80000).filter($"id" === 42L)
    assert(scanOf(df).inputRDD.getNumPartitions === 1)
    assert(df.select($"event_type").as[String].collect().toSeq ===
      Seq(SyntheticEvents.eventType(42)))
  }

  test("absorbed bound at Long.MaxValue stays unsatisfiable (no wrap to full scan)") {
    assert(read(10000).filter($"id" > Long.MaxValue).count() === 0L)
    assert(read(10000).filter($"id" === Long.MaxValue).count() === 0L)
    assert(read(10000).filter($"id" <= Long.MaxValue).count() === 10000L)
  }

  test("Trigger.Once drains the whole source in one batch (ReadAllAvailable honored)") {
    val dir = java.nio.file.Files.createTempDirectory("synth_once").toFile
    val out = new java.io.File(dir, "out").getAbsolutePath
    val q = spark.readStream.format("graft_synth")
      .option("numRows", 9000).option("slices", 4)
      .option("rowsPerBatch", 2000).load()
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", new java.io.File(dir, "cp").getAbsolutePath)
      .option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(out).count() === 9000L,
      "a one-shot trigger must read past rowsPerBatch to everything available")
  }

  test("non-id predicates stay residual and still filter correctly") {
    val df = read(10000).filter($"event_type" === "click")
    val expected = (0L until 10000L).count(SyntheticEvents.eventType(_) == "click")
    assert(df.count() === expected.toLong)
  }

  test("column pruning reaches the reader") {
    val df = read(1000).select($"event_type", $"user_id")
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSet === Set("event_type", "user_id"))
    assert(df.distinct().count() > 0)
  }

  test("micro-batch replay tiles the range exactly once") {
    val n = 20000L
    val stream = spark.readStream.format("graft_synth")
      .option("numRows", n).option("slices", 4)
      .option("rowsPerBatch", 3000).load()
    val q = stream.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value_micro").as("tot"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("synth_spec_replay").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("synth_spec_replay")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val exp = (0L until n).map(i => (SyntheticEvents.eventType(i), SyntheticEvents.valueMicro(i)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.size.toLong, vs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    assert(got === exp)
    spark.catalog.dropTempView("synth_spec_replay")
  }

  test("restart from checkpoint resumes at the committed offset (exactly-once)") {
    val n = 12000L
    val dir = java.nio.file.Files.createTempDirectory("synth_restart").toFile
    val cp = new java.io.File(dir, "cp").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath
    def start() = spark.readStream.format("graft_synth")
      .option("numRows", n).option("slices", 4)
      .option("rowsPerBatch", 2000).load()
      .writeStream.outputMode("append").format("parquet")
      .option("checkpointLocation", cp).option("path", out).start()
    // first run: stop after the first committed batch. The stop is a
    // RACE against remaining batches draining — on a fast host the
    // whole stream can complete before the stop lands, which proves
    // nothing about resumption, so that case CANCELS (assume) rather
    // than fails; the no-loss/no-dup assertion below holds either way.
    val q1 = start()
    try {
      var waited = 0
      while (q1.recentProgress.length < 1 && waited < 300) {
        Thread.sleep(100); waited += 1
      }
    } finally q1.stop()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0, "first run committed nothing in 30 s")
    assume(afterFirst < n,
      s"host drained all $n rows before stop — restart path not exercised")
    // second run: drain to completion from the WAL
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val ids = spark.read.parquet(out).select($"id").as[Long].collect().sorted.toSeq
    assert(ids === (0L until n).toSeq) // no loss, no duplicates
  }

  test("numRows beyond the userId overflow bound is rejected up front") {
    // userId = id * 2654435761 overflows signed 64-bit past this bound;
    // DuckDB promotes to HUGEINT, so the source refuses rather than
    // silently diverging from its documented oracle-reproducible contract
    val bound = Long.MaxValue / 2654435761L
    val e = intercept[Exception] {
      spark.read.format("graft_synth")
        .option("numRows", (bound + 1).toString).load().count()
    }
    assert(e.getMessage.contains("signed 64-bit"), e.getMessage)
    // the bound itself is accepted (construction succeeds; no scan run)
    spark.read.format("graft_synth")
      .option("numRows", bound.toString).load().schema
  }
}
