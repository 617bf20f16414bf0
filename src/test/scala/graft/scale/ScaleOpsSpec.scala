package graft.scale

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed tables join with zero shuffles") {
    val orders = graft.Tables(spark, sf, "orders")
    val lineitem = graft.Tables(spark, sf, "lineitem")
    ScaleOps.writeBucketed(
      orders.select(col("o_orderkey"), col("o_totalprice")), "b_orders", "o_orderkey", 8)
    ScaleOps.writeBucketed(
      lineitem.select(col("l_orderkey"), col("l_quantity")), "b_lineitem", "l_orderkey", 8)

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
    val shuffles = ScaleOps.countShuffles(joined)
    assert(shuffles == 0, s"bucketed join should not shuffle, got $shuffles:\n" +
      joined.queryExecution.executedPlan.toString.take(2000))

    // same join unbucketed shuffles (unless one side broadcasts —
    // force sort-merge by disabling the broadcast threshold)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plain = lineitem.select(col("l_orderkey"), col("l_quantity"))
        .join(orders.select(col("o_orderkey"), col("o_totalprice")),
          col("l_orderkey") === col("o_orderkey"))
      assert(ScaleOps.countShuffles(plain) > 0)
      // bucketed join result is identical to plain join
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed aggregation on the bucket key needs no shuffle") {
    val agg = spark.table("b_lineitem")
      .groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
    assert(ScaleOps.countShuffles(agg) == 0)
  }

  test("saltedJoin equals the plain join exactly") {
    val ev = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = graft.Tables(spark, sf, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(dim, Seq("user_id"))
    val salted = ScaleOps.saltedJoin(ev, dim, "user_id", 7)
    assert(salted.count() == plain.count())
    assert(salted.select("event_id", "c_mktsegment")
      .exceptAll(plain.select("event_id", "c_mktsegment")).count() == 0)
  }

  test("saltedDistinctCount equals plain distinct count") {
    val ev = graft.Tables(spark, sf, "events")
    val plain = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_distinct"))
    val salted = ScaleOps.saltedDistinctCount(ev, "event_type", "user_id", 7)
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("compactParquet merges small files, preserves rows, and never shuffles") {
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"
    // 64 tiny files — the shape a streaming sink leaves behind
    spark.range(0, 64000).withColumn("v", col("id") * 2)
      .repartition(64).write.parquet(inDir)
    val inFiles = new java.io.File(inDir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles == 64)
    val df = spark.read.parquet(inDir)
    ScaleOps.compactParquet(spark, inDir, outDir, targetFileBytes = 1L << 20)
    val outFiles = new java.io.File(outDir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles < inFiles, s"expected fewer files, got $outFiles")
    val out = spark.read.parquet(outDir)
    assert(out.count() == 64000)
    assert(out.agg(sum("v")).head.getLong(0) == df.agg(sum("v")).head.getLong(0))
    // coalesce-only plan: compaction must not pay an exchange
    val compacted = spark.read.parquet(inDir).coalesce(2)
    assert(ScaleOps.countShuffles(compacted) == 0)
  }

  test("runtime bloom-filter join pruning injects might_contain on the big side") {
    // Catalyst's InjectRuntimeFilter builds a bloom filter from the
    // selective (filtered) side of a shuffle join and applies it as a
    // semi-filter on the big side's scan — at 100 TB this prunes
    // most of the probe-side shuffle. Default thresholds target real
    // cluster sizes (10 GiB application side), so lower them to
    // demonstrate the mechanism on test data.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: broadcasts bypass runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables(spark, sf, "lineitem")
      val ord = graft.Tables(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"bloom runtime filter not injected:\n${plan.take(1500)}")
      assert(joined.collect().nonEmpty) // and the plan still executes
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("morton16 interleaves bits exactly (vs a plain-Scala reference)") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (1234L, 4321L), (40000L, 123L), (7L, 65530L))
    val got = samples.toDF("a", "b")
      .select(ScaleOps.morton16(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == samples.map { case (a, b) => ref(a & 0xFFFF, b & 0xFFFF) })
  }

  test("zOrderWrite: predicates on EITHER dimension prune files (1-D sort cannot)") {
    val dims = graft.Tables(spark, sf, "events")
      .select(col("user_id").cast("long").as("ux"),
        floor(col("value")).cast("long").as("vb"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    ScaleOps.zOrderWrite(dims, "ux", "vb", zDir, nFiles = 16)
    // baseline layout: clustered on ONE dimension only
    dims.repartitionByRange(16, col("ux")).write.mode("overwrite").parquet(sDir)
    assert(spark.read.parquet(zDir).count() == dims.count())

    // "files touched" = files containing any matching row — exactly
    // the set a min/max-stats reader must open for this predicate
    def touched(dir: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(dir).filter(pred)
        .select(input_file_name()).distinct().count()
    val nFiles = spark.read.parquet(zDir)
      .select(input_file_name()).distinct().count()
    assert(nFiles >= 12, s"expected ~16 files, got $nFiles")

    // narrow slab on the SECOND dimension: the ux-sorted layout must
    // open ~every file; the z layout only the O(√N) crossing the slab
    // the slab spans ~a quarter of vb's rank space, so with a 4×4
    // box grid the curve guarantee is ~2 of 4 row-bands ≈ half the
    // files; the 1-D layout must open ~all of them
    val vbSlab = col("vb").between(10, 30)
    val (zVb, sVb) = (touched(zDir, vbSlab), touched(sDir, vbSlab))
    assert(sVb >= nFiles - 2, s"1-D layout should touch ~all files, got $sVb")
    assert(zVb < sVb - 2 && zVb * 3 <= nFiles * 2,
      s"z-order vb-slab touched $zVb of $sVb ($nFiles files) — no pruning win")

    // slab on the FIRST dimension: z still prunes (worse than the
    // dedicated sort, but bounded — the curve's symmetry guarantee)
    val maxU = dims.agg(max(col("ux"))).head().getLong(0)
    val uxSlab = col("ux").between(maxU / 5, 2 * maxU / 5)
    val zUx = touched(zDir, uxSlab)
    assert(zUx < nFiles, s"z-order ux-slab touched every file ($zUx)")

    // manifest + pruned read on the z layout: equal results, fewer
    // files planned than exist
    ScaleOps.writeManifest(spark, zDir, Seq("ux", "vb"))
    val pruned = ScaleOps.prunedRead(spark, zDir, "vb", 10L, 30L)
    val naive = spark.read.parquet(zDir).filter(vbSlab)
    assert(pruned.count() == naive.count() && naive.count() > 0)
    assert(pruned.inputFiles.length < nFiles,
      s"manifest pruning planned ${pruned.inputFiles.length} of $nFiles files")
    assert(pruned.inputFiles.length.toLong == zVb,
      "manifest pruning must match the true touched-file set for this slab")
    // empty-range pruning keeps the schema and returns nothing
    val none = ScaleOps.prunedRead(spark, zDir, "vb", 100000L, 200000L)
    assert(none.count() == 0 && none.columns.toSeq == naive.columns.toSeq)

    // incremental maintenance: append new files, update scans only
    // them, pruned reads see the appended rows
    import spark.implicits._
    Seq((9999L, 77L), (9998L, 78L)).toDF("ux", "vb")
      .coalesce(1).write.mode("append").parquet(zDir)
    ScaleOps.updateManifest(spark, zDir, Seq("ux", "vb"))
    val man = spark.read.parquet(s"$zDir/_graft_manifest")
    assert(man.count() == spark.read.parquet(zDir).inputFiles.length)
    val hit = ScaleOps.prunedRead(spark, zDir, "ux", 9998L, 9999L)
    assert(hit.count() == 2)
    assert(hit.inputFiles.length == 1, "only the appended file should be planned")
  }
}
