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
}
