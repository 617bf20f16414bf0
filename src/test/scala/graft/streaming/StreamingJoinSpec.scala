package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming join surface (SURVEY §2.2 joins row): stream–static and
  * watermarked stream–stream joins, plus file-format source coverage
  * (json/csv batch read-back of pipeline-shaped data).
  */
class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def events(n: Int): Seq[Ev] = {
    import spark.implicits._
    graft.Tables(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq.sortBy(_.ts.getTime).take(n)
  }

  test("stream-static join enriches events with the customer dimension") {
    import spark.implicits._
    val evs = events(500)
    val stream = MemoryStream[Ev](20, spark, None)
    val dim = graft.Tables(spark, TestSpark.sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = stream.toDF()
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join").start()
    try { stream.addData(evs); q.processAllAvailable() } finally q.stop()

    val streamed = spark.table("ss_join").count()
    val batch = graft.Tables(spark, TestSpark.sf, "events")
      .limit(0) // recompute from the same 500 events
    val expected = {
      val keys = dim.select("c_custkey").collect().map(_.getLong(0)).toSet
      evs.count(e => keys.contains(e.user_id))
    }
    assert(streamed == expected)
    assert(expected > 0)
  }

  test("watermarked stream-stream self-join pairs purchases with clicks") {
    import spark.implicits._
    val evs = events(2000)
    val clicks = MemoryStream[Ev](21, spark, None)
    val buys = MemoryStream[Ev](22, spark, None)
    val l = clicks.toDF().filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val r = buys.toDF().filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    val joined = l.join(r,
      col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL '30' MINUTE"))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss2_join").start()
    try {
      clicks.addData(evs)
      buys.addData(evs)
      q.processAllAvailable()
    } finally q.stop()

    // batch equivalent over the same rows
    val df = spark.createDataset(evs).toDF()
    val bl = df.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val br = df.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val expected = bl.join(br,
      col("cu") === col("pu") &&
        col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL '30' MINUTE"))
      .count()
    assert(spark.table("ss2_join").count() == expected)
    assert(expected > 0, "fixture should produce click->purchase pairs")
  }

  test("stream-stream join survives a mid-stream crash: restart from checkpoint, exact pairs") {
    // the reference documents at-least-once delivery across writer
    // restarts (KPW:43-44); the engine's equivalent for its stateful
    // streaming surface is exactly-once into the file sink. Kill the
    // q80-shaped interval join after PART of the data, restart from
    // the checkpoint, and the final pair set must still be exactly the
    // batch answer — which requires both offset AND join-state
    // (RocksDB) restoration: cross-boundary pairs match a pre-crash
    // click with a post-crash purchase.
    import spark.implicits._
    val evs = events(3000)
    // Batch answer first: it also DERIVES the crash point. A fixed cut
    // fraction cannot guarantee a pair straddles the crash (at this
    // fixture's density no fraction does); instead cut just before the
    // purchase of the widest click→purchase interval, so at least one
    // pair matches a pre-crash click with a post-crash purchase.
    val df = spark.createDataset(evs).toDF()
    val want = df.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .join(df.filter(col("event_type") === "purchase")
          .select(col("user_id").as("pu"), col("ts").as("pts")),
        col("cu") === col("pu") &&
          col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL '1' HOUR"))
      .select(col("cu"), col("cts"), col("pts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .sorted.toSeq
    assert(want.nonEmpty, "fixture must produce pairs")
    val widest = want.maxBy { case (_, cts, pts) => pts.getTime - cts.getTime }
    // boundary = last event strictly before the widest pair's purchase:
    // its ts is >= the pair's click ts (the click itself qualifies), so
    // the pair straddles [boundary, boundary+ε]
    val cut = evs.count(_.ts.getTime < widest._3.getTime)
    val out = java.nio.file.Files.createTempDirectory("graft-ssj-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ssj-ckpt").toString
    val clicks = MemoryStream[Ev](23, spark, None)
    val buys = MemoryStream[Ev](24, spark, None)

    def joined = {
      val l = clicks.toDF().filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
        .withWatermark("cts", "2 hours")
      val r = buys.toDF().filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"))
        .withWatermark("pts", "2 hours")
      l.join(r,
        col("cu") === col("pu") &&
          col("pts") >= col("cts") && col("pts") <= col("cts") + expr("INTERVAL '1' HOUR"))
        .select(col("cu").as("user_id"), col("cts"), col("pts"))
    }
    def run(): Unit = {
      val q = joined.writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }

    // MemoryStream has no event-time column mapping for Ev's ts name;
    // rename once up front so both runs build the identical plan
    def feed(slice: Seq[Ev]): Unit = { clicks.addData(slice); buys.addData(slice) }

    feed(evs.take(cut)); run() // "crash": query stopped mid-stream
    feed(evs.drop(cut)); run() // restart from the same checkpoint

    val got = spark.read.parquet(out)
      .select(col("user_id"), col("cts"), col("pts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      .sorted.toSeq
    // cross-boundary pairs prove join STATE was restored, not just offsets
    val boundaryTs = evs(cut - 1).ts
    val crossing = want.count { case (_, cts, pts) =>
      cts.getTime <= boundaryTs.getTime && pts.getTime > boundaryTs.getTime
    }
    assert(crossing > 0, "fixture must produce pairs that straddle the crash point")
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
  }

  test("json and csv file sources roundtrip pipeline-shaped data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-src").toString
    val ev = graft.Tables(spark, TestSpark.sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.write.mode("overwrite").json(s"$dir/json")
    ev.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    val fromJson = spark.read.json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv")
    assert(fromJson.count() == ev.count())
    assert(fromCsv.count() == ev.count())
    val sumJson = fromJson.selectExpr("sum(value)").collect().head.getDouble(0)
    val sumCsv = fromCsv.selectExpr("sum(value)").collect().head.getDouble(0)
    assert(math.abs(sumJson - sumCsv) <= 0.01)
  }

  test("q103 streamed left-outer interval join equals the batch left join") {
    val streamed = graft.operators.StreamingParity
      .queries("q103_stream_left_outer_join")(spark, TestSpark.sf)
    val ev = graft.Tables(spark, TestSpark.sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val batch = p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("c_ts")).as("n_matched"),
        (count(lit(1)) - count(col("c_ts"))).as("n_no_click"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // the outer (null-extended) path is genuinely exercised: some
    // purchases have no click in the preceding hour
    assert(streamed.agg(sum(col("n_no_click"))).collect().head.getLong(0) > 0)
  }

  test("outer-join state survives a crash: pending unmatched rows null-emit after restart") {
    // q103/q113's distinct recovery path vs the inner-join crash test:
    // an unmatched left row is HELD in state until the watermark
    // proves no match can arrive — so a crash before that proof must
    // restore the pending row and still emit its null-extended result
    // exactly once. Kill the query mid-stream, restart from the
    // checkpoint, then advance the watermark with sentinels; the final
    // output must equal the batch LEFT JOIN bit-for-bit.
    import spark.implicits._
    val evs = events(2000)
    val df = spark.createDataset(evs).toDF()
    val bp = df.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("ts").as("pts"))
    val bc = df.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val want = bp.join(bc,
      col("pu") === col("cu") &&
        col("cts") >= col("pts") - expr("INTERVAL '1' HOUR") &&
        col("cts") <= col("pts"), "left_outer")
      .select(col("pu"), col("pts"), col("cts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), Option(r.getTimestamp(2))))
      .sortBy(t => (t._1, t._2.getTime, t._3.map(_.getTime).getOrElse(0L)))
      .toSeq
    // cut after the widest matched pair's click so a matched pair
    // straddles the crash (right-side state), and late enough that
    // some earlier unmatched purchase is still pending (left-side
    // state: watermark at crash = max_seen - 2h, so any unmatched
    // purchase within 2h below it is provably still held)
    val widest = want.collect { case (u, pts, Some(cts)) => (u, pts, cts) }
      .maxBy { case (_, pts, cts) => pts.getTime - cts.getTime }
    val cut = evs.count(_.ts.getTime < widest._2.getTime)
    assert(cut > 0 && cut < evs.size)

    val out = java.nio.file.Files.createTempDirectory("graft-loj-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-loj-ckpt").toString
    val purchases = MemoryStream[Ev](26, spark, None)
    val clicks = MemoryStream[Ev](27, spark, None)
    def joined = {
      val l = purchases.toDF().filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"))
        .withWatermark("pts", "2 hours")
      val r = clicks.toDF().filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"))
        .withWatermark("cts", "2 hours")
      l.join(r,
        col("pu") === col("cu") &&
          col("cts") >= col("pts") - expr("INTERVAL '1' HOUR") &&
          col("cts") <= col("pts"), "left_outer")
        .select(col("pu").as("user_id"), col("pts"), col("cts"))
    }
    def run(): Unit = {
      val q = joined.writeStream.outputMode(OutputMode.Append())
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    def feed(slice: Seq[Ev]): Unit = { purchases.addData(slice); clicks.addData(slice) }
    def sentinel(days: Int): Seq[Ev] = {
      val ts = new java.sql.Timestamp(
        evs.map(_.ts.getTime).max + days * 24L * 3600 * 1000)
      Seq(Ev(-1L, ts, -1L, "purchase", 0.0), Ev(-2L, ts, -1L, "click", 0.0))
    }
    feed(evs.take(cut)); run() // crash mid-stream: unmatched rows pending
    feed(evs.drop(cut)); run() // restart: state restored, rest of data
    feed(sentinel(1)); run()   // advance watermark past all data
    feed(sentinel(2)); run()   // drain evictions under the new watermark

    val got = spark.read.parquet(out).filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("pts"),
        Option(r.getAs[java.sql.Timestamp]("cts"))))
      .sortBy(t => (t._1, t._2.getTime, t._3.map(_.getTime).getOrElse(0L)))
      .toSeq
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
    // the recovery paths were genuinely exercised
    val boundary = evs(cut - 1).ts.getTime
    assert(want.exists { case (_, pts, c) =>
      c.isEmpty && pts.getTime <= boundary }, "a pre-crash unmatched purchase")
    assert(want.exists { case (_, pts, c) =>
      c.exists(_.getTime <= boundary) && pts.getTime > boundary },
      "a matched pair straddling the crash")
  }

  test("q113 streamed full-outer join exercises null emission on BOTH sides") {
    val streamed = graft.operators.StreamingParity
      .queries("q113_stream_full_outer_join")(spark, TestSpark.sf)
    val agg = streamed.agg(
      sum(col("n_matched")).as("m"),
      sum(col("n_lonely_purchases")).as("lp"),
      sum(col("n_lonely_clicks")).as("lc")).collect().head
    assert(agg.getAs[Long]("m") > 0)
    assert(agg.getAs[Long]("lp") > 0, "purchase-side eviction must emit")
    assert(agg.getAs[Long]("lc") > 0, "click-side eviction must emit")
    // row accounting: total rows = matched + both lonely sides
    val rows = streamed.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("n_matched") +
        r.getAs[Long]("n_lonely_purchases") + r.getAs[Long]("n_lonely_clicks"))
    }
  }
}
