package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Measured scale evidence for the STREAMING state path (r8 verdict
  * #6): [[ScaleEvidence]] covers the batch primitives; this main
  * drives the two heaviest stateful shapes through `graft_synth` at
  * 50–100× the sf0.1 event volume (SCALE_STREAM_ROWS, default 10M =
  * 100×) in SCALE_STREAM_BATCHES micro-batches, capturing per-batch
  * state metrics from StreamingQueryProgress: state rows, state
  * memory, commit latency — the numbers that decide whether the
  * RocksDB default survives unbounded runtime (state must stay
  * watermark-bounded while input grows without limit) and whether
  * commit cost is O(batch) rather than O(total state).
  *
  *   - q219 shape: watermarked stream-stream INNER interval join
  *     chained into a windowed aggregation;
  *   - q103 shape (r9): the LEFT OUTER variant — its extra state
  *     semantics are the interesting part: an unmatched left row must
  *     be RETAINED past its own join window and emitted null-padded
  *     only once the watermark proves no match can arrive, so a bug
  *     here shows up as either lost unmatched rows (early eviction)
  *     or unbounded state (rows never released);
  *   - q113 shape (r10): FULL OUTER — BOTH sides carry the
  *     retain-past-window obligation. Mirroring the gate query, the
  *     join itself streams (append; unmatched rows watermark-gated on
  *     each side) and the per-day aggregation runs batch-side over
  *     the sink, so the oracle compare is restricted to days the
  *     emission horizon has provably finalized.
  *
  * Exactness invariant per shape: every emitted day window must equal
  * the batch oracle computed over the SAME DSv2 source in batch mode
  * (the generator is a pure function of the row index) — for q103
  * including the per-day UNMATCHED count — and the stream must have
  * emitted all but the watermark-tail windows. A state-eviction bug
  * fails the run loudly on values, not vibes.
  *
  * `runMain graft.StreamScaleEvidence` — synthetic event time advances
  * 1 s per row, so the watermark advances naturally batch over batch
  * and join/window state is CONSTANTLY evicted behind it: final state
  * rows measure the steady-state watermark footprint, not the corpus.
  * SCALE_STREAM_SHAPE=q219|q103|q113|q82|q237|all (default all)
  * selects the run (`both` keeps its r9 meaning: q219+q103); q82
  * (r13) is the incremental near-dup shape and q237 (r15) the
  * state-free streaming vector search — see [[runIncrementalNeardup]]
  * and [[runVectorSearch]] docs inside main.
  */
object StreamScaleEvidence {

  final case class BatchStat(query: String, batchId: Long, inputRows: Long,
      durMs: Long, stateRows: Long, stateMemBytes: Long, commitMs: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val n = sys.env.get("SCALE_STREAM_ROWS").map(_.toLong).getOrElse(10000000L)
    val nBatches = sys.env.get("SCALE_STREAM_BATCHES").map(_.toInt).getOrElse(20)
    val shape = sys.env.getOrElse("SCALE_STREAM_SHAPE", "all")
    // GraftSession disables RocksDB's numKeys bookkeeping (a
    // read-before-every-write serving only the metric); an EVIDENCE
    // run is exactly the consumer that metric exists for, so flip it
    // back on here — state-row counts are the watermark-boundedness
    // signal this harness publishes.
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "true")

    val stats = new java.util.concurrent.ConcurrentLinkedQueue[BatchStat]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val ops = p.stateOperators
        // tag with the query NAME: progress events are delivered
        // asynchronously, so without it a late q219 event could bleed
        // past stats.clear() into the q103 shape's table (review r9)
        stats.add(BatchStat(Option(p.name).getOrElse("?"), p.batchId,
          p.numInputRows, Option(p.batchDuration).getOrElse(0L),
          ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum,
          ops.map(_.commitTimeMs).sum))
      }
    })

    // Join key = id mod 997 rather than the generator's user_id
    // (id·2654435761 mod 1000): same-user synthetic ids differ by
    // multiples of 1000, and the event-type cycle is 5 | 1000, so one
    // generator user only ever emits ONE event type — purchase⋈click
    // pairs would be structurally empty. 997 is coprime to 5, so each
    // mod-997 user mixes all five types and the join carries real
    // volume: the nearest same-user click sits exactly 4·997 = 3988 s
    // before each purchase, so the 2-hour interval yields one pair
    // per purchase (17,280 pairs per day window).
    def evOf(df: org.apache.spark.sql.DataFrame) = df
      .select((col("ts_ms") / 1000).cast("timestamp").as("ts"),
        pmod(col("id"), lit(997L)).as("user_id"), col("event_type"))

    /** Build the shape over (purchases, clicks); `outer` = q103.
      * For the outer shape clicks are restricted to user_id < 900, so
      * ~10% of purchases are STRUCTURALLY unmatched — the null-padded
      * watermark-gated emission path carries real volume instead of
      * being vacuously green.
      */
    def chain(p: org.apache.spark.sql.DataFrame, c0: org.apache.spark.sql.DataFrame,
        outer: Boolean) = {
      val c = if (outer) c0.filter(col("c_user") < 900) else c0
      val joined = p.join(c,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 2 HOUR") &&
          col("c_ts") <= col("p_ts"),
        if (outer) "leftOuter" else "inner")
      joined.groupBy(window(col("p_ts"), "1 day"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("c_user").isNull, 1L).otherwise(0L)).as("n_unmatched"))
        .select(col("window.start").as("day"), col("n_rows"), col("n_unmatched"))
    }

    def runShape(name: String, outer: Boolean): Unit = {
      stats.clear()
      val ev = evOf(spark.readStream.format("graft.sources.SyntheticEvents")
          .option("numRows", n.toString)
          .option("rowsPerBatch", math.max(n / nBatches, 1L).toString).load())
        .withWatermark("ts", "3 hours")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      val out = chain(purchases, clicks, outer)

      val t0 = System.nanoTime()
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(s"stream_scale_$name").start()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9

      // ---- exactness: emitted windows vs the batch oracle ----
      val oracle = {
        val bev = evOf(spark.read.format("graft.sources.SyntheticEvents")
          .option("numRows", n.toString).load())
        val p = bev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"))
        val c = bev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        chain(p, c, outer)
          .select(col("day"), col("n_rows").as("o_rows"),
            col("n_unmatched").as("o_unmatched"))
      }
      val emitted = spark.table(s"stream_scale_$name")
      val nEmitted = emitted.count()
      val mismatches = emitted.join(oracle, Seq("day"), "left")
        .filter(col("o_rows").isNull || col("o_rows") =!= col("n_rows") ||
          col("o_unmatched") =!= col("n_unmatched"))
        .count()
      val unmatchedTotal = emitted.agg(sum(col("n_unmatched"))).collect()(0) match {
        case r => if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      val expectedDays = n / 86400L // 1 s per row, 86400 s windows

      // ---- report FIRST (an evidence harness must never die
      // metric-less), then assert ----
      val rows = stats.toArray(Array.empty[BatchStat])
        .filter(b => b.query == s"stream_scale_$name" && b.inputRows > 0)
        .sortBy(_.batchId)
      println(s"\n### shape $name")
      println("| batch | input rows | batch s | state rows | state MB | commit ms |")
      println("|---|---|---|---|---|---|")
      rows.foreach { b =>
        println(f"| ${b.batchId} | ${b.inputRows} | ${b.durMs / 1000.0}%.1f " +
          f"| ${b.stateRows} | ${b.stateMemBytes / 1e6}%.1f | ${b.commitMs} |")
      }
      val maxState = if (rows.nonEmpty) rows.map(_.stateRows).max else 0L
      val lastState = if (rows.nonEmpty) rows.last.stateRows else 0L
      val maxCommit = if (rows.nonEmpty) rows.map(_.commitMs).max else 0L
      println(f"\nSUMMARY[$name] rows=$n batches=${rows.size} wall=$secs%.1f s " +
        f"(${n / secs}%.0f ev/s) emitted=$nEmitted/$expectedDays windows " +
        f"unmatched=$unmatchedTotal " +
        f"maxStateRows=$maxState finalStateRows=$lastState maxCommitMs=$maxCommit")

      require(mismatches == 0,
        s"[$name] $mismatches emitted windows disagree with the batch oracle")
      if (outer) require(unmatchedTotal > 0,
        s"[$name] outer shape emitted no unmatched rows — the null-padded " +
          "path was never exercised, the stress is vacuous")
      // Tail slack: a window only finalizes once the WATERMARK passes its
      // end, and the watermark used by batch k is the max event time
      // through batch k-1 minus the 3 h delay — so the stream's final
      // emission horizon trails the data end by one batch SPAN plus the
      // delay (there is no trailing no-data batch: GraftSession disables
      // noDataMicroBatches for finite runs).
      val batchSpanDays = n.toDouble / math.max(nBatches, 1) / 86400.0
      val minDays = expectedDays - (batchSpanDays + 2).ceil.toLong
      require(nEmitted >= minDays && nEmitted <= expectedDays + 1,
        s"[$name] emitted $nEmitted day windows, expected in [$minDays, " +
          s"${expectedDays + 1}] (eviction stuck or watermark runaway)")
    }

    /** q113 shape: FULL OUTER interval join, both-side null emission.
      * Structural unmatched volume on BOTH sides: clicks restricted to
      * user < 900 (users 900+ ⇒ lonely purchases, as in q103) and
      * purchases to user ≥ 100 (users 0–99 ⇒ lonely clicks). The gate
      * query aggregates on the SINK, so this harness does too: the
      * joined rows stream (matched rows emit when both sides arrive;
      * unmatched rows emit watermark-gated per side), the per-day
      * rollup runs batch-side over the sink table, and the oracle
      * compare covers only days the emission horizon has provably
      * finalized (tail days are legitimately incomplete on their
      * LONELY counts — that is watermark semantics, not a bug).
      */
    def runFullOuter(): Unit = {
      stats.clear()
      def dayAgg(j: org.apache.spark.sql.DataFrame) = j
        .select(coalesce(col("p_ts"), col("c_ts")).as("ts"),
          col("p_ts"), col("c_ts"))
        .groupBy(window(col("ts"), "1 day"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("c_ts").isNull, 1L).otherwise(0L)).as("n_lonely_p"),
          sum(when(col("p_ts").isNull, 1L).otherwise(0L)).as("n_lonely_c"))
        .select(col("window.start").as("day"), col("n_rows"),
          col("n_lonely_p"), col("n_lonely_c"))
      def foj(ev: org.apache.spark.sql.DataFrame) = {
        val p = ev.filter(col("event_type") === "purchase" && col("user_id") >= 100)
          .select(col("user_id"), col("ts").as("p_ts"))
        val c = ev.filter(col("event_type") === "click" && col("user_id") < 900)
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
        p.join(c,
          col("user_id") === col("c_user") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 2 HOUR") &&
            col("c_ts") <= col("p_ts"),
          "full_outer")
          .select(col("p_ts"), col("c_ts"))
      }
      val ev = evOf(spark.readStream.format("graft.sources.SyntheticEvents")
          .option("numRows", n.toString)
          .option("rowsPerBatch", math.max(n / nBatches, 1L).toString).load())
        .withWatermark("ts", "3 hours")
      // sink to DISK, not the memory sink: this shape emits every
      // joined row (~n of them), and a driver-resident sink would make
      // the harness's ceiling its own heap rather than the join state
      // under test (review r10); q219/q103 aggregate in-stream so
      // their ~115-row sinks stay in memory
      val sinkDir = java.nio.file.Files
        .createTempDirectory("graft-streamscale-q113").toString
      val ckptDir = java.nio.file.Files
        .createTempDirectory("graft-streamscale-q113-ckpt").toString
      val t0 = System.nanoTime()
      val q = foj(ev).writeStream.outputMode("append")
        .format("parquet").option("path", sinkDir)
        .option("checkpointLocation", ckptDir)
        .queryName("stream_scale_q113").start()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9

      val emitted = dayAgg(spark.read
        .schema("p_ts timestamp, c_ts timestamp").parquet(sinkDir))
      val oracle = dayAgg(foj(evOf(spark.read
          .format("graft.sources.SyntheticEvents")
          .option("numRows", n.toString).load())))
        .select(col("day"), col("n_rows").as("o_rows"),
          col("n_lonely_p").as("o_lp"), col("n_lonely_c").as("o_lc"))
      val expectedDays = n / 86400L
      val batchSpanDays = n.toDouble / math.max(nBatches, 1) / 86400.0
      // clamped at 0: a smoke run shorter than the tail slack has no
      // provably-finalized day, and the assertions below degrade to
      // vacuous rather than failing a healthy stream (review r10 — the
      // q219/q103 shape's range check already degrades this way)
      val safeDays =
        math.max(0L, expectedDays - (batchSpanDays + 2).ceil.toLong)
      // the generator's epoch is a real date, not 0 — anchor the safe
      // horizon to the data's own first day (from the batch oracle)
      val day0 = oracle.agg(min(col("day").cast("long"))).collect()(0).getLong(0)
      val safe = emitted.filter(col("day").cast("long") < day0 + safeDays * 86400L)
      // inner join: a safe day missing from the oracle is impossible
      // (emitted days ⊆ data days), a safe day missing from EMITTED is
      // caught by the nSafe == safeDays requirement below
      val joined = safe.join(oracle, Seq("day"))
      val mismatches = joined
        .filter(col("o_rows") =!= col("n_rows") ||
          col("o_lp") =!= col("n_lonely_p") || col("o_lc") =!= col("n_lonely_c"))
        .count()
      val nSafe = safe.count()
      val Seq(lp, lc) = {
        val r = safe.agg(coalesce(sum(col("n_lonely_p")), lit(0L)),
          coalesce(sum(col("n_lonely_c")), lit(0L))).collect()(0)
        Seq(r.getLong(0), r.getLong(1))
      }
      val rows = stats.toArray(Array.empty[BatchStat])
        .filter(b => b.query == "stream_scale_q113" && b.inputRows > 0)
        .sortBy(_.batchId)
      println(s"\n### shape q113")
      println("| batch | input rows | batch s | state rows | state MB | commit ms |")
      println("|---|---|---|---|---|---|")
      rows.foreach { b =>
        println(f"| ${b.batchId} | ${b.inputRows} | ${b.durMs / 1000.0}%.1f " +
          f"| ${b.stateRows} | ${b.stateMemBytes / 1e6}%.1f | ${b.commitMs} |")
      }
      val maxState = if (rows.nonEmpty) rows.map(_.stateRows).max else 0L
      val lastState = if (rows.nonEmpty) rows.last.stateRows else 0L
      val maxCommit = if (rows.nonEmpty) rows.map(_.commitMs).max else 0L
      println(f"\nSUMMARY[q113] rows=$n batches=${rows.size} wall=$secs%.1f s " +
        f"(${n / secs}%.0f ev/s) safeDays=$nSafe/$safeDays " +
        f"lonelyPurchases=$lp lonelyClicks=$lc " +
        f"maxStateRows=$maxState finalStateRows=$lastState maxCommitMs=$maxCommit")

      require(nSafe == safeDays,
        s"[q113] $nSafe finalized day windows, expected $safeDays " +
          "(lost days = dropped rows somewhere before the horizon)")
      require(mismatches == 0,
        s"[q113] $mismatches finalized days disagree with the batch oracle")
      if (safeDays > 0)
        require(lp > 0 && lc > 0,
          s"[q113] both-side null emission not exercised: lonelyP=$lp lonelyC=$lc")
      else
        println("[q113] run shorter than the emission tail — assertions vacuous")
    }

    /** q82 shape (NEW r13, closing the r12 verdict's #4): INCREMENTAL
      * near-dup — the stateful operator a training pipeline runs
      * CONTINUOUSLY: documents stream in, are MinHash-banded in-row
      * (the IDENTICAL map-only construction the gate's q82 and the
      * batch q29 share — [[graft.operators.StreamingParity.inRowBands]],
      * scheme v3), and stream-static join against a persisted corpus
      * band index; per matched doc, band hits / distinct near-dups /
      * canonical match, finalized per day window behind the watermark.
      * This is the durable-deployment form of q82's complete-mode agg:
      * state is (open window × MATCHED doc), evicted as the watermark
      * passes — the only bounded posture on an unbounded ingest stream.
      *
      * Text derives deterministically from the event id: every 10th
      * incoming doc reuses corpus doc pmod(id/10, 50k)'s text VERBATIM
      * (an exact dup ⇒ collides in all 4 bands by construction); the
      * rest embed their id in every word (salted-unique, zero corpus
      * shingle overlap). So the finalized horizon carries EXACT
      * match-set invariants: emitted docs are precisely the planted
      * ids, each with n_band_hits=4, n_near_dups=1, min_match = its
      * planted source — plus full row parity against the batch twin of
      * the same chain (the other shapes' oracle pattern), and the
      * plateau/commit evidence this harness publishes.
      */
    def runIncrementalNeardup(): Unit = {
      stats.clear()
      val corpusDocs = 50000L
      val plantEvery = 10L
      // corpus text: 8 pseudo-words from xxhash64(doc, k) — pairwise
      // doc-distinct w.h.p.; fresh text embeds the id in every word so
      // non-planted docs share no shingle with any corpus doc
      def corpusTextSql(idExpr: String): String =
        s"concat_ws(' ', transform(sequence(0, 7), " +
          s"k -> concat('c', pmod(xxhash64($idExpr, k), 50000))))"
      def docsOf(df: org.apache.spark.sql.DataFrame) = df.select(
        col("id").as("doc_id"),
        expr(s"CASE WHEN id % $plantEvery = 0 THEN " +
          corpusTextSql(s"pmod(id div $plantEvery, $corpusDocs)") +
          s" ELSE concat_ws(' ', transform(sequence(0, 7), " +
          "k -> concat('w', id, 'x', k))) END").as("text"))
      // the static side of the stream-static join: built ONCE,
      // persisted — each micro-batch probes the cached 200k-row index
      // (corpusDocs × 4 bands), never recomputing signatures
      val corpus = graft.operators.StreamingParity.inRowBands(
        spark.range(corpusDocs).select(col("id").as("doc_id"),
          expr(corpusTextSql("id")).as("text")))
        .select(col("doc_id").as("corpus_doc"), col("band"), col("bh"))
        .repartition(32).persist()
      corpus.count()
      // event time is a pure function of doc_id (generator: ts_ms =
      // 1.7e12 + id·1000, one doc per second), reconstructed after the
      // banding map so the band stage stays the same Column chain the
      // gate runs
      def withTs(banded: org.apache.spark.sql.DataFrame) = banded
        .withColumn("ts",
          expr("cast((1700000000000 + doc_id * 1000) / 1000.0 as timestamp)"))
      def chain(banded: org.apache.spark.sql.DataFrame) = banded
        .join(corpus, Seq("band", "bh"))
        .groupBy(window(col("ts"), "1 day"), col("doc_id"))
        .agg(count(lit(1)).as("n_band_hits"),
          size(collect_set(col("corpus_doc"))).cast("long").as("n_near_dups"),
          min(col("corpus_doc")).as("min_match"))
        .select(col("window.start").as("day"), col("doc_id"),
          col("n_band_hits"), col("n_near_dups"), col("min_match"))
      val stream = withTs(graft.operators.StreamingParity.inRowBands(docsOf(
        spark.readStream.format("graft.sources.SyntheticEvents")
          .option("numRows", n.toString)
          .option("rowsPerBatch", math.max(n / nBatches, 1L).toString).load()
          .select(col("id")))))
        .withWatermark("ts", "3 hours")
      // parquet sink (q113 pattern): ~n/10 matched-doc rows must not
      // make the harness's ceiling its own driver heap
      val sinkDir = java.nio.file.Files
        .createTempDirectory("graft-streamscale-q82").toString
      val ckptDir = java.nio.file.Files
        .createTempDirectory("graft-streamscale-q82-ckpt").toString
      val t0 = System.nanoTime()
      val q = chain(stream).writeStream.outputMode("append")
        .format("parquet").option("path", sinkDir)
        .option("checkpointLocation", ckptDir)
        .queryName("stream_scale_q82").start()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9

      val emitted = spark.read.schema(
        "day timestamp, doc_id long, n_band_hits long, n_near_dups long, min_match long")
        .parquet(sinkDir)
      val oracle = chain(withTs(graft.operators.StreamingParity.inRowBands(docsOf(
        spark.read.format("graft.sources.SyntheticEvents")
          .option("numRows", n.toString).load().select(col("id"))))))
        .select(col("day"), col("doc_id"), col("n_band_hits").as("o_hits"),
          col("n_near_dups").as("o_dups"), col("min_match").as("o_min"))
      val expectedDays = n / 86400L
      val batchSpanDays = n.toDouble / math.max(nBatches, 1) / 86400.0
      val safeDays =
        math.max(0L, expectedDays - (batchSpanDays + 2).ceil.toLong)
      val day0 = 1700000000L - Math.floorMod(1700000000L, 86400L)
      val safe = emitted.filter(col("day").cast("long") < day0 + safeDays * 86400L)
        .persist()
      val nSafe = safe.count()
      // exact planted accounting: docs 0, 10, 20, … within the safe
      // horizon — ts(doc) = 1.7e9 + doc_id, so the planted population
      // per safe horizon is closed-form
      val horizonEnd = day0 + safeDays * 86400L
      val expectedSafe =
        if (horizonEnd <= 1700000000L) 0L
        else ((math.min(horizonEnd - 1700000000L, n) - 1) / plantEvery) + 1
      val badRows = safe.filter(col("doc_id") % plantEvery =!= 0 ||
        col("n_band_hits") =!= 4L || col("n_near_dups") =!= 1L ||
        col("min_match") =!= pmod(expr(s"doc_id div $plantEvery"), lit(corpusDocs)))
        .count()
      val oracleMismatch = safe.join(oracle, Seq("day", "doc_id"), "left")
        .filter(col("o_hits").isNull || col("o_hits") =!= col("n_band_hits") ||
          col("o_dups") =!= col("n_near_dups") || col("o_min") =!= col("min_match"))
        .count()
      val rows = stats.toArray(Array.empty[BatchStat])
        .filter(b => b.query == "stream_scale_q82" && b.inputRows > 0)
        .sortBy(_.batchId)
      println(s"\n### shape q82")
      println("| batch | input rows | batch s | state rows | state MB | commit ms |")
      println("|---|---|---|---|---|---|")
      rows.foreach { b =>
        println(f"| ${b.batchId} | ${b.inputRows} | ${b.durMs / 1000.0}%.1f " +
          f"| ${b.stateRows} | ${b.stateMemBytes / 1e6}%.1f | ${b.commitMs} |")
      }
      val maxState = if (rows.nonEmpty) rows.map(_.stateRows).max else 0L
      val lastState = if (rows.nonEmpty) rows.last.stateRows else 0L
      val maxCommit = if (rows.nonEmpty) rows.map(_.commitMs).max else 0L
      println(f"\nSUMMARY[q82] rows=$n batches=${rows.size} wall=$secs%.1f s " +
        f"(${n / secs}%.0f ev/s) matchedSafe=$nSafe/$expectedSafe " +
        f"maxStateRows=$maxState finalStateRows=$lastState maxCommitMs=$maxCommit")
      safe.unpersist(blocking = false)

      require(nSafe == expectedSafe,
        s"[q82] $nSafe matched docs in the finalized horizon, expected " +
          s"$expectedSafe (dropped matches or phantom candidates)")
      require(badRows == 0,
        s"[q82] $badRows rows violate the planted match-set invariants")
      require(oracleMismatch == 0,
        s"[q82] $oracleMismatch safe rows disagree with the batch twin")
      corpus.unpersist(blocking = false)
    }

    /** q237 shape (NEW r15, closing the r14 verdict's #1): STREAMING
      * VECTOR SEARCH — n synthetic 64-dim vectors stream through the
      * gate's exact pipeline (`vectorSearchHits` → per-batch
      * `vectorSearchSummary` via `runPerBatchToParquet`'s foreachBatch
      * emission) against a persisted 100k-vector width-16 sign-LSH
      * index. The r14 gate ran this tail as an unwatermarked
      * complete-mode aggregation — unbounded state, O(total-queries)
      * driver re-materialization per batch; the r15 rework made the
      * streaming plan STATE-FREE (each query's probes, hits and
      * summary live inside the one batch that carried it), and this
      * harness measures that posture at 10M streamed vectors:
      *  - state plateau, strongest form: every batch must report
      *    ZERO state rows / state memory / commit time — there is no
      *    stateful operator in the plan at all;
      *  - O(batch) emission: per-batch durations are published for
      *    the record (flat across the run — nothing accumulates);
      *  - horizon parity, TOTAL (no watermark tail): the union of
      *    per-batch summaries must equal the all-at-once batch twin
      *    row-for-row over all n queries;
      *  - planted accounting: every 10th vector is a VERBATIM clone
      *    of corpus vector pmod(id/10, 100k) — same bucket by
      *    construction, so the radius-0 probe finds it and its
      *    emitted best match must be exactly (cos 1.0, the planted
      *    source id).
      * The flip budget is fixed at 1 here (the gate selects it from
      * the measured curve; recall economics are q235/q236's gated
      * story) — the harness measures STATE posture, which is
      * identically zero at any budget, while keeping the candidate
      * mass at 10M queries inside a sane evidence-run wall time.
      * Incoming ids are offset by the corpus size so the id spaces
      * are disjoint (the gate's %4-split discipline, same effect).
      * q238 (streaming top-k) is covered by MEASUREMENT (r16, closing
      * the r15 verdict's #5): the one foreachBatch below emits BOTH
      * tails from the shared hit stream — q237's best-1 summary and
      * q238's per-query top-5 window ranking — and the harness
      * asserts the per-batch ranking equals the all-at-once batch
      * twin rank-for-rank over all n queries (the one part of q238
      * the "identical streaming plan" argument could not cover).
      */
    def runVectorSearch(): Unit = {
      stats.clear()
      val corpusN = 100000L
      val plantEvery = 10L
      // deterministic 64-dim vector from a seed id: coords in
      // (-1, 1), step 0.001, offset half a step so no coordinate is
      // ever exactly 0 (sign-LSH reads strict > 0)
      def vecSql(idExpr: String): String =
        s"transform(sequence(0, 63), k -> " +
          s"CAST((pmod(xxhash64($idExpr, k), 2000) - 999.5) / 1000.0 AS FLOAT))"
      def vecsOf(df: org.apache.spark.sql.DataFrame) = df.select(
        (col("id") + corpusN).as("vec_id"),
        expr(s"CASE WHEN id % $plantEvery = 0 THEN " +
          vecSql(s"pmod(id div $plantEvery, $corpusN)") +
          s" ELSE ${vecSql(s"id + $corpusN")} END").as("embedding"))
      val corpus = graft.operators.StreamingParity.vectorIndexOf(
        spark.range(corpusN).select(col("id").as("vec_id"),
          expr(vecSql("id")).as("embedding")))
        .repartition(32).persist()
      corpus.count()
      val radius = 1
      val stream = vecsOf(spark.readStream
        .format("graft.sources.SyntheticEvents")
        .option("numRows", n.toString)
        .option("rowsPerBatch", math.max(n / nBatches, 1L).toString).load()
        .select(col("id")))
      val t0 = System.nanoTime()
      // ~40 MB index: explicitly broadcast — the alternative is the
      // bucketed-table co-location pinned in StreamingOpsSpec; either
      // way the probe stream never repartitions the corpus.
      // ONE foreachBatch emits BOTH gate tails from the SHARED hit
      // stream (r15 verdict #5): q237's best-1 summary AND q238's
      // top-5 window ranking — the part of q238 the "identical
      // streaming plan" argument did not cover is exactly this
      // per-batch ranking, so it is measured here at 10M rather than
      // argued. Still zero stateful operators either way.
      val hits = graft.operators.StreamingParity.vectorSearchHits(
        stream, broadcast(corpus), radius)
      val sumDir = java.nio.file.Files.createTempDirectory("streamscale-q237").toString
      val topkDir = java.nio.file.Files.createTempDirectory("streamscale-q238").toString
      val q = hits.writeStream.queryName("streamscale-q237")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          graft.operators.StreamingParity.vectorSearchSummary(b)
            .write.mode("overwrite").parquet(s"$sumDir/batch_id=$id")
          graft.operators.StreamingParity.vectorSearchTopK(b, 5)
            .write.mode("overwrite").parquet(s"$topkDir/batch_id=$id")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val emitted = spark.read.parquet(sumDir).drop("batch_id").persist()
      val nEmitted = emitted.count()
      val secs = (System.nanoTime() - t0) / 1e9

      // ---- total parity: per-batch emissions vs the batch twin ----
      val twin = graft.operators.StreamingParity.streamVectorSearch(
        vecsOf(spark.read.format("graft.sources.SyntheticEvents")
          .option("numRows", n.toString).load().select(col("id"))),
        broadcast(corpus), radius)
        .select(col("query_id"), col("n_candidates").as("o_n"),
          col("best_cos").as("o_cos"), col("best_cand").as("o_cand"))
      val mismatches = emitted.join(twin, Seq("query_id"), "full")
        .filter(col("n_candidates").isNull || col("o_n").isNull ||
          col("n_candidates") =!= col("o_n") ||
          col("best_cos") =!= col("o_cos") ||
          col("best_cand") =!= col("o_cand"))
        .count()
      // ---- planted accounting ----
      val planted = emitted
        .filter(pmod(col("query_id") - corpusN, lit(plantEvery)) === 0)
        .persist()
      val nPlanted = planted.count()
      val expectedPlanted = (n - 1) / plantEvery + 1
      val badPlanted = planted.filter(col("best_cos") =!= 1.0 ||
        col("best_cand") =!= pmod(
          expr(s"(query_id - $corpusN) div $plantEvery"), lit(corpusN)))
        .count()
      planted.unpersist(blocking = false)

      val rows = stats.toArray(Array.empty[BatchStat])
        .filter(b => b.query == "streamscale-q237" && b.inputRows > 0)
        .sortBy(_.batchId)
      println(s"\n### shape q237")
      println("| batch | input rows | batch s | state rows | state MB | commit ms |")
      println("|---|---|---|---|---|---|")
      rows.foreach { b =>
        println(f"| ${b.batchId} | ${b.inputRows} | ${b.durMs / 1000.0}%.1f " +
          f"| ${b.stateRows} | ${b.stateMemBytes / 1e6}%.1f | ${b.commitMs} |")
      }
      val maxState = if (rows.nonEmpty) rows.map(_.stateRows).max else 0L
      val maxStateMem = if (rows.nonEmpty) rows.map(_.stateMemBytes).max else 0L
      val maxCommit = if (rows.nonEmpty) rows.map(_.commitMs).max else 0L
      println(f"\nSUMMARY[q237] rows=$n batches=${rows.size} wall=$secs%.1f s " +
        f"(${n / secs}%.0f vec/s) emitted=$nEmitted " +
        f"planted=$nPlanted/$expectedPlanted " +
        f"maxStateRows=$maxState maxStateMB=${maxStateMem / 1e6}%.1f " +
        f"maxCommitMs=$maxCommit")

      require(mismatches == 0,
        s"[q237] $mismatches queries disagree with the batch twin")
      require(nPlanted == expectedPlanted,
        s"[q237] $nPlanted planted clones answered, expected $expectedPlanted")
      require(badPlanted == 0,
        s"[q237] $badPlanted planted clones came back with the wrong match")
      require(maxState == 0 && maxStateMem == 0 && maxCommit == 0,
        s"[q237] the state-free plan reported state ($maxState rows, " +
          s"$maxStateMem bytes, $maxCommit ms commit) — a stateful " +
          "operator crept back into the streaming tail")
      emitted.unpersist(blocking = false)

      // ---- q238 rank-set parity (r15 verdict #5): the per-batch
      // top-5 window ranking must equal the all-at-once batch twin's
      // ranking for every query — the one part of q238 the "identical
      // streaming plan" argument could not cover ----
      val topkEmitted = spark.read.parquet(topkDir).drop("batch_id")
        .select(col("query_id"), col("rn"),
          col("cand_id"), col("probe_hamming"), col("cos_sim"))
      val topkTwin = graft.operators.StreamingParity.vectorSearchTopK(
        graft.operators.StreamingParity.vectorSearchHits(
          vecsOf(spark.read.format("graft.sources.SyntheticEvents")
            .option("numRows", n.toString).load().select(col("id"))),
          broadcast(corpus), radius), 5)
        .select(col("query_id"), col("rn"), col("cand_id").as("o_cand"),
          col("probe_hamming").as("o_ham"), col("cos_sim").as("o_cos"))
      val topkMismatch = topkEmitted.join(topkTwin, Seq("query_id", "rn"), "full")
        .filter(col("cand_id").isNull || col("o_cand").isNull ||
          col("cand_id") =!= col("o_cand") ||
          col("probe_hamming") =!= col("o_ham") ||
          col("cos_sim") =!= col("o_cos"))
        .count()
      val nTopk = topkEmitted.count()
      val nTopkQueries = topkEmitted.select(col("query_id")).distinct().count()
      println(f"\nSUMMARY[q238] rows=$n topkRows=$nTopk " +
        f"queries=$nTopkQueries rankMismatches=$topkMismatch " +
        "(same run/batches/state metrics as SUMMARY[q237] — one " +
        "foreachBatch emitted both tails)")
      require(topkMismatch == 0,
        s"[q238] $topkMismatch (query, rank) rows disagree with the batch twin")
      corpus.unpersist(blocking = false)
      // r16 ADVICE #1: at evidence scale (10M queries, ~50M top-k
      // rows) the two per-batch result trees are multi-GB — delete
      // them once the parity checks above have passed instead of
      // leaking them in /tmp
      Seq(sumDir, topkDir).foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
    }

    if (shape == "q219" || shape == "both" || shape == "all")
      runShape("q219", outer = false)
    if (shape == "q103" || shape == "both" || shape == "all")
      runShape("q103", outer = true)
    if (shape == "q113" || shape == "all") runFullOuter()
    if (shape == "q82" || shape == "all") runIncrementalNeardup()
    if (shape == "q237" || shape == "all") runVectorSearch()
    spark.stop()
  }
}
