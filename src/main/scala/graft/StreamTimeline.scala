package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch wall-time breakdown for a streaming gate query:
  * prints every StreamingQueryProgress's durationMs map
  * (triggerExecution / queryPlanning / getBatch / latestOffset /
  * addBatch / walCommit / commitOffsets) plus per-operator state
  * commit times, so the FIXED per-batch machinery cost (the dominant
  * term for these queries at gate scale) can be attributed to a
  * specific phase instead of guessed at.
  *
  * `runMain graft.StreamTimeline <query> [reps]` (same env contract
  * as Bench/BenchOne). Reps matter: rep 1 pays codegen/JIT that the
  * steady-state bench never counts.
  */
object StreamTimeline {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q219_stream_join_then_agg"
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // STREAM_PLAN_OUT=<file>: also capture the streaming query's OWN
    // executed micro-batch plan (the batch-side explain of the gate
    // function only shows the post-sink read) — resolved via the
    // query handle on its first progress event.
    val planOut = sys.env.get("STREAM_PLAN_OUT")
    val planSaved = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        progress.add(s"--- query started ${e.name} at ${System.nanoTime() / 1000000} ms")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        planOut.foreach { path =>
          if (planSaved.compareAndSet(false, true)) {
            try {
              val q = spark.streams.get(p.id)
              val plan = org.apache.spark.sql.graftbridge.Bridge
                .lastMicroBatchPlan(q)
                .map(_.toString).getOrElse("")
              if (plan.nonEmpty)
                java.nio.file.Files.writeString(java.nio.file.Paths.get(path), plan)
              else planSaved.set(false)
            } catch { case _: Throwable => planSaved.set(false) }
          }
        }
        val state = p.stateOperators.map { so =>
          s"${so.operatorName}{commit=${so.commitTimeMs}ms, upd=${so.allUpdatesTimeMs}ms, " +
            s"rm=${so.allRemovalsTimeMs}ms, rows=${so.numRowsTotal}}"
        }.mkString(" ")
        progress.add(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} state=[$state]")
      }
    })
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      progress.add(s"=== rep $i")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      progress.add(f"=== rep $i done: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    // listener events are async; give the bus a moment to drain
    Thread.sleep(1500)
    progress.forEach(println(_))
    CacheRegistry.clear(spark)
    spark.stop()
  }
}
