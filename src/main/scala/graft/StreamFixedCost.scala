package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Decomposes the per-query streaming FIXED cost (r16 "Not yet
  * optimized" #1, r17 verdict item 4): for three pipeline shapes —
  * (a) 1-row MemoryStream → memory sink (pure machinery floor),
  * (b) same plus a tiny stateful agg (adds state-store lifecycle),
  * (c) file-source scan → stateless filter → memory sink (adds file
  * listing + offset log) — times start() / processAllAvailable() /
  * stop() separately, several reps each, so the ~0.5 s per-query tax
  * every streaming gate entry pays can be attributed to a phase
  * instead of guessed at. `runMain graft.StreamFixedCost [reps]`.
  */
object StreamFixedCost {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    import spark.implicits._
    // per-batch phase attribution for the LAST query of each rep
    val lastProgress = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val st = p.stateOperators.map(so =>
          s"${so.operatorName}{commit=${so.commitTimeMs} upd=${so.allUpdatesTimeMs}}").mkString(" ")
        lastProgress.add(s"  [batch] ${p.name} b=${p.batchId} durationMs=${p.durationMs} $st")
      }
    })
    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000
    var id = 0
    def run(tag: String, mk: () => org.apache.spark.sql.DataFrame,
        parts: Int = 8): Unit = {
      for (r <- 1 to reps) {
        id += 1
        val df = mk()
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        val t0 = System.nanoTime()
        val q = try df.writeStream.outputMode(
            if (tag.contains("agg")) "complete" else "append")
          .format("memory").queryName(s"fixedcost_$id").start()
        finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        val tStart = ms(t0)
        val t1 = System.nanoTime()
        q.processAllAvailable()
        val tProc = ms(t1)
        val t2 = System.nanoTime()
        q.stop()
        val tStop = ms(t2)
        spark.catalog.dropTempView(s"fixedcost_$id")
        println(s"[fixedcost] $tag rep$r start=${tStart}ms process=${tProc}ms stop=${tStop}ms total=${tStart + tProc + tStop}ms")
        Thread.sleep(300)
        var l = lastProgress.poll()
        while (l != null) { println(l); l = lastProgress.poll() }
      }
    }
    run("memstream-stateless", () => {
      val m = MemoryStream[Int](1000 + id, spark, None)
      m.addData(1)
      m.toDF().select(col("value"))
    })
    for (p <- Seq(8, 4, 2, 1))
      run(s"memstream-agg-p$p", () => {
        val m = MemoryStream[Int](2000 + id, spark, None)
        m.addData(1, 2, 3)
        m.toDF().groupBy(col("value") % 2).count()
      }, parts = p)
    run("filesource-stateless", () => {
      val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"))
    })
    spark.stop()
  }
}
