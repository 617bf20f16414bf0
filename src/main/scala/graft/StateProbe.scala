package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** State-store metrics probe for the provider A/B (r7 verdict #6):
  * runs one stateful streaming gate query under the session's
  * configured provider (flip with SPARK_GRAFT_STATE_PROVIDER) and
  * prints the final micro-batch's per-operator state metrics from
  * StreamingQueryProgress — rows, memory, and the provider-specific
  * custom metrics (RocksDB compaction/sst counters vs HDFS-store
  * heap usage). `runMain graft.StateProbe [query]` (default q219).
  */
object StateProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q219_stream_join_then_agg"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val lastState = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ops = e.progress.stateOperators
        if (ops.nonEmpty) lastState.set(ops.map(_.json).mkString("\n"))
      }
    })
    println(s"[stateprobe] provider = " + spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass"))
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(s"[stateprobe] $name rows=$n")
    println(s"[stateprobe] final stateOperators:\n${lastState.get}")
    spark.stop()
  }
}
