package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated queries over the [[SyntheticEvents]] DSv2 connector.
  *
  * The generator is a pure function of the row index, so DuckDB
  * reproduces the whole table from `range()` — the connector sits
  * under the same hash gate as every parquet-backed operator. Both
  * queries ignore the sf dir by design: what is being gated is the
  * CONNECTOR (pushdown arithmetic, split planning, offset replay),
  * which must produce identical results at every scale factor.
  */
object SourceQueries {

  private val runId = new AtomicLong(0)
  private val liveSinks =
    new java.util.concurrent.ConcurrentLinkedQueue[(SparkSession, String)]()
  private def dropPriorSinks(s: SparkSession): Unit = {
    var e = liveSinks.poll()
    while (e != null) {
      try { if (!e._1.sparkContext.isStopped) e._1.catalog.dropTempView(e._2) }
      catch { case _: Throwable => () }
      e = liveSinks.poll()
    }
  }

  private val N = 50000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q183: batch scan through the connector with an id-range filter
    // that the ScanBuilder absorbs into its planned splits (partition
    // pruning, asserted in SyntheticEventsSpec) — then a standard
    // partial+final hash aggregate. Gates the generator arithmetic,
    // the pushdown boundary math (>=/< off-by-ones), and column
    // pruning (only 3 of 5 columns reach the aggregate).
    "q183_synth_pushdown_agg" -> ((s, _) => {
      s.read.format("graft_synth")
        .option("numRows", N).option("slices", 8).load()
        .filter(col("id") >= 5000L && col("id") < 45000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_micro")).as("total_micro"),
          count_distinct(col("user_id")).as("n_users"))
    }),

    // q184: the SAME aggregate through the connector's micro-batch
    // path — 2 admission-controlled batches of 25000 rows replayed
    // through the offset WAL into a complete-mode streaming aggregate.
    // Matching q183's oracle minus the filter proves the offset ranges
    // tile [0, N) exactly once (no gap, no overlap) — the delivery
    // property the reference buys with ack-after-finalize. (Batch
    // count is the fixed per-micro-batch tax, not a data cost: the
    // spec drives the finer 3000-row granularity; the gate needs >1
    // batch, not 10 — r17 takes the 4-batch r16 shape to the 2-batch
    // minimum that still exercises WAL replay across a batch seam:
    // each micro-batch pays full planning + one open/commit per state
    // store, ~0.25 s of pure machinery at gate volume, and the
    // complete-mode result is identical at any batch granularity.)
    "q184_synth_stream_replay" -> ((s, _) => {
      dropPriorSinks(s)
      val name = s"synth_replay_${runId.incrementAndGet()}"
      liveSinks.add((s, name))
      val agg = s.readStream.format("graft_synth")
        .option("numRows", N).option("slices", 8)
        .option("rowsPerBatch", 25000).load()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value_micro")).as("total_micro"))
      // 8 state partitions, not the session's core count (r16): the
      // complete-mode agg keeps one state store per shuffle partition
      // and re-opens/commits EVERY one of them in EVERY micro-batch —
      // at 32 partitions × 5 batches that is 160 store commits for a
      // 5-group aggregate. Same sizing rationale as StreamingParity's
      // withStateParts: state partitions follow state volume, never
      // core count (a real deployment sets this per-query; the value
      // is pinned into the checkpoint at first start).
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val q = try agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      finally s.conf.set("spark.sql.shuffle.partitions", prev)
      try q.processAllAvailable() finally q.stop()
      s.table(name)
    }))

  def oracleSql: Map[String, String] = Map(
    "q183_synth_pushdown_agg" ->
      s"""WITH g AS (${SyntheticEvents.oracleCte(5000, 45000)})
         |SELECT event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(value_micro) AS BIGINT) AS total_micro,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM g GROUP BY event_type""".stripMargin,
    "q184_synth_stream_replay" ->
      s"""WITH g AS (${SyntheticEvents.oracleCte(0, N)})
         |SELECT event_type,
         |       CAST(count(*) AS BIGINT) AS n_events,
         |       CAST(sum(value_micro) AS BIGINT) AS total_micro
         |FROM g GROUP BY event_type""".stripMargin)
}
