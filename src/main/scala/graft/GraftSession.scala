package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults so Verify, Bench, and tests
  * run with identical semantics.
  *
  *  - UTC session timezone (oracle parity).
  *  - AQE on: runtime shuffle coalescing + skew-join splitting — the
  *    behaviors that keep these plans healthy at 100 TB.
  *  - `nanosAsLong`: lets the parquet reader accept TIMESTAMP(NANOS)
  *    columns (see [[Tables]]).
  *  - shuffle partitions sized to the local core count, not 200.
  */
object GraftSession {
  def build(master: String, shufflePartitions: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // NOTE: adaptive.coalescePartitions.initialPartitionNum is left
      // at its default (= shuffle.partitions). A 4× value was measured
      // here and REJECTED: at bench scale it cost ~30% wall-clock
      // (q28 2.2× slower) because every shuffle pays 4× task overhead
      // while AQE's skew-join splitter already handles hot keys
      // without it. On a real cluster it belongs in deploy config,
      // sized to executor count, not hard-coded by the engine.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // RocksDB state store for every stateful streaming query (the
      // gate path runs q69/q70/q78/q80 through this session): state
      // lives off-heap and spills to local disk, so state volume is
      // bounded by disk — not executor heap — which is the only
      // 100 TB-credible backend. The default HDFSBackedStateStore
      // keeps every version of every key on-heap.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
