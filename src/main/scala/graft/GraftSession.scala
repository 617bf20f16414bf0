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
      // start shuffles finer than the core count and let AQE coalesce:
      // with partitions == cores a single skewed partition (a hot
      // shingle/band key) stalls the whole stage; 4× gives the skew
      // splitter and coalescer room to rebalance at runtime
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (4 * shufflePartitions).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
