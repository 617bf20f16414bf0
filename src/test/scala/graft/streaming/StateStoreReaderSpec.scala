package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4's state-store DataFrame reader (`format("statestore")`) —
  * the ops surface for inspecting a streaming checkpoint's live state
  * without replaying the query. At 100 TB this is how state-size
  * skew, key explosions, and poisoned entries get debugged in place;
  * here the read-back state is cross-checked against the aggregation
  * the query itself emitted, which pins the reader wiring end to end
  * (path layout, operator/store resolution, key/value struct schema).
  */
class StateStoreReaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("statestore read of a streaming agg checkpoint equals the emitted aggregate") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Long)](
      (System.nanoTime() & 0x3fffffff).toInt, spark, None)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-state").toString
    val sink = s"graft_state_probe_${System.nanoTime()}"
    val agg = mem.toDF().toDF("k", "v").groupBy(col("k")).agg(sum(col("v")).as("s"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(sink).option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, 10L), (2L, 5L), (1L, 7L))
      q.processAllAvailable()
      mem.addData((2L, 1L), (3L, 2L))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table(sink)
      .as[(Long, Long)].collect().toMap
    assert(emitted === Map(1L -> 17L, 2L -> 6L, 3L -> 2L))
    // the reader exposes (key, value) structs per state row; for the
    // streaming-agg operator the key is the grouping key and the value
    // carries the aggregation buffer (the running sum)
    // the value struct names its field after the aggregate FUNCTION
    // (`sum`), not the output alias — aliases are a projection concern,
    // the buffer schema is the operator's
    val st = spark.read.format("statestore").load(ckpt)
    val fromState = st.select(col("key.k"), col("value.sum"))
      .as[(Long, Long)].collect().toMap
    assert(fromState === emitted,
      "checkpoint state must equal the query's own final aggregate")
  }
}
