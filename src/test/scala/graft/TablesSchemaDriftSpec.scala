package graft

import java.nio.file.Files
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regression guard for test-data timestamp encoding drift.
  *
  * The driver's generator has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS) (rounds 1-3, read as LONG under
  * `nanosAsLong`), then TIMESTAMP(MICROS) `isAdjustedToUTC=false`
  * (round 4+, read as TIMESTAMP_NTZ — which silently broke six
  * queries and three specs in round 4). [[Tables]] must map every
  * historical and plausible future encoding to one engine-facing
  * schema: session-zone TimestampType, identical instants.
  */
class TablesSchemaDriftSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // one known instant: 2024-03-01T12:34:56.789012Z
  private val micros = 1709296496789012L

  private def writeEvents(dir: String, df: org.apache.spark.sql.DataFrame): String = {
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def readBack(dir: String) = {
    val out = Tables(spark, dir, "events")
    assert(out.schema("ts").dataType === TimestampType,
      s"Tables must normalize to TimestampType, got ${out.schema("ts").dataType}")
    out.select(unix_micros(col("ts"))).as[Long].collect().toSeq
  }

  test("MICROS/UTC (TimestampType write) passes through unchanged") {
    val dir = Files.createTempDirectory("drift_tz").toString
    writeEvents(dir, Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).as("ts")))
    assert(readBack(dir) === Seq(micros))
  }

  test("MICROS/NTZ (TimestampNTZ write) is cast losslessly under UTC session") {
    val dir = Files.createTempDirectory("drift_ntz").toString
    writeEvents(dir, Seq(micros).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts")))
    assert(readBack(dir) === Seq(micros))
  }

  test("NANOS (arrives as LONG under nanosAsLong) is divided down to micros") {
    // Spark cannot WRITE parquet TIMESTAMP(NANOS); under the session's
    // nanosAsLong conf such a column READS as LongType, so the
    // boundary sees a LONG of nanos — emulate exactly that arrival.
    val dir = Files.createTempDirectory("drift_nanos").toString
    writeEvents(dir, Seq(micros * 1000L).toDF("ts"))
    assert(readBack(dir) === Seq(micros))
  }

  test("normalizeTs is idempotent and leaves non-ts columns alone") {
    val df = Seq((micros, "x")).toDF("us", "tag")
      .select(timestamp_micros(col("us")).as("ts"), col("tag"))
    val once = Tables.normalizeTs(df, "ts")
    val twice = Tables.normalizeTs(once, "ts")
    assert(twice.schema === once.schema)
    assert(twice.select("tag").as[String].collect().toSeq === Seq("x"))
  }

  test("sf0.001 events arrives as TimestampType whatever the generator wrote") {
    val ev = Tables(spark, TestSpark.sf, "events")
    assert(ev.schema("ts").dataType === TimestampType)
    // watermarking must be legal on the normalized column — this is
    // the exact operation that failed in round 4
    ev.withWatermark("ts", "1 hour").count()
  }
}
