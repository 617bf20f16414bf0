package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table catalog over a driver test-data directory
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md).
  *
  * All engine queries load inputs through here so the scan is a plain
  * `spark.read.parquet` — Catalyst gets full predicate-pushdown /
  * column-pruning freedom and, on a real cluster, the same code path
  * scales to any number of files/partitions.
  *
  * `events.ts` has drifted across generator versions: parquet
  * TIMESTAMP(NANOS) (Spark's vectorized reader rejects it; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` — set by
  * [[GraftSession]] — it arrives as nanos-since-epoch LONG), then
  * TIMESTAMP(MICROS) `isAdjustedToUTC=false` (arrives as
  * TIMESTAMP_NTZ). Both are normalized here to session-zone
  * TimestampType so every downstream operator (watermarks,
  * `unix_micros`, bigint casts) sees one stable engine-facing
  * schema. The session timezone is pinned to UTC
  * (GraftSession.scala), so the NTZ→TIMESTAMP cast is a lossless
  * reinterpretation, and `div 1000` on micro-granular nanos likewise
  * loses nothing.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df, "ts") else df
  }

  /** Normalize a timestamp-ish column to session-zone TimestampType
    * regardless of how the parquet writer encoded it (nanos-as-LONG,
    * TIMESTAMP_NTZ, or already TIMESTAMP). Exposed for the
    * schema-drift regression spec. */
  def normalizeTs(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case LongType => // TIMESTAMP(NANOS) read under nanosAsLong
        df.withColumn(colName, timestamp_micros(expr(s"$colName div 1000")))
      case TimestampNTZType => // TIMESTAMP(MICROS) isAdjustedToUTC=false
        df.withColumn(colName, col(colName).cast("timestamp"))
      case _ => df
    }
}
