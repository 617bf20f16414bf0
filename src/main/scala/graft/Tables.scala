package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table catalog over a driver test-data directory
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md).
  *
  * All engine queries load inputs through here so the scan is a plain
  * `spark.read.parquet` — Catalyst gets full predicate-pushdown /
  * column-pruning freedom and, on a real cluster, the same code path
  * scales to any number of files/partitions.
  *
  * `events.ts` is written by the generator as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects. With
  * `spark.sql.legacy.parquet.nanosAsLong=true` (set by
  * [[GraftSession]]) the column arrives as nanos-since-epoch LONG and
  * is converted here to a proper micro-precision timestamp (the
  * source data is micro-granular, so `div 1000` is lossless).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
