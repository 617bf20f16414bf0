package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-gated protobuf decode: events are encoded into SampleMessage
  * wire bytes (test-message.proto:5-10) on the executors, decoded back
  * through [[ProtoCodec]] — the reference's per-record parse seam
  * (KPW:269-277) — and aggregated; DuckDB computes the same aggregate
  * from the raw table. A hash match proves the wire roundtrip is the
  * identity on every row, including absent optional fields. (The
  * byte-level format itself is pinned against the public encoding
  * spec's golden bytes in ProtoCodecSpec, so encode and decode can't
  * share a compensating bug; the streaming path through the pipeline
  * is spec'd there too.)
  */
object ProtoParity {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_proto_roundtrip" -> ((s, d) => {
      val enc = udf((q: String, t: Long, pn: Integer, rpp: Integer) =>
        SampleMessageProto.encode(q, t, pn, rpp))
      val encoded = Tables(s, d, "events")
        .select(enc(
          col("event_type"),
          col("event_id"),
          when(col("user_id") % 10 === 0, lit(null))
            .otherwise(col("user_id") % 100).cast("int"),
          when(col("event_id") % 7 === 0, lit(null))
            .otherwise(col("event_id") % 13).cast("int")).as("value"))
      // decode through the codec seam exactly as Pipeline.start does
      val decoded = encoded
        .select(SampleMessageProto.codec.decode(col("value")).as("r"))
        .select(col("r.*"))
      decoded.groupBy(col("page_number"))
        .agg(count(lit(1)).as("n"),
          sum(col("timestamp")).as("sum_ts"),
          count(col("result_per_page")).as("n_rpp"),
          min(col("query")).as("min_query"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q81_proto_roundtrip" ->
      """SELECT CASE WHEN user_id % 10 = 0 THEN NULL
        |   ELSE CAST(user_id % 100 AS INT) END AS page_number,
        | count(*) AS n,
        | CAST(sum(event_id) AS BIGINT) AS sum_ts,
        | count(CASE WHEN event_id % 7 <> 0 THEN 1 END) AS n_rpp,
        | min(event_type) AS min_query
        |FROM events GROUP BY 1""".stripMargin)
}
