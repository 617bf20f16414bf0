package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth tranche of analytics operators (round 4): slowly-changing-
  * dimension interval construction, Markov transition matrices,
  * numeric profiling histograms, inverted-index construction, and
  * graph triangle counting over a thresholded co-occurrence graph.
  *
  * None of these exist in the reference pipeline (SURVEY.md §2.1 is
  * an ingest pipe); they extend the training-data / warehouse surface
  * the same way Analytics/TextDedup do. Every query has a DuckDB
  * oracle twin and follows the repo determinism policy
  * (Relational.scala): integer/timestamp outputs only where floats
  * would be engine-ambiguous, unique-key tiebreaks on every ordering,
  * md5 as the only hash.
  */
object Analytics2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q122: SCD Type-2 interval construction (gaps-and-islands) — the
    // warehouse op that turns an event log into a dimension history:
    // consecutive runs of the same per-user event_type collapse into
    // one [valid_from, valid_to) row, valid_to = next run's start
    // (NULL while current). The island id is the classic rn − rn_by_key
    // difference: two row_number passes over the SAME (user, ts,
    // event_id) order, so both windows reuse one sort+shuffle on
    // user_id (Catalyst plans a single Exchange + Sort). The run
    // collapse is then an ordinary hash agg and the valid_to lookup
    // one more window over far fewer rows. At 100 TB this is the
    // standard plan: everything is partitioned by user_id, per-user
    // history is bounded, nothing driver-side.
    "q122_scd2_intervals" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val runs = t(s, d, "events")
        .withColumn("grp",
          row_number().over(byUser) - row_number().over(byUserType))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      runs
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("valid_from"))))
        .select(col("user_id"), col("event_type").as("state"),
          col("valid_from"), col("valid_to"), col("n_events"))
    }),

    // q123: Markov transition matrix over per-user event sequences —
    // the behavioral-model building block (next-event prediction,
    // anomaly scoring). from_type = lag(event_type) on the unique
    // (ts, event_id) order; the per-from transition share is reported
    // in exact integer micro-units (n×1e6 div row_total) so the gate
    // is arithmetic-identical across engines — the same
    // aggregate-then-window share idiom as q121. Scale: one shuffle
    // on user_id for the lag, one small agg keyed by the (from, to)
    // type pair (bounded by |types|²), window over that tiny result.
    "q123_markov_transitions" -> ((s, d) => {
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = t(s, d, "events")
        .withColumn("from_type", lag(col("event_type"), 1).over(seq))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      trans
        .withColumn("micro_share",
          expr("n * 1000000 div sum(n) OVER (PARTITION BY from_type)"))
        .select(col("from_type"), col("to_type"), col("n"), col("micro_share"))
    }),

    // q124: numeric profiling histogram — per event_type, a 10-bucket
    // equi-width histogram of `value` (the data-profiling step before
    // any normalization choice). Bounds come from one map-side-
    // combined groupBy (NOT a window over the skewed type key — a
    // handful of types would serialize the whole table through a few
    // reducers), broadcast back as a tiny dim. The bucket expression
    // (v − min) * 10.0 / (max − min) is the same IEEE-754 op sequence
    // in both engines, so floor() lands identically and the gate
    // stays exact with integer counts.
    "q124_value_histogram" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("value").isNotNull)
      val bounds = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .withColumn("bucket",
          when(col("vmax") === col("vmin"), lit(0L)).otherwise(
            least(floor((col("value") - col("vmin")) * lit(10.0)
              / (col("vmax") - col("vmin"))), lit(9L))).cast("long"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    // q125: inverted-index construction — term → document frequency +
    // the first 5 postings (sorted doc ids), the retrieval-side
    // artifact of a text corpus build. Postings are made deterministic
    // the q120 way: collect_list + array_sort + slice, never raw
    // collection order. df ≥ 5 bounds the emitted vocabulary to terms
    // with real support (hapaxes dominate the raw vocab and carry no
    // retrieval value). Scale: distinct (term, doc) pairs are one
    // shuffle keyed by term; per-term posting lists here are truncated
    // in-row — a full-corpus index would range-bucket postings by
    // (term, doc_id range) instead of collecting unbounded lists.
    "q125_inverted_index" -> ((s, d) => {
      val td = t(s, d, "documents")
        .select(col("doc_id"),
          explode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
            .as("term"))
        .distinct()
      td.groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          expr("array_join(transform(slice(array_sort(collect_list(doc_id))," +
            " 1, 5), x -> CAST(x AS STRING)), ',')").as("postings"))
        .filter(col("df") >= 5)
    }),

    // q126: triangle counting on the thresholded co-purchase graph —
    // parts that co-occur in ≥ 2 orders form an edge; triangles are
    // the cohesion signal (product-bundle detection; same machinery as
    // social-graph clustering coefficients). The plan is the standard
    // distributed triangle enumeration: orient every edge low→high id
    // (each triangle counted exactly once, no directed double-count),
    // join edges on the shared middle vertex, then verify the closing
    // edge with a second equi-join. Scale posture: the support
    // threshold is what bounds the graph — pair generation is a
    // self-join on l_orderkey (per-order fan-out is C(k,2) with k =
    // lines per order, a small constant), and the ≥ 2 filter prunes
    // the long tail before any graph join runs. Production systems
    // orient by degree instead of id to bound the join fan-out on
    // power-law graphs; id orientation is correct and sufficient at
    // this threshold.
    "q126_copurchase_triangles" -> ((s, d) => {
      val op = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val edges = op.as("a").join(op.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select(col("p1"), col("p2"))
      val e1 = edges.as("e1")
      val e2 = edges.as("e2")
      val e3 = edges.as("e3")
      e1.join(e2, col("e1.p2") === col("e2.p1"))
        .join(e3, col("e3.p1") === col("e1.p1") && col("e3.p2") === col("e2.p2"))
        .select(col("e1.p1").as("a"), col("e1.p2").as("b"), col("e2.p2").as("c"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q122_scd2_intervals" ->
      """WITH runs AS (
        |  SELECT user_id, event_type, min(ts) AS valid_from,
        |   count(*) AS n_events
        |  FROM (
        |   SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     - row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS grp
        |   FROM events)
        |  GROUP BY user_id, event_type, grp)
        |SELECT user_id, event_type AS state, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
        |  AS valid_to,
        | n_events
        |FROM runs""".stripMargin,

    "q123_markov_transitions" ->
      """WITH trans AS (
        |  SELECT from_type, event_type AS to_type, count(*) AS n
        |  FROM (
        |   SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     AS from_type
        |   FROM events)
        |  WHERE from_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        | n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS micro_share
        |FROM trans""".stripMargin,

    "q124_value_histogram" ->
      """WITH bounds AS (
        |  SELECT event_type, min(value) AS vmin, max(value) AS vmax
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT e.event_type,
        | CAST(CASE WHEN vmax = vmin THEN 0
        |  ELSE least(floor((value - vmin) * 10.0 / (vmax - vmin)), 9)
        |  END AS BIGINT) AS bucket,
        | count(*) AS n
        |FROM events e JOIN bounds b ON e.event_type = b.event_type
        |WHERE value IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q125_inverted_index" ->
      """WITH td AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text),
        |   '\S+')) AS term
        |  FROM documents),
        | r AS (
        |  SELECT term, doc_id,
        |   row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM td)
        |SELECT term, count(*) AS df,
        | string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
        |  ',' ORDER BY doc_id) AS postings
        |FROM r
        |GROUP BY term
        |HAVING count(*) >= 5""".stripMargin,

    "q126_copurchase_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        | edges AS (
        |  SELECT a.pk AS p1, b.pk AS p2
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |FROM edges e1
        |JOIN edges e2 ON e1.p2 = e2.p1
        |JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2""".stripMargin)
}
