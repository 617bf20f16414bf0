package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query inventory from the operator modules:
  *   - [[graft.operators.Relational]] — SURVEY §2.2 relational surface
  *   - [[graft.operators.TextDedup]] — dedup + text analysis (north star)
  *   - [[graft.operators.Similarity]] — vector similarity search (north star)
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (operators.Relational.queries, operators.Relational.oracleSql),
      (operators.Relational2.queries, operators.Relational2.oracleSql),
      (operators.Relational3.queries, operators.Relational3.oracleSql),
      (operators.Relational4.queries, operators.Relational4.oracleSql),
      (operators.TextDedup.queries, operators.TextDedup.oracleSql),
      (operators.Retrieval.queries, operators.Retrieval.oracleSql),
      (operators.Similarity.queries, operators.Similarity.oracleSql),
      (operators.AsOf.queries, operators.AsOf.oracleSql),
      (operators.Analytics.queries, operators.Analytics.oracleSql),
      (operators.Analytics2.queries, operators.Analytics2.oracleSql),
      (operators.Analytics3.queries, operators.Analytics3.oracleSql),
      (operators.StreamingParity.queries, operators.StreamingParity.oracleSql),
      (streaming.ProtoParity.queries, streaming.ProtoParity.oracleSql),
      (sources.SourceQueries.queries, sources.SourceQueries.oracleSql),
      (multimodal.Multimodal.queries, multimodal.Multimodal.oracleSql))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
