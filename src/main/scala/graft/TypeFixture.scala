package graft

import org.apache.spark.sql.SparkSession

/** Output-type roundtrip fixture for the driver-hash emulation
  * (r8 verdict #8). DECIMAL (r7) and FLOAT (r8) were fenced
  * one-at-a-time after near-misses; this main turns the remaining
  * output-type classes into a standing property check instead of
  * waiting for the next near-miss: for every type class a gated query
  * could emit, write a tiny Spark result parquet (through the same
  * [[GraftSession]] config the engine uses — INT96 timestamps, UTC)
  * with adversarial values (nulls, empties, negatives, unicode,
  * sub-second instants, pre-1970 dates), alongside the DuckDB SQL
  * producing the same logical values. `tools/check_type_roundtrip.py`
  * then runs each pair through the EXACT emulated driver compare
  * (pandas-read parquet vs duckdb `.df()`, stringified) — any
  * asymmetry it finds becomes a new OutputTypePolicy rule rather
  * than a production red.
  *
  * `runMain graft.TypeFixture <outDir>` writes `<case>/` parquet dirs
  * plus `oracle_sql.json` (the Verify layout, so the checker tooling
  * is shared).
  */
object TypeFixture {

  /** (case name, Spark SQL, DuckDB SQL). Spark side runs through
    * spark.sql and is written as parquet; DuckDB side is evaluated by
    * the checker. Values are chosen to expose representation edges,
    * not business logic. */
  val cases: Seq[(String, String, String)] = Seq(
    ("t_bigint",
      "SELECT * FROM VALUES (1L, 42L), (2L, -9223372036854775807L), (3L, CAST(NULL AS LONG)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, 42::BIGINT), (2, -9223372036854775807), (3, NULL)) t(k, v)"),
    // INT32 with a NULL: pandas widens the column to float64 (NaN),
    // duckdb .df() must do the same for the strings to agree
    ("t_int_null",
      "SELECT * FROM VALUES (1L, 7), (2L, -1), (3L, CAST(NULL AS INT)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, 7::INTEGER), (2, -1), (3, NULL)) t(k, v)"),
    ("t_double",
      "SELECT * FROM VALUES (1L, CAST(0.1 AS DOUBLE)), (2L, CAST(-0.0 AS DOUBLE)), " +
        "(3L, CAST(1e-7 AS DOUBLE)), (4L, CAST(12345678901234.5 AS DOUBLE)), (5L, CAST(NULL AS DOUBLE)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, 0.1::DOUBLE), (2, -0.0::DOUBLE), " +
        "(3, 1e-7::DOUBLE), (4, 12345678901234.5::DOUBLE), (5, NULL)) t(k, v)"),
    ("t_varchar",
      "SELECT * FROM VALUES (1L, 'plain'), (2L, ''), (3L, 'üñïçödé ✓'), " +
        "(4L, 'line\\nbreak\\tand''quote'), (5L, CAST(NULL AS STRING)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, 'plain'), (2, ''), (3, 'üñïçödé ✓'), " +
        "(4, 'line' || chr(10) || 'break' || chr(9) || 'and''quote'), (5, NULL)) t(k, v)"),
    ("t_boolean",
      "SELECT * FROM VALUES (1L, true), (2L, false), (3L, CAST(NULL AS BOOLEAN)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, true), (2, false), (3, NULL)) t(k, v)"),
    ("t_date",
      "SELECT * FROM VALUES (1L, DATE'1969-12-31'), (2L, DATE'1970-01-01'), " +
        "(3L, DATE'2024-02-29'), (4L, CAST(NULL AS DATE)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, DATE '1969-12-31'), (2, DATE '1970-01-01'), " +
        "(3, DATE '2024-02-29'), (4, NULL)) t(k, v)"),
    ("t_timestamp",
      "SELECT * FROM VALUES (1L, TIMESTAMP'1970-01-01 00:00:00'), " +
        "(2L, TIMESTAMP'2024-06-30 23:59:59.5'), (3L, TIMESTAMP'2024-01-02 03:04:05.000001'), " +
        "(4L, TIMESTAMP'1960-02-29 12:00:00'), (5L, CAST(NULL AS TIMESTAMP)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, TIMESTAMP '1970-01-01 00:00:00'), " +
        "(2, TIMESTAMP '2024-06-30 23:59:59.5'), (3, TIMESTAMP '2024-01-02 03:04:05.000001'), " +
        "(4, TIMESTAMP '1960-02-29 12:00:00'), (5, NULL)) t(k, v)"),
    ("t_array_bigint",
      "SELECT * FROM VALUES (1L, array(1L, 2L, 3L)), (2L, array()), " +
        "(3L, CAST(NULL AS ARRAY<LONG>)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, [1, 2, 3]::BIGINT[]), (2, []::BIGINT[]), (3, NULL)) t(k, v)"),
    ("t_array_double",
      "SELECT * FROM VALUES (1L, array(CAST(0.5 AS DOUBLE), CAST(-1.25 AS DOUBLE))), " +
        "(2L, CAST(array() AS ARRAY<DOUBLE>)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, [0.5, -1.25]::DOUBLE[]), (2, []::DOUBLE[])) t(k, v)"),
    ("t_array_varchar",
      "SELECT * FROM VALUES (1L, array('a', 'b')), (2L, array('')), " +
        "(3L, CAST(array() AS ARRAY<STRING>)) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, ['a', 'b']), (2, ['']), (3, []::VARCHAR[])) t(k, v)"),
    ("t_struct",
      "SELECT * FROM VALUES (1L, named_struct('a', 1L, 's', 'x')), " +
        "(2L, named_struct('a', CAST(NULL AS LONG), 's', 'y')) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, {'a': 1::BIGINT, 's': 'x'}), " +
        "(2, {'a': NULL::BIGINT, 's': 'y'})) t(k, v)"),
    ("t_map",
      "SELECT * FROM VALUES (1L, map('k1', 1L, 'k2', 2L)), " +
        "(2L, map('k1', CAST(NULL AS LONG))) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, MAP {'k1': 1::BIGINT, 'k2': 2::BIGINT}), " +
        "(2, MAP {'k1': NULL::BIGINT})) t(k, v)"),
    // the sanctioned MAP spelling: map_entries → sorted ARRAY<STRUCT>
    ("t_map_entries",
      "SELECT k, array_sort(map_entries(v)) AS v FROM VALUES " +
        "(1L, map('k1', 1L, 'k2', 2L)), (2L, map('k1', CAST(NULL AS LONG))) AS t(k, v)",
      "SELECT k, list_sort(map_entries(v)) AS v FROM (VALUES " +
        "(1::BIGINT, MAP {'k1': 1::BIGINT, 'k2': 2::BIGINT}), " +
        "(2, MAP {'k1': NULL::BIGINT})) t(k, v)"),
    ("t_array_struct",
      "SELECT * FROM VALUES (1L, array(named_struct('a', 1L), named_struct('a', 2L))) AS t(k, v)",
      "SELECT * FROM (VALUES (1::BIGINT, [{'a': 1::BIGINT}, {'a': 2::BIGINT}])) t(k, v)"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: TypeFixture <outDir>")
    val out = args(0)
    val spark: SparkSession = GraftSession.build("local[4]", 4)
    val sqlJson = cases.map { case (name, _, duck) =>
      "\"" + name + "\":" + "\"" +
        duck.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    cases.foreach { case (name, sparkSql, _) =>
      spark.sql(sparkSql).coalesce(1).write.mode("overwrite")
        .parquet(s"$out/$name")
      println(s"[typefixture] wrote $name")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json"), sqlJson)
    spark.stop()
  }
}
