package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, FloatType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Output-type contract for every gated query (r7, extended r8).
  * Full forensics: docs/driver-gate.md (the single authority).
  *
  * Root cause of the r5/r6 driver-red family (q138 q193 q194 q199 q202
  * q203 q204): the driver's compare reads the Spark result parquet via
  * pandas (DecimalType → Python Decimal, str '510274.00') but the
  * DuckDB oracle via .df() (DECIMAL → float64, str '510274.0'), then
  * hashes the stringified frames — so a decimal OUTPUT column whose
  * values carry trailing zeros mismatches even when numerically equal.
  * Emulating that procedure (tools/check_driver_hash.py) reproduced the
  * driver's red set exactly, 208/208 queries.
  *
  * Contract enforced here: money/metric math may be DECIMAL internally
  * (exact merges, q01 policy), but the FINAL projection of every query
  * casts to DOUBLE / BIGINT / STRING — DecimalType never appears in a
  * result schema, at any nesting depth. Queries q196/q200 were green
  * only because their sf0.01 values happened to have no trailing
  * zeros; this spec removes the luck from the gate.
  *
  * FloatType is banned for the same stringify asymmetry (r7 verdict
  * #3): a float32 result column arrives in pandas as float32 — whose
  * repr is the SHORTEST string that round-trips at 32 bits (e.g.
  * '0.1' for np.float32(0.1)) — while the DuckDB oracle's .df() side
  * is float64, whose shortest round-trip of the widened value is
  * '0.10000000149011612'. Same value provenance, different string,
  * red hash. No query emits float32 today (floats stay internal to
  * embedding math, Similarity.scala); this spec turns that accident
  * into policy exactly as the DecimalType ban did for q196/q200.
  */
class OutputTypePolicySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def bannedPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(s"$path: DECIMAL")
    case FloatType => Seq(s"$path: FLOAT")
    case s: StructType =>
      s.fields.toSeq.flatMap(f => bannedPaths(f.dataType, s"$path.${f.name}"))
    case a: ArrayType => bannedPaths(a.elementType, s"$path[]")
    // MAP is banned outright (r9, TypeFixture roundtrip): pandas reads
    // a parquet MAP as a list of (k, v) tuples while duckdb .df()
    // yields {'key': [...], 'value': [...]} — no value agreement is
    // possible. Sanctioned spelling: array_sort(map_entries(m)) with
    // null-free entry fields (see docs/driver-gate.md).
    case _: MapType => Seq(s"$path: MAP")
    case _ => Seq.empty
  }

  test("no gated query exposes DecimalType or FloatType in its result schema") {
    val violations = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // schema resolution only — builders that execute eagerly still
        // just return their (tiny, sf0.001) result frame here
        val schema =
          try fn(spark, sf).schema
          catch {
            case e: Throwable =>
              fail(s"$name failed to build at $sf: ${e.getMessage}")
          }
        schema.fields.toSeq.flatMap(f =>
          bannedPaths(f.dataType, s"$name/${f.name}"))
    }
    CacheRegistry.clear(spark)
    assert(violations.isEmpty,
      s"banned type reached a result schema (driver-hash hazard, " +
        s"see docs/driver-gate.md):\n  " + violations.mkString("\n  "))
  }
}
