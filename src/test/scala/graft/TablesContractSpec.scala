package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-facing schema contract for every driver table.
  *
  * The generator regenerates `/root/testdata` between rounds and has
  * already drifted once (events.ts NANOS → MICROS/NTZ, breaking six
  * queries — see [[TablesSchemaDriftSpec]]). This spec pins what the
  * ENGINE requires of each table after the [[Tables]] boundary, so the
  * next regeneration fails one loud assertion instead of six queries:
  *
  *  - events.ts is the event-time column (watermarks, `unix_micros`)
  *    and must surface as session-zone TimestampType — Tables
  *    normalizes every historical encoding;
  *  - orders/lineitem date columns are only ever date-truncated, so
  *    either TIMESTAMP or TIMESTAMP_NTZ is acceptable — but they must
  *    remain date-castable;
  *  - embeddings.embedding must stay ARRAY<FLOAT> (the vector
  *    expressions and ANN operators are float-typed);
  *  - key/measure columns must keep their exact types: silent
  *    int32↔int64 or double↔decimal drift would flip oracle hashes
  *    everywhere.
  */
class TablesContractSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def schemaOf(name: String) = Tables(spark, sf, name).schema

  private def assertCol(table: String, col: String, expected: DataType): Unit = {
    val sch = schemaOf(table)
    assert(sch.fieldNames.contains(col), s"$table lost column $col")
    assert(sch(col).dataType === expected,
      s"$table.$col drifted to ${sch(col).dataType}, engine expects $expected")
  }

  test("all ten tables load through the Tables boundary") {
    Tables.all.foreach { t => assert(Tables(spark, sf, t).columns.nonEmpty, t) }
  }

  test("events: engine-facing event-time contract") {
    assertCol("events", "ts", TimestampType) // normalized, whatever was written
    assertCol("events", "event_id", LongType)
    assertCol("events", "user_id", LongType)
    assertCol("events", "event_type", StringType)
    assertCol("events", "value", DoubleType)
  }

  test("orders/lineitem: keys, measures, and date-castable date columns") {
    assertCol("orders", "o_orderkey", LongType)
    assertCol("orders", "o_custkey", LongType)
    assertCol("orders", "o_totalprice", DoubleType)
    assertCol("lineitem", "l_orderkey", LongType)
    assertCol("lineitem", "l_quantity", DoubleType)
    assertCol("lineitem", "l_extendedprice", DoubleType)
    assertCol("lineitem", "l_returnflag", StringType)
    // date columns are only ever date-truncated by the engine; either
    // timestamp flavor is fine, but they must stay castable
    Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate").foreach {
      case (t, c) =>
        val dt = schemaOf(t)(c).dataType
        assert(dt == TimestampType || dt == TimestampNTZType || dt == DateType,
          s"$t.$c drifted to $dt")
        Tables(spark, sf, t).select(col(c).cast(DateType)).limit(1).collect()
    }
  }

  test("documents: text-pipeline contract") {
    assertCol("documents", "doc_id", LongType)
    assertCol("documents", "text", StringType)
    assertCol("documents", "lang", StringType)
    assertCol("documents", "source", StringType)
  }

  test("embeddings: ARRAY<FLOAT> vectors with stable ids") {
    assertCol("embeddings", "vec_id", LongType)
    assertCol("embeddings", "embedding", ArrayType(FloatType, containsNull = true))
    assertCol("embeddings", "label", IntegerType)
  }

  test("dimension tables: join-key types") {
    assertCol("region", "r_regionkey", IntegerType)
    assertCol("nation", "n_nationkey", IntegerType)
    assertCol("nation", "n_regionkey", IntegerType)
    assertCol("customer", "c_custkey", LongType)
    assertCol("customer", "c_nationkey", IntegerType)
    assertCol("supplier", "s_suppkey", LongType)
    assertCol("part", "p_partkey", LongType)
  }
}
