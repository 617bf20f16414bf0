package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parameterized SQL (`spark.sql(text, args)`) — the injection-safe
  * templating surface (Spark 3.4+): named and positional markers bind
  * TYPED literals at analysis, so callers never splice strings into
  * query text. Pinned against the literal-inlined equivalents.
  */
class ParameterizedSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("named parameter markers bind typed values (:qty, :flag)") {
    graft.Tables(spark, sf, "lineitem").createOrReplaceTempView("psql_li")
    val param = spark.sql(
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        |FROM psql_li WHERE l_quantity >= :qty AND l_returnflag = :flag""".stripMargin,
      Map("qty" -> 30, "flag" -> "A")).collect()
    val inlined = spark.sql(
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        |FROM psql_li WHERE l_quantity >= 30 AND l_returnflag = 'A'""".stripMargin)
      .collect()
    assert(param.toSeq === inlined.toSeq)
    assert(param.head.getLong(0) > 0)
  }

  test("positional parameter markers (?) bind in order") {
    val got = spark.sql("SELECT ? + ? AS s, upper(?) AS u",
      Array(2, 40, "ok")).collect().head
    assert(got.getInt(0) === 42 && got.getString(1) === "OK")
  }
}
