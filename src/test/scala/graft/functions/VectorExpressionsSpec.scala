package graft.functions

import graft.TestSpark
import graft.functions.VectorFunctions.{vec_dot, vec_norm}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def emb = graft.Tables(spark, TestSpark.sf, "embeddings")

  test("FloatVecDot matches the higher-order-function fold bit-for-bit") {
    val hof = expr("aggregate(zip_with(embedding, embedding, " +
      "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val diff = emb
      .withColumn("a", vec_dot(col("embedding"), col("embedding")))
      .withColumn("b", hof)
      .filter(col("a") =!= col("b"))
      .count()
    assert(diff == 0)
  }

  test("LongVecSqDist matches the HOF fold exactly, from Column API and SQL") {
    val milli = expr(
      "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))")
    val pairs = emb.limit(50).select(col("vec_id"), milli.as("a"))
      .crossJoin(emb.limit(7).select(milli.as("b")))
    val hof = expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), " +
      "0L, (acc, v) -> acc + v)")
    assert(pairs
      .withColumn("n", VectorFunctions.vec_sqdist(col("a"), col("b")))
      .withColumn("h", hof)
      .filter(col("n") =!= col("h")).count() == 0)
    // SQL surface via GraftExtensions
    assert(pairs
      .withColumn("n", expr("vec_sqdist(a, b)"))
      .withColumn("h", hof)
      .filter(col("n") =!= col("h")).count() == 0)
    // self-distance is zero; non-long arrays rejected at analysis
    assert(pairs.filter(VectorFunctions.vec_sqdist(col("a"), col("a")) =!= 0L)
      .count() == 0)
    intercept[org.apache.spark.sql.AnalysisException] {
      emb.select(VectorFunctions.vec_sqdist(col("embedding"), col("embedding")))
        .collect()
    }
  }

  test("FloatVecDot null semantics: null input -> null output") {
    val r = emb.limit(1)
      .withColumn("nullvec", lit(null).cast("array<float>"))
      .select(vec_dot(col("embedding"), col("nullvec")).as("d"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("vec_norm is positive and consistent with self-dot") {
    val bad = emb
      .withColumn("n1", vec_norm(col("embedding")))
      .withColumn("n2", sqrt(vec_dot(col("embedding"), col("embedding"))))
      .filter(col("n1") =!= col("n2") || col("n1") <= 0)
      .count()
    assert(bad == 0)
  }

  test("interpreted eval path matches codegen (collect on non-codegen plan)") {
    // force interpreted path via eval on a literal-backed expression
    val a = org.apache.spark.sql.catalyst.expressions.Literal.create(
      Array(1.0f, 2.0f, 3.0f), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType))
    val d = FloatVecDot(a, a).eval(null)
    assert(d == (1.0 + 4.0 + 9.0))
  }

  test("vec_dot is available from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d").collect().head
    assert(r.getDouble(0) == 11.0)
  }

  test("q39 approx_count_distinct stays within the oracled 10% bound") {
    val rows = graft.operators.Relational.queries("q39_approx_distinct")(
      spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_ok"), r.toString))
  }

  test("vec_dot rejects non-float arrays at analysis time") {
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0, 2.0), array(3.0, 4.0))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array<float>"),
      s"expected analysis-time type error, got: ${err.getMessage.take(200)}")
  }
}
