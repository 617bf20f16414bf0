package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Remaining scalar/collection API surface from SURVEY §2.2 that the
  * oracle queries don't explicitly pin: map functions, unionByName
  * with missing columns, null-safe equality.
  */
class MiscFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q192: null bucket matches via <=> and typed-null field counts zero") {
    val rows = Relational2.queries("q192_json_null_safe")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("n_missing")))).toMap
    // every dim row (incl. the NULL key) must have matched something
    assert(rows.keySet === (Set("none") ++ (1 to 9).map(i => s"b$i")))
    // 'none' = events whose json k is a multiple of 10 — the rows a
    // plain = join would silently drop
    val expectedNone = graft.Tables(spark, TestSpark.sf, "events")
      .filter(expr("get_json_object(props, '$.k') % 10 = 0")).count()
    assert(rows("none")._1 === expectedNone)
    // the schema's absent field is typed null everywhere
    assert(rows.values.forall(_._2 === 0L))
  }

  test("collations: UTF8_LCASE compares and groups case-insensitively") {
    import spark.implicits._
    val df = Seq("Spark", "spark", "SPARK", "duck").toDF("s")
    // grouping under the collation merges case variants
    val groups = df.groupBy(expr("collate(s, 'UTF8_LCASE')").as("k"))
      .count().as[(String, Long)].collect().toMap
    assert(groups.size === 2)
    assert(groups.values.toSeq.sorted === Seq(1L, 3L))
    // comparison under the collation is case-insensitive; binary is not
    assert(df.filter(expr("s = collate('SPARK', 'UTF8_LCASE')")).count() === 3)
    assert(df.filter($"s" === "SPARK").count() === 1)
    assert(spark.sql("SELECT collation(collate('x', 'UTF8_LCASE'))")
      .head().getString(0).toUpperCase.contains("UTF8_LCASE"))
  }

  test("map functions over JSON-decoded props (map_keys/values/concat/explode)") {
    val ev = graft.Tables(spark, TestSpark.sf, "events").limit(100)
      .withColumn("m", from_json(col("props"), MapType(StringType, IntegerType)))
    val row = ev
      .select(
        map_keys(col("m")).as("ks"),
        map_values(col("m")).as("vs"),
        map_concat(col("m"), map(lit("extra"), lit(1))).as("m2"),
        element_at(col("m"), "k").as("k_val"))
      .collect()
    row.foreach { r =>
      assert(r.getAs[scala.collection.Seq[String]]("ks").toSeq == Seq("k"))
      assert(r.getAs[scala.collection.Seq[Int]]("vs").head == r.getAs[Int]("k_val"))
      assert(r.getAs[Map[String, Int]]("m2").keySet == Set("k", "extra"))
    }
    // generator over map entries
    val exploded = ev.select(explode(col("m")).as(Seq("key", "value")))
    assert(exploded.count() == 100)
    assert(exploded.filter(col("key") === "k").count() == 100)
  }

  test("unionByName with allowMissingColumns null-fills the narrower side") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "name")
    val b = Seq((2L, 9.5)).toDF("id", "score")
    val u = a.unionByName(b, allowMissingColumns = true)
    assert(u.columns.toSet == Set("id", "name", "score"))
    assert(u.count() == 2)
    assert(u.filter(col("name").isNull).count() == 1)
    assert(u.filter(col("score").isNull).count() == 1)
  }

  test("null-safe equality (<=>) vs plain equality on null keys") {
    import spark.implicits._
    val l = Seq((Some(1), "a"), (None, "b")).toDF("k", "lv")
    val r = Seq((Some(1), "x"), (None, "y")).toDF("k2", "rv")
    val plain = l.join(r, col("k") === col("k2")).count()
    val nullSafe = l.join(r, col("k") <=> col("k2")).count()
    assert(plain == 1, "null keys never match with =")
    assert(nullSafe == 2, "null <=> null matches")
  }

  test("sequence/slice/zip_with array edge cases") {
    val r = spark.range(1).select(
      sequence(lit(1), lit(5)).as("s"),
      slice(sequence(lit(1), lit(5)), 2, 2).as("mid"),
      zip_with(sequence(lit(1), lit(3)), sequence(lit(4), lit(6)),
        (a, b) => a * b).as("prod"))
      .collect().head
    assert(r.getAs[scala.collection.Seq[Long]]("s").toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.getAs[scala.collection.Seq[Long]]("mid").toSeq == Seq(2L, 3L))
    assert(r.getAs[scala.collection.Seq[Long]]("prod").toSeq == Seq(4L, 10L, 18L))
  }
}
