package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LongTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("heap aggregate equals sort-desc-take-k across many partitions") {
    // adversarial distribution: duplicates, negatives, skewed groups
    val data = (0 until 5000).map { i =>
      (s"g${i % 7}", ((i * 2654435761L) % 1000L) - 500L)
    }
    val df = spark.createDataset(data).toDF("g", "v").repartition(16)
    val got = df.groupBy($"g").agg(LongTopK.column($"v", 5).as("top5"))
      .as[(String, Seq[Long])].collect().toMap
    val expected = data.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).sorted(Ordering[Long].reverse).take(5)
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (g, top) => assert(got(g) === top, s"group $g") }
  }

  test("group smaller than k returns all values, still descending") {
    val df = Seq(("a", 3L), ("a", 9L), ("b", 1L)).toDF("g", "v")
    val got = df.groupBy($"g").agg(LongTopK.column($"v", 10).as("t"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got("a") === Seq(9L, 3L))
    assert(got("b") === Seq(1L))
  }

  test("nulls are skipped like built-in aggregates") {
    val df = Seq(("a", Some(5L)), ("a", None), ("a", Some(7L)))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(LongTopK.column($"v", 2).as("t"))
      .as[(String, Seq[Long])].head()
    assert(got._2 === Seq(7L, 5L))
  }

  test("SQL surface: graft_topk registered by GraftExtensions") {
    Seq((1L, 10L), (1L, 30L), (1L, 20L), (2L, 5L))
      .toDF("g", "v").createOrReplaceTempView("topk_spec_in")
    val rows = spark.sql(
      "SELECT g, graft_topk(v, 2) AS t FROM topk_spec_in GROUP BY g")
      .as[(Long, Seq[Long])].collect().toMap
    assert(rows(1L) === Seq(30L, 20L))
    assert(rows(2L) === Seq(5L))
    spark.catalog.dropTempView("topk_spec_in")
  }

  test("serialize/deserialize roundtrip preserves heap contents under the cap") {
    val agg = LongTopK(Literal(0L), Literal(3))
    val heap = agg.createAggregationBuffer()
    Seq(5L, 1L, 9L, 7L, 3L).foreach { v =>
      // mirror add() through merge with a singleton heap
      val single = agg.createAggregationBuffer(); single.enqueue(v)
      agg.merge(heap, single)
    }
    val restored = agg.deserialize(agg.serialize(heap))
    def drain(h: mutable.PriorityQueue[Long]) = h.toArray.sorted.toSeq
    assert(drain(restored) === drain(heap))
    assert(drain(restored) === Seq(5L, 7L, 9L))
  }

  test("q189 equals the window-function formulation on real data") {
    val sf = TestSpark.sf
    val native = graft.operators.Relational3.queries("q189_native_topk_agg")(spark, sf)
      .as[(String, Int, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"l_returnflag")
      .orderBy(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)").desc)
    val window = graft.Tables(spark, sf, "lineitem")
      .withColumn("cents",
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5)
      .select($"l_returnflag", ($"rn" - 1).cast("int").as("rk"), $"cents")
      .as[(String, Int, Long)].collect().toSet
    assert(native === window)
  }
}
