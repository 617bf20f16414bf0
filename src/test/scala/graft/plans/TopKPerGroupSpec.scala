package graft.plans

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def orders = graft.Tables(spark, TestSpark.sf, "orders")

  private def windowTop3 = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
  }

  private def nativeTop3 =
    TopKPerGroup.topK(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("o_custkey"), col("o_orderkey")).as[(Long, Long)].collect().toSet

  test("native top-k equals the window row_number formulation") {
    assert(asSet(nativeTop3) == asSet(windowTop3))
    assert(asSet(nativeTop3).nonEmpty)
  }

  test("plans as partial + final TopKPerGroupExec with one exchange, no Window/Sort") {
    val df = nativeTop3
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("TopKPerGroup")) == 2, plan)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Sort "), plan)
  }

  test("pre-partitioned input elides the exchange (zero-shuffle top-k)") {
    val pre = orders.repartition(8, col("o_custkey"))
    val df = TopKPerGroup.topK(pre, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // only the explicit repartition's exchange; none between the phases
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, plan)
    assert(asSet(df) == asSet(windowTop3))
  }

  test("partial-phase flush at tiny group budget does not change the result") {
    val prev = spark.conf.getOption("graft.topk.partialMaxGroups")
    spark.conf.set("graft.topk.partialMaxGroups", "2")
    try {
      val df = TopKPerGroup.topK(orders, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), 3)
      assert(asSet(df) == asSet(windowTop3))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.topk.partialMaxGroups", v)
        case None => spark.conf.unset("graft.topk.partialMaxGroups")
      }
    }
  }

  test("k larger than any group size returns every row") {
    val n = orders.count()
    val df = TopKPerGroup.topK(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), 1000000)
    assert(df.count() == n)
  }

  test("multi-column grouping and null ordering match the window form") {
    val data = Seq(
      ("a", Some(1), 10), ("a", Some(2), 20), ("a", None, 30),
      ("b", Some(1), 5), ("b", Some(1), 6), ("b", Some(1), 7), ("b", Some(1), 8),
      ("c", None, 1)
    ).toDF("g1", "g2", "v")
    val w = Window.partitionBy(col("g1")).orderBy(col("g2").asc_nulls_last, col("v").desc)
    val expected = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .as[(String, Option[Int], Int)].collect().toSet
    val got = TopKPerGroup.topK(data, Seq(col("g1")),
      Seq(col("g2").asc_nulls_last, col("v").desc), 2)
      .as[(String, Option[Int], Int)].collect().toSet
    assert(got == expected)
  }

  test("equals the window formulation for generated data and k (seeded)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // skewed group sizes, duplicate order values (tie-break matters),
    // and negative values; three k regimes (under/at/over group size)
    val genRow = for {
      g <- Gen.frequency((5, Gen.choose(0, 3)), (3, Gen.choose(4, 20)), (1, Gen.const(99)))
      v <- Gen.frequency((3, Gen.choose(-5, 5)), (1, Gen.const(0)))
      id <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (g, v, id)
    val rows = Gen.listOfN(3000, genRow)(Gen.Parameters.default, Seed(13L)).get
      .distinctBy(_._3) // unique tiebreak key
    import spark.implicits._
    val df = rows.toDF("g", "v", "id")
    for (k <- Seq(1, 3, 1000)) {
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val expected = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .as[(Int, Int, Long)].collect().toSet
      val got = TopKPerGroup.topK(df, Seq(col("g")),
        Seq(col("v").desc, col("id").asc), k)
        .as[(Int, Int, Long)].collect().toSet
      assert(got == expected, s"mismatch at k=$k")
    }
  }

  test("composes with downstream operators (filter + agg on top)") {
    val agg = nativeTop3.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).agg(max(col("n"))).as[Long].head()
    assert(agg <= 3)
  }
}
