package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The scalable rank/cum-sum helpers must be value-identical to the
  * un-partitioned windows they replace (q138/q112) — the windows are
  * the semantics, the helpers only re-distribute the work.
  */
class ScalableRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalRowNumber equals the un-partitioned window row_number") {
    val df = graft.Tables(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val got = ScalableRank
      .globalRowNumber(df, "rk", col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("rk"))
      .as[(Long, Long)].collect().toMap
    val exp = df.withColumn("rk", row_number()
        .over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey")))
        .cast("long"))
      .select(col("o_orderkey"), col("rk"))
      .as[(Long, Long)].collect().toMap
    assert(got.size === exp.size)
    assert(got === exp)
  }

  test("globalRowNumber keeps ranks contiguous across partition seams") {
    val df = spark.range(0, 10007).select((col("id") * 37 % 10007).as("k"))
    val ranks = ScalableRank.globalRowNumber(df, "rk", col("k"))
      .select(col("rk")).as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 10007L))
  }

  test("groupedRowNumber equals the per-group window row_number") {
    // the q138/q128/q174 fusion shape: one relation ranked per tag by
    // different sort keys, with ties in the sort key (the custkey
    // tiebreak column must resolve them identically to the window)
    val df = graft.Tables(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_custkey"))
      .select(col("o_orderkey"), (col("o_custkey") % 7).as("tag"),
        (-col("o_totalprice")).as("ord"))
    val got = ScalableRank
      .groupedRowNumber(df, Seq("tag"), "rk", col("ord"), col("o_orderkey"))
      .select(col("tag"), col("o_orderkey"), col("rk"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val exp = df.withColumn("rk", row_number()
        .over(Window.partitionBy(col("tag"))
          .orderBy(col("ord"), col("o_orderkey"))).cast("long"))
      .select(col("tag"), col("o_orderkey"), col("rk"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.size === exp.size)
    assert(got === exp)
  }

  test("groupedRowNumber stitches one giant group split across every partition") {
    val df = spark.range(0, 10007)
      .select(lit(1).as("tag"), (col("id") * 37 % 10007).as("k"))
    val ranks = ScalableRank.groupedRowNumber(df, Seq("tag"), "rk", col("k"))
      .select(col("rk")).as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 10007L))
  }

  test("groupedCumSum stitches one giant group split across every partition") {
    // the whole point of the helper: a single group larger than any
    // one partition — offsets must chain exactly across the seams
    val df = spark.range(0, 50000)
      .select(lit("g").as("g"), col("id").cast("double").as("v"),
        (col("id") % 3 + 1).as("cnt"))
    val got = ScalableRank.groupedCumSum(df, Seq("g"), "v", "cnt", "cum", "n")
      .select(col("v"), col("cum"), col("n"))
      .as[(Double, Long, Long)].collect().sortBy(_._1)
    val total = (0L until 50000L).map(_ % 3 + 1).sum
    assert(got.length === 50000)
    assert(got.forall(_._3 == total))
    var running = 0L
    got.foreach { case (v, cum, _) =>
      running += v.toLong % 3 + 1
      assert(cum === running, s"cum broken at v=$v")
    }
  }

  test("layoutGuard trips on a violated id-layout assumption, is silent when it holds") {
    // silent path: contributes exactly 0 to the offset arithmetic
    val ok = spark.range(1)
      .select(ScalableRank.layoutGuard(lit(7L), lit(7L)).as("g"))
      .as[Long].collect()
    assert(ok.toSeq === Seq(0L))
    // violated path: the query must FAIL, not mis-rank
    val e = intercept[Exception] {
      spark.range(1)
        .select(ScalableRank.layoutGuard(lit(7L), lit(6L)).as("g"))
        .collect()
    }
    assert(e.getMessage.contains("monotonically_increasing_id"),
      s"guard must name the violated assumption: ${e.getMessage}")
  }

  test("globalRowNumber carries the layout guard wherever the rank is consumed") {
    val df = graft.Tables(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val ranked = ScalableRank
      .globalRowNumber(df, "rk", col("o_totalprice").desc, col("o_orderkey"))
    ranked.collect()
    // assert_true desugars to if(cond, null, raise_error) in the plan
    val plan = ranked.queryExecution.executedPlan.toString
    assert(plan.contains("raise_error"),
      s"layout guard was optimized out of the plan:\n${plan.take(1500)}")
    // if the caller DROPS the rank column, pruning the guard with it is
    // correct (no rank consumed → nothing to mis-rank); the contract is
    // only that a consumed rank is a guarded rank
    val pruned = ranked.select(col("o_orderkey"))
    pruned.collect()
    assert(!pruned.queryExecution.executedPlan.toString.contains("raise_error"))
  }

  test("groupedCumSum replaces the corpus window with a pre-aggregated slice shuffle") {
    val hist = graft.Tables(spark, TestSpark.sf, "lineitem")
      .groupBy(col("l_returnflag").as("g"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val out = ScalableRank.groupedCumSum(hist, Seq("g"), "v", "cnt", "cum", "n")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the r6-ADVICE exchange was a WINDOW clustered on (_srk_pid, g):
    // a full re-shuffle of the relation because windows cannot
    // partial-aggregate. The per-partition scan replaces it, so no
    // window over _srk_pid may remain...
    assert(!plan.contains("windowspecdefinition(_srk_pid"),
      s"intra-chunk cum-sum still windows on (_srk_pid, group):\n${plan.take(1500)}")
    // ...and the surviving (_srk_pid, g) exchange is the slice
    // aggregate, which MUST be two-phase: map-side partials collapse
    // each partition to its O(groups-per-partition) slice rows before
    // the shuffle, so the exchange carries slices, not the corpus.
    assert(plan.contains("partial_sum"),
      s"slice aggregate lost its map-side partial phase:\n${plan.take(1500)}")
  }

  test("groupedCumSums carries two weights through one pass, equal to two window stacks") {
    val hist = graft.Tables(spark, TestSpark.sf, "lineitem")
      .groupBy(col("l_returnflag").as("g"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("ca"),
        sum(when(col("l_orderkey") % 2 === 0, 1L).otherwise(0L)).as("cb"))
    val got = ScalableRank.groupedCumSums(hist, Seq("g"), "v",
        Seq("ca", "cb"), Seq("cuma", "cumb"), Seq("na", "nb"))
      .select(col("g"), col("v"), col("cuma"), col("cumb"), col("na"), col("nb"))
      .as[(String, Double, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("g"))
    val exp = hist
      .withColumn("cuma", sum(col("ca")).over(wCum))
      .withColumn("cumb", sum(col("cb")).over(wCum))
      .withColumn("na", sum(col("ca")).over(wAll))
      .withColumn("nb", sum(col("cb")).over(wAll))
      .select(col("g"), col("v"), col("cuma"), col("cumb"), col("na"), col("nb"))
      .as[(String, Double, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(got.size === exp.size)
    assert(got === exp)
  }

  test("property: random skewed datasets match the window forms (rank + cum-sums)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // group-size skew (one giant group, several small, singletons),
    // duplicate order values ACROSS groups (range boundaries land on
    // ties), zero weights, and weights near Int.MaxValue (sum overflow
    // into Long territory must stay exact)
    val genRow = for {
      g <- Gen.frequency((6, Gen.const(0)), (3, Gen.choose(1, 8)),
        (1, Gen.choose(9, 200)))
      v <- Gen.frequency((4, Gen.choose(0L, 40L)), (1, Gen.const(7L)))
      w <- Gen.frequency((5, Gen.choose(0L, 9L)),
        (1, Gen.const(Int.MaxValue.toLong)))
    } yield (g, v, w)
    for (seed <- Seq(1L, 42L)) {
      val rows = Gen.listOfN(4000, genRow)(Gen.Parameters.default, Seed(seed)).get
      import spark.implicits._
      // collapse to unique (g, v): the cum-sum contract is defined on
      // unique keys (callers feed histograms / unique-ordered rows)
      val hist = rows.toDF("g", "v", "w")
        .groupBy(col("g"), col("v")).agg(sum(col("w")).as("w"))
      val got = ScalableRank.groupedCumSum(hist, Seq("g"), "v", "w", "cum", "n")
        .select(col("g"), col("v"), col("cum"), col("n"))
        .as[(Int, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val exp = hist
        .withColumn("cum", sum(col("w")).over(wCum))
        .withColumn("n", sum(col("w")).over(Window.partitionBy(col("g"))))
        .select(col("g"), col("v"), col("cum"), col("n"))
        .as[(Int, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(got === exp, s"groupedCumSum diverged at seed=$seed")
      // rank side: unique total order via a DERIVED id tiebreak
      // ((g, v) is unique post-collapse, so this is injective and —
      // unlike monotonically_increasing_id — identical across the
      // two independent materializations below)
      val ranked = hist.withColumn("id", col("g") * 1000000L + col("v"))
      val gotRk = ScalableRank
        .globalRowNumber(ranked, "rk", col("v"), col("g"), col("id"))
        .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
      val expRk = ranked.withColumn("rk", row_number()
          .over(Window.orderBy(col("v"), col("g"), col("id"))).cast("long"))
        .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
      assert(gotRk === expRk, s"globalRowNumber diverged at seed=$seed")
    }
  }

  test("groupedCumSum equals the per-group running-sum + total windows") {
    val hist = graft.Tables(spark, TestSpark.sf, "lineitem")
      .groupBy(col("l_returnflag").as("g"), col("l_quantity").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val got = ScalableRank
      .groupedCumSum(hist, Seq("g"), "v", "cnt", "cum", "n")
      .select(col("g"), col("v"), col("cum"), col("n"))
      .as[(String, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("g"))))
      .select(col("g"), col("v"), col("cum"), col("n"))
      .as[(String, Double, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.size === exp.size)
    assert(got === exp)
  }
}
