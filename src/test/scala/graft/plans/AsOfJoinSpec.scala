package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def events = graft.Tables(spark, TestSpark.sf, "events")
    .select(col("event_id"), col("user_id"), col("ts"))
  private def orders = graft.Tables(spark, TestSpark.sf, "orders")
    .groupBy(col("o_custkey"), col("o_orderdate"))
    .agg(max(col("o_orderkey")).as("o_orderkey"))

  private def asPairs(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("o_orderkey"))
      .as[(Long, Option[Long])].collect().toSet

  test("native as-of equals the declarative union+window composition") {
    // restrict orders to a key subset so some users have no order at
    // all — both merge branches (match and null-extend) exercised
    val lateOrders = orders.filter(col("o_custkey") % 3 === 0)
    val native = AsOfJoin.asofJoinNative(
      events, "user_id", "ts", lateOrders, "o_custkey", "o_orderdate")
    val composed = graft.operators.AsOf.asofJoin(
      events, "user_id", "ts", lateOrders, "o_custkey", "o_orderdate")
    val pairs = asPairs(native)
    assert(pairs == asPairs(composed))
    assert(pairs.exists(_._2.isEmpty) && pairs.exists(_._2.nonEmpty))
  }

  test("forward as-of equals an independent min-over-future recompute") {
    // next order strictly after each order (left time = date + 1 s);
    // fixture events can't drive this — they all postdate every order
    val lft = graft.Tables(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey").as("orderkey"),
        col("o_custkey").as("custkey"),
        expr("CAST(o_orderdate AS TIMESTAMP) + INTERVAL 1 SECOND").as("after_ts"))
    val native = AsOfJoin.asofJoinNative(
      lft, "custkey", "after_ts", orders, "o_custkey", "o_orderdate",
      forward = true)
      .select(col("orderkey"), col("o_orderkey"))
      .as[(Long, Option[Long])].collect().toSet
    val l = lft.selectExpr("orderkey", "custkey", "unix_micros(after_ts)")
      .as[(Long, Long, Long)].collect()
    val ord = orders
      .selectExpr("o_custkey",
        "unix_micros(CAST(o_orderdate AS TIMESTAMP))", "o_orderkey")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1)
    val expected = l.map { case (oid, uid, t) =>
      val next = ord.getOrElse(uid, Array.empty)
        .filter(_._2 >= t).sortBy(o => (o._2, o._3)).headOption
      (oid, next.map(_._3))
    }.toSet
    assert(native === expected)
    assert(expected.exists(_._2.isEmpty) && expected.exists(_._2.nonEmpty))
  }

  test("forward hand-built edges: exact-time inclusivity, shared match, null fill") {
    val l = Seq((1L, 1L, 10L), (2L, 1L, 10L), (3L, 1L, 25L), (4L, 2L, 5L))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((1L, 10L, 100L), (1L, 20L, 101L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    val got = AsOfJoin.asofJoinNative(
      l, "user_id", "ts", r, "o_custkey", "o_orderdate", forward = true)
      .select(col("event_id"), col("o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(100L)) // rTime == lTime is a match
    assert(got(2L) === Some(100L)) // same match serves a second left row
    assert(got(3L) === None)       // nothing at-or-after 25
    assert(got(4L) === None)       // key with no right rows
  }

  // plan-shape tests use a raw (unaggregated) right side so the only
  // exchanges in the plan belong to the join itself
  private def rawOrders = graft.Tables(spark, TestSpark.sf, "orders")
    .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))

  test("plans AsOfJoinExec with one exchange + sort per side, no Window") {
    val df = AsOfJoin.asofJoinNative(
      events, "user_id", "ts", rawOrders, "o_custkey", "o_orderdate")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(1200))
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1200))
    assert(plan.linesIterator.count(_.contains("Sort ")) == 2, plan.take(1500))
  }

  test("pre-partitioned sides join with no additional exchange") {
    val l = events.repartition(8, col("user_id"))
    val r = rawOrders.repartition(8, col("o_custkey"))
    val df = AsOfJoin.asofJoinNative(l, "user_id", "ts", r, "o_custkey", "o_orderdate")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // only the two explicit repartitions — EnsureRequirements adds none
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2,
      plan.take(1500))
    assert(!plan.contains("ENSURE_REQUIREMENTS"), plan.take(1500))
  }

  test("hand-built edges: staleness, exact-time inclusivity, null keys, duplicate times") {
    val l = Seq(
      (1L, 10L, "a"),   // after r@5 -> match 5
      (1L, 5L, "b"),    // exactly at r@5 -> inclusive match 5
      (1L, 4L, "c"),    // before any right -> null
      (2L, 100L, "d"),  // key with no right rows -> null
      (3L, 7L, "e"))    // duplicate right times: sort-last wins
      .toDF("k", "t", "tag")
    val lNull = Seq((Option.empty[Long], 50L, "z")).toDF("k", "t", "tag")
    val r = Seq(
      (1L, 5L, "r5"),
      (1L, 9L, "r9"),
      (3L, 7L, "x1"),
      (3L, 7L, "x2"))
      .toDF("rk", "rt", "payload")
    val out = AsOfJoin.asofJoinNative(
      l.unionByName(lNull.select(col("k").cast("long"), col("t"), col("tag"))),
      "k", "t", r, "rk", "rt")
      .select(col("tag"), col("payload"))
      .as[(String, Option[String])].collect().toMap
    assert(out("a") == Some("r9")) // greatest rt <= 10
    assert(out("b") == Some("r5")) // inclusive at equal time
    assert(out("c") == None)
    assert(out("d") == None)
    assert(out("e") == Some("x2")) // duplicate (key,time): sort-last wins
    assert(out("z") == None)       // null key matches nothing
  }

  test("null times never match, identically in both directions") {
    val l = Seq(
      (1L, 1L, Some(10L)), // normal: matches the ts=5 right row backward
      (2L, 1L, None),      // null left time -> null-extend, both modes
      (3L, 2L, Some(10L))) // key whose only right rows have null time
      .toDF("event_id", "user_id", "ts")
    val r = Seq(
      (1L, Some(5L), 100L),
      (1L, Option.empty[Long], 99L), // null right time: never a match
      (2L, Option.empty[Long], 98L))
      .toDF("o_custkey", "o_orderdate", "o_orderkey")
    for (fwd <- Seq(false, true)) {
      val got = AsOfJoin.asofJoinNative(
        l, "user_id", "ts", r, "o_custkey", "o_orderdate", forward = fwd)
        .select(col("event_id"), col("o_orderkey"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got(2L) === None, s"null left time must null-extend (forward=$fwd)")
      assert(got(3L) === None, s"null right times must never match (forward=$fwd)")
    }
    val back = AsOfJoin.asofJoinNative(
      l, "user_id", "ts", r, "o_custkey", "o_orderdate")
      .select(col("event_id"), col("o_orderkey"))
      .as[(Long, Option[Long])].collect().toMap
    assert(back(1L) === Some(100L)) // the non-null row still matches
  }
}
