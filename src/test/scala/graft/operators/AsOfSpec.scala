package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("asofJoin matches a brute-force computation on sampled keys") {
    import spark.implicits._
    val got = AsOf.queries("q53_asof_join")(spark, sf)
      .filter(col("event_id") < 200)
      .select(col("event_id"), col("user_id"), col("last_orderkey"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // brute force from collected tables
    val events = graft.Tables(spark, sf, "events")
      .filter(col("event_id") < 200)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("tm"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    events.foreach { case (eid, uid, ts) =>
      val expect = orders.getOrElse(uid, Array.empty[(Long, Long, Long)])
        .filter(_._2 <= ts)
        .sortBy(o => (o._2, o._3))
        .lastOption.map(_._3).getOrElse(-1L)
      assert(got(eid) == expect, s"event $eid user $uid")
    }
  }

  test("asofJoin keeps left rows with no prior right row (null fill)") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("id", "t", "x")
    val r = Seq((1L, 7L, "r7"), (1L, 9L, "r9"), (3L, 1L, "zz")).toDF("id", "rt", "y")
      .select(col("id"), col("rt").as("t2"), col("y"))
    val out = AsOf.asofJoin(
      l, "id", "t",
      r.select(col("id").as("rid"), col("t2"), col("y")), "rid", "t2")
      .select(col("id"), col("t"), col("y")).collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) null else row.getString(2))).toSet
    // id=1 at t=10 → most recent right is r9; id=2 has no right rows → null
    assert(out == Set((1L, 10L, "r9"), (2L, 5L, null)))
  }

  test("asofJoin is inclusive at equal timestamps") {
    import spark.implicits._
    val l = Seq((1L, 7L, "a")).toDF("id", "t", "x")
    val r = Seq((1L, 7L, "exact")).toDF("rid", "t2", "y")
    val out = AsOf.asofJoin(l, "id", "t", r, "rid", "t2")
      .select(col("y")).collect().head.getString(0)
    assert(out == "exact")
  }
}
