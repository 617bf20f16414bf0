package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Analytics2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q(name: String) = Analytics2.queries(name)(spark, sf)

  test("q122 SCD2 intervals: per-user history is contiguous and covers every event") {
    val rows = q("q122_scd2_intervals").collect()
    val total = graft.Tables(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total,
      "every event must land in exactly one interval")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("valid_from").getTime)
      // exactly one open interval (valid_to NULL) per user — the current state
      assert(sorted.count(_.isNullAt(sorted.head.fieldIndex("valid_to"))) == 1)
      // each interval's valid_to is the next interval's valid_from (no gaps)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"))
        case _ => ()
      }
      // adjacent intervals never share a state (runs are maximal)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("state") != b.getAs[String]("state"))
        case _ => ()
      }
    }
  }

  test("q123 Markov transitions: counts conserve rows and shares sum to ~1e6") {
    val rows = q("q123_markov_transitions").collect()
    val nEvents = graft.Tables(spark, sf, "events").count()
    val nUsers = graft.Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    // every event except each user's first contributes one transition
    assert(rows.map(_.getAs[Long]("n")).sum == nEvents - nUsers)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Long]("micro_share")).sum
      // integer floor division loses < 1 unit per to_type
      assert(s <= 1000000L && s > 1000000L - rs.length)
    }
  }

  test("q124 histogram: buckets partition non-null values, ids in [0,9]") {
    val rows = q("q124_value_histogram").collect()
    val nonNull = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nonNull)
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b <= 9
    })
  }

  test("q125 inverted index: postings sorted ascending, bounded by 5, df honest") {
    val rows = q("q125_inverted_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      assert(df >= 5)
      val ids = r.getAs[String]("postings").split(',').map(_.toLong)
      assert(ids.length == math.min(df, 5L))
      assert(ids.sameElements(ids.sorted), "postings must be sorted by doc_id")
    }
  }

  test("q126 triangles: every emitted triple is a closed, id-oriented triangle") {
    val tris = q("q126_copurchase_triangles").collect()
    // rebuild the edge set the same way and verify closure + orientation
    val op = graft.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val edges = op.as("a").join(op.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select(col("p1"), col("p2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    tris.foreach { r =>
      val (a, b, c) = (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c"))
      assert(a < b && b < c, "triangles must be id-oriented (each counted once)")
      assert(edges((a, b)) && edges((b, c)) && edges((a, c)),
        "all three edges must exist in the thresholded graph")
    }
    // and no triangle is missed: count via plain Scala over the edge set
    val byLow = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val expected = edges.toSeq.flatMap { case (a, b) =>
      byLow.getOrElse(b, Set.empty[Long]).filter(c => edges((a, c))).map(c => (a, b, c))
    }.toSet
    assert(tris.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
      r.getAs[Long]("c"))).toSet == expected)
  }
}
