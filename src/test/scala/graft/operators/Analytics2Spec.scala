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

  test("q188 clustering coefficient: bounds, corner-count parity with q126, degree floor") {
    val rows = q("q188_clustering_coeff").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("deg") >= 2L)
      val cm = r.getAs[Long]("coeff_micro")
      assert(cm >= 0L && cm <= 1000000L, s"coefficient out of [0,1]: $cm")
    }
    // per-node triangle counts must equal corner frequencies in q126's listing
    val tri = q("q126_copurchase_triangles").collect()
      .flatMap(r => Seq(r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("c")))
      .groupBy(identity).map { case (v, xs) => v -> xs.length.toLong }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tri") === tri.getOrElse(r.getAs[Long]("pk"), 0L))
    }
  }

  test("trianglesOf: degree and id orientation enumerate the identical triangle set") {
    import spark.implicits._
    // deterministic 60-node graph with a mid-id hub (node 30 joined to
    // everything) — a shape where the two orientations pick genuinely
    // different wedge paths — plus a pseudo-random edge sprinkle
    val sprinkle = for {
      i <- 0L until 60L; j <- (i + 1) until 60L
      if (i * 31 + j * 17) % 7 < 2
    } yield (i, j)
    val hub = (0L until 60L).filter(_ != 30L)
      .map(v => (math.min(v, 30L), math.max(v, 30L)))
    val edges = (sprinkle ++ hub).distinct.toDF("p1", "p2")
    def setOf(byDegree: Boolean) =
      Analytics2.trianglesOf(edges, byDegree).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val (byDeg, byId) = (setOf(true), setOf(false))
    assert(byDeg == byId, "orientation changed the triangle set")
    assert(byDeg.nonEmpty)
    byDeg.foreach { case (a, b, c) => assert(a < b && b < c) }
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

  test("q127 association rules: confidence/lift identities hold exactly") {
    val rows = q("q127_association_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nPair, nA, nB) = (r.getAs[Long]("n_pair"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(nPair >= 2 && nPair <= math.min(nA, nB),
        "pair support cannot exceed either item's support")
      assert(r.getAs[Long]("conf_ab_micro") == nPair * 1000000L / nA)
      assert(r.getAs[Long]("conf_ba_micro") == nPair * 1000000L / nB)
      assert(r.getAs[Long]("conf_ab_micro") <= 1000000L)
    }
  }

  test("q128 RRF fusion: 20 rows, scores consistent with rank arithmetic") {
    val rows = q("q128_rrf_fusion").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (rr, rq) = (r.getAs[Long]("r_rev"), r.getAs[Long]("r_qty"))
      assert(r.getAs[Long]("rrf_micro") ==
        1000000L / (60 + rr) + 1000000L / (60 + rq))
    }
    val scores = rows.map(_.getAs[Long]("rrf_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "output must be ordered by fused score descending")
  }

  test("q129 rolling distinct: u7 >= same-day distinct, covers every active day") {
    val daily = graft.Tables(spark, sf, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("u1"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val rows = q("q129_rolling_distinct").collect()
    assert(rows.map(_.getDate(0).toString).toSet == daily.keySet,
      "one output row per observed day, no spill past the calendar")
    rows.foreach { r =>
      assert(r.getAs[Long]("u7") >= daily(r.getDate(0).toString),
        "a 7-day window can never have fewer users than its last day")
    }
  }

  test("q130 ntile bins: quartiles partition rows near-evenly, ranges nest") {
    val rows = q("q130_ntile_binning").collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("quartile")).sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      val ns = rs.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, "ntile bins differ by at most one row")
      val ordered = rs.sortBy(_.getAs[Long]("quartile"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("vmax") <= b.getAs[Double]("vmin"),
            "quartile value ranges must be non-overlapping and ordered")
        case _ => ()
      }
    }
  }

  test("q131 repetition scores: bounded by 1e6 and consistent with direct recompute") {
    val rows = q("q131_repetition_quality").collect()
    assert(rows.length == graft.Tables(spark, sf, "documents").count())
    rows.foreach { r =>
      Seq("distinct_micro", "top_unigram_micro", "top_bigram_micro").foreach { c =>
        val v = r.getAs[Long](c); assert(v > 0 && v <= 1000000L, s"$c=$v")
      }
    }
    // spot-check one doc against a plain-Scala recompute
    val doc = graft.Tables(spark, sf, "documents")
      .filter(col("doc_id") === 7L).select(col("text")).collect().head.getString(0)
    val toks = doc.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
    val r7 = rows.find(_.getAs[Long]("doc_id") == 7L).get
    assert(r7.getAs[Long]("n_tok") == toks.length)
    assert(r7.getAs[Long]("distinct_micro") ==
      toks.distinct.length.toLong * 1000000L / toks.length)
    assert(r7.getAs[Long]("top_unigram_micro") ==
      toks.groupBy(identity).values.map(_.length).max.toLong * 1000000L / toks.length)
    assert(r7.getAs[Long]("top_bigram_micro") ==
      bigrams.groupBy(identity).values.map(_.size).max.toLong * 1000000L /
        (toks.length - 1))
  }

  test("q132 attribution: per-purchase credit never exceeds 1e6, counts conserve") {
    val rows = q("q132_attribution").collect()
    assert(rows.nonEmpty)
    // total credit distributed <= 1e6 per attributed purchase (floor
    // division loses < n_t units per purchase, never gains)
    val purchases = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    val totCredit = rows.map(_.getAs[Long]("credit_micro")).sum
    assert(totCredit <= purchases * 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_purchases") <= r.getAs[Long]("n_touches"))
    }
  }

  test("q133 seasonal anomalies: every emitted cell is >= 2x its baseline mean") {
    val rows = q("q133_seasonal_anomaly").collect()
    rows.foreach { r =>
      val ratio = r.getAs[Long]("ratio_micro")
      assert(ratio >= 2000000L)
      assert(r.getAs[Long]("actual") <= r.getAs[Long]("total"))
    }
  }

  test("q134 skew profile: frequency buckets partition the key space") {
    val rows = q("q134_skew_profile").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val nKeys = r.getAs[Long]("n_keys")
      val bucketSum = r.getAs[Long]("keys_f1") + r.getAs[Long]("keys_f2_9") +
        r.getAs[Long]("keys_f10_99") + r.getAs[Long]("keys_f100p")
      assert(bucketSum == nKeys, "every key falls in exactly one freq bucket")
      assert(r.getAs[Long]("max_freq") * 1000000L / r.getAs[Long]("n_rows") ==
        r.getAs[Long]("top_share_micro"))
      assert(r.getAs[Long]("n_rows") >= nKeys)
    }
  }

  test("q135 dataset split: covers every doc, close to 80/10/10, reproducible") {
    val rows = q("q135_dataset_split").collect()
    val total = graft.Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    val byName = rows.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(byName.keySet == Set("train", "val", "test"))
    val trainFrac = byName("train").toDouble / total
    assert(trainFrac > 0.7 && trainFrac < 0.9, s"train fraction $trainFrac")
    // determinism: a second run partitions identically
    val again = q("q135_dataset_split").collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
    assert(again == byName)
  }

  test("q136 user growth: cumulative base is monotone and balances new+returning") {
    val rows = q("q136_user_growth").collect().sortBy(_.getDate(0).getTime)
    val totalUsers = graft.Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.last.getAs[Long]("cum_users") == totalUsers,
      "the final cumulative base must equal the distinct-user universe")
    var cum = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ==
        r.getAs[Long]("n_new") + r.getAs[Long]("n_returning"))
      cum += r.getAs[Long]("n_new")
      assert(r.getAs[Long]("cum_users") == cum, "cumulative must be exact prefix sum")
    }
  }

  test("q137 churn segments: users partition exactly across segments") {
    val rows = q("q137_churn_segments").collect()
    val totalUsers = graft.Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == totalUsers)
    assert(rows.map(_.getAs[String]("segment")).toSet
      .subsetOf(Set("active", "cooling", "churned")))
  }

  test("q138 RFM: codes well-formed, customers partition, quartiles near-even") {
    val rows = q("q138_rfm_segments").collect()
    val nCust = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    rows.foreach { r =>
      val code = r.getAs[Int]("segment")
      val (rr, ff, mm) = (code / 100, code / 10 % 10, code % 10)
      assert(Seq(rr, ff, mm).forall(x => x >= 1 && x <= 4), s"bad code $code")
    }
    // each R quartile holds ~nCust/4 customers (ntile evenness)
    val byR = rows.groupBy(_.getAs[Int]("segment") / 100)
      .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum)
    byR.values.foreach(n => assert(math.abs(n - nCust / 4) <= 1))
  }

  test("q139 TVD: symmetric-free pair list, bounded by 1e6, self-distance absent") {
    val rows = q("q139_source_divergence").collect()
    val nSources = graft.Tables(spark, sf, "documents")
      .select(col("source")).distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2,
      "exactly one row per unordered source pair")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("src1"), r.getAs[String]("src2"))
      assert(a < b, "pairs must be canonically ordered")
      val tvd = r.getAs[Long]("tvd_micro")
      assert(tvd >= 0 && tvd <= 1000000L)
    }
  }

  test("q140 embedding drift: one row per dimension, drift matches sum arithmetic") {
    val rows = q("q140_embedding_drift").collect()
    val dim = graft.Tables(spark, sf, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    assert(rows.length == dim, "one output row per embedding dimension")
    assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq == (0L until dim.toLong))
    val nEven = graft.Tables(spark, sf, "embeddings")
      .filter(col("vec_id") % 2 === 0).count()
    val nOdd = graft.Tables(spark, sf, "embeddings")
      .filter(col("vec_id") % 2 === 1).count()
    rows.foreach { r =>
      // Spark `div` and DuckDB `//` both truncate toward zero on
      // negatives (verified against both engines), as does Java's /
      val expected = math.abs(
        r.getAs[Long]("s_even") * 1000L / nEven -
          r.getAs[Long]("s_odd") * 1000L / nOdd)
      assert(r.getAs[Long]("drift_milli_x1000") == expected)
    }
  }

  test("q141 exact percentiles: ordered, p50 equals a plain-Scala recompute") {
    val rows = q("q141_exact_percentiles").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"))
      assert(r.getAs[Double]("p90") <= r.getAs[Double]("p99"))
      assert(r.getAs[Double]("p99") <= r.getAs[Double]("p100"))
    }
    val vals = graft.Tables(spark, sf, "events")
      .filter(col("value").isNotNull && col("event_type") === "click")
      .select(col("value"), col("event_id")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sortBy(identity).map(_._1)
    val n = vals.length
    val r = rows.find(_.getAs[String]("event_type") == "click").get
    assert(r.getAs[Long]("n_rows") == n)
    assert(r.getAs[Double]("p50") == vals((n + 1) / 2 - 1),
      "p50 must be the lower-median order statistic")
    assert(r.getAs[Double]("p90") == vals(n * 9 / 10 - 1))
  }

  test("q142 incremental SCD2 merge equals the q122 full rebuild row-for-row") {
    val full = q("q122_scd2_intervals").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")),
        r.getAs[Long]("n_events"))).toSet
    val merged = q("q142_scd2_merge").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")),
        r.getAs[Long]("n_events"))).toSet
    assert(merged == full,
      "merging the delta into the old snapshot must equal recomputing from scratch")
  }

  test("q144 BPE: all 10 distributed merge decisions match a plain-Scala trainer") {
    val got = q("q144_bpe_merges").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("left_tok"),
        r.getAs[String]("right_tok"), r.getAs[Long]("weight"))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to 10))
    // reference implementation: greedy BPE on the word-type table
    var reprs: Map[Vector[String], Long] = graft.Tables(spark, sf, "documents")
      .select(col("text")).collect().iterator
      .flatMap(_.getString(0).toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .toSeq.groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong
      }
    (1 to 10).foreach { step =>
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      reprs.foreach { case (toks, f) =>
        toks.sliding(2).foreach {
          case Vector(a, b) =>
            pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      val ((a, b), w) = pairCounts.toSeq
        .minBy { case ((x, y), n) => (-n, x, y) }
      assert(got(step - 1) == ((step, a, b, w)),
        s"step $step: engine chose ${got(step - 1)}, reference chose ($step,$a,$b,$w)")
      // apply the merge left-to-right non-overlapping
      reprs = reprs.toSeq.map { case (toks, f) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += a + b; i += 2
          } else { out += toks(i); i += 1 }
        }
        out.toVector -> f
      }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
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
