package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q(name: String) = Analytics.queries(name)(spark, sf)

  test("q54 hash sample keeps ~12.5% of orders, deterministically") {
    val total = graft.Tables(spark, sf, "orders").count()
    val n1 = q("q54_sample_hash").agg(sum(col("n"))).collect().head.getLong(0)
    val n2 = q("q54_sample_hash").agg(sum(col("n"))).collect().head.getLong(0)
    assert(n1 == n2, "hash sampling must be reproducible run-to-run")
    val frac = n1.toDouble / total
    assert(frac > 0.08 && frac < 0.17, s"sample fraction $frac far from 1/8")
  }

  test("q55 histogram bins partition the table exactly") {
    val total = graft.Tables(spark, sf, "part").count()
    val rows = q("q55_price_histogram").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    val bins = rows.map(_.getAs[Int]("bin"))
    assert(bins.forall(b => b >= 0 && b <= 10))
  }

  test("q56 tf-idf yields at most 5 ranked terms per doc, rn dense from 1") {
    val rows = q("q56_tfidf").collect()
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val rns = rs.map(_.getAs[Long]("rn")).sorted
      assert(rns.length <= 5)
      assert(rns.toSeq == (1L to rns.length.toLong))
    }
  }

  test("q57 winnowing: fingerprint count is positive and bounded by gram count") {
    val rows = q("q57_winnow_fingerprint").collect()
    assert(rows.nonEmpty)
    val lens = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val nFp = r.getAs[Long]("n_fp")
      assert(nFp >= 1)
      // can't have more distinct window-min fingerprints than windows
      assert(nFp <= math.max(1, lens(r.getAs[Long]("doc_id")) - 7))
      assert(r.getAs[String]("min_fp").length == 32) // md5 hex
    }
  }

  test("q58 funnel stages are monotone non-increasing") {
    val r = q("q58_funnel").collect().head
    val (a, b, c) = (r.getAs[Long]("n_signup"),
      r.getAs[Long]("n_signup_view"), r.getAs[Long]("n_full_funnel"))
    assert(a >= b && b >= c)
    assert(a > 0)
  }

  test("q59 unpivot emits exactly two metric rows per brand") {
    val rows = q("q59_unpivot").collect()
    rows.groupBy(_.getAs[String]("p_brand")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("metric")).sorted.toSeq ==
        Seq("avg_price", "avg_size"))
    }
  }

  test("q60 salted distinct equals the plain exact distinct count") {
    val salted = q("q60_salted_distinct").collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_distinct")).toMap
    val plain = graft.Tables(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(salted == plain)
  }

  test("q61 map aggregation: n_langs agrees with the langs list") {
    q("q61_map_agg").collect().foreach { r =>
      assert(r.getAs[String]("langs").split(",").length == r.getAs[Int]("n_langs"))
      assert(r.getAs[Long]("n_en") >= 0)
    }
  }

  test("q66 every reported supplier has at least one sole-late order") {
    val rows = q("q66_sole_late_supplier").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("numwait") >= 1))
  }

  test("q67 fuzzy pairs: exact subset of fuzzy, distances within threshold") {
    val rows = q("q67_fuzzy_name_match").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") <= r.getAs[Long]("n_fuzzy_pairs"))
      val md = r.getAs[Long]("min_dist")
      assert(md >= 0 && md <= 2)
    }
  }

  test("q68 clusters: label is the component min; q29 pairs never straddle clusters") {
    val labels = TextDedup.queries("q68_dedup_clusters")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster")).toMap
    assert(labels.nonEmpty)
    // label must be a member of its own cluster and its minimum
    labels.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.keys.min == cluster)
    }
    // every candidate pair is intra-cluster (transitivity closed)
    TextDedup.queries("q29_minhash_lsh")(spark, sf).collect().foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(labels(a) == labels(b), s"pair ($a,$b) split across clusters")
    }
  }

  test("q75 returns the argmax supplier(s) with the true maximum revenue") {
    val rows = q("q75_top_revenue_supplier").collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "all returned suppliers must share the max revenue")
  }

  test("q76 dominance counts meet the HAVING threshold") {
    val rows = q("q76_supply_dominance").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_dominated") >= 2))
  }

  test("q77 range frame always includes the current row") {
    val rows = q("q77_range_frame").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_last_hour") >= 1))
  }

  test("q71 stratified sample is reproducible and en-heavier than others") {
    val a = q("q71_stratified_sample").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_sampled")).toMap
    val b = q("q71_stratified_sample").collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_sampled")).toMap
    assert(a == b)
    val docs = graft.Tables(spark, sf, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    // en rate ~50%, others ~12.5%
    a.foreach { case (lang, n) =>
      val rate = n.toDouble / docs(lang)
      if (lang == "en") assert(rate > 0.3 && rate < 0.7, s"en rate $rate")
      else assert(rate < 0.35, s"$lang rate $rate")
    }
  }

  test("q69 streamed hourly rollup equals the batch computation exactly") {
    val streamed = StreamingParity.queries("q69_stream_hourly")(spark, sf)
    val batch = graft.Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("total_value"))
      .select(col("w.start").as("bucket"), col("event_type"), col("n"), col("total_value"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("q39 HLL estimate stays within the 10% oracle bound") {
    val rows = graft.operators.Relational.queries("q39_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")))
  }

  test("q105 packing matches a sequential plain-Scala re-pack per language") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("text").toLowerCase.split("\\s+").count(_.nonEmpty).toLong))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val batch = (cum / 2048).toInt // doc starts at offset `cum`
        cum += n
        ((lang, batch), (id, n))
      }.toSeq
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2._2).sum, vs.map(_._2._1).min))
    }
    val got = graft.operators.Analytics.queries("q105_sequence_pack")(spark, sf)
      .collect().map { r =>
        (r.getAs[String]("lang"), r.getAs[Int]("batch")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("first_doc")))
      }.toMap
    assert(got == expected)
    // batch ids are dense per language (no doc is longer than the budget)
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids == (0 to ids.max))
    }
  }

  test("q118 purge removes exactly the requested users' rows, no others") {
    val rows = graft.operators.Analytics.queries("q118_compliance_purge")(spark, sf)
      .collect()
    val direct = graft.Tables(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("b"),
        sum((col("user_id") % 97 === 3).cast("long")).as("r"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val (b, r) = direct(x.getAs[String]("event_type"))
      assert(x.getAs[Long]("n_before") == b)
      assert(x.getAs[Long]("n_removed") == r)
      assert(x.getAs[Long]("n_after") == b - r)
    }
    assert(rows.map(_.getAs[Long]("n_removed")).sum > 0, "fixture must exercise the purge")
  }

  test("q116 audit checks are exercised and agree with direct recomputation") {
    val rows = graft.operators.Analytics.queries("q116_dq_audit")(spark, sf)
      .collect().map(r => r.getAs[String]("check") -> r.getAs[Long]("violations")).toMap
    assert(rows.keySet == Set("orphan_user_ids", "duplicate_event_ids",
      "null_values", "negative_values", "unknown_event_type"))
    // the fixture plants 'error' events — the domain check must fire
    assert(rows("unknown_event_type") > 0)
    val errorCount = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "error").count()
    assert(rows("unknown_event_type") == errorCount)
    // duplicate check recomputed directly
    val dups = graft.Tables(spark, sf, "events")
      .groupBy(col("event_id")).count().filter(col("count") > 1).count()
    assert(rows("duplicate_event_ids") == dups)
  }

  test("q117 snapshot diff partitions users and counts are monotone") {
    val rows = graft.operators.Analytics.queries("q117_snapshot_diff")(spark, sf)
      .collect()
    val users = graft.Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.length == users, "every user appears exactly once in the diff")
    rows.foreach { r =>
      val old = r.getAs[Long]("n_old"); val neu = r.getAs[Long]("n_new")
      assert(neu >= old, "the new snapshot is a superset of the old")
      val status = r.getAs[String]("status")
      if (old == 0) assert(status == "added")
      else if (neu > old) assert(status == "grown")
      else assert(status == "unchanged")
    }
    assert(rows.exists(_.getAs[String]("status") == "grown"))
  }

  test("q115 merged partials equal the direct aggregate and pass the sketch bound") {
    val rows = graft.operators.Analytics.queries("q115_incremental_rollup")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_ok")))
    val direct = graft.Tables(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("tv"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    rows.foreach { r =>
      val (n, tv) = direct(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      // decimal partial sums merge exactly — bit-equal, not approximately
      assert(r.getAs[Double]("total_value") == tv)
    }
  }

  test("q111 takes exactly min(50, stratum size) docs per language, md5-ranked") {
    val perLang = graft.Tables(spark, sf, "documents")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = graft.operators.Analytics.queries("q111_strata_sample")(spark, sf)
      .collect()
    val got = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong)
    perLang.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == math.min(50L, n), s"lang $lang")
    }
    // ranking key really is the md5 of the row key (reproducibility)
    rows.take(20).foreach { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"samp|${r.getAs[Long]("doc_id")}".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      assert(r.getAs[String]("rk") == hex)
    }
  }

  test("q112 MAD outliers: totals cover the table, outliers are a small tail") {
    val rows = graft.operators.Analytics.queries("q112_mad_outliers")(spark, sf)
      .collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == graft.Tables(spark, sf, "lineitem").count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val out = r.getAs[Long]("n_outliers")
      assert(out >= 0 && out < n / 10, "a 5-MAD screen flags well under 10%")
      assert(r.getAs[Double]("mad") > 0)
    }
  }

  test("q110 pagerank matches a plain-Scala integer power iteration") {
    val ords = graft.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges0 = graft.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).collect()
      .flatMap(r => ords.get(r.getLong(0)).map(c => (c, r.getLong(1) + 1000000000L)))
      .distinct
    val edges = edges0 ++ edges0.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var r = deg.keys.map(_ -> 1000000000L).toMap
    for (_ <- 1 to 3) {
      val sums = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = r.keys.map(n => n -> (150000000L + sums.getOrElse(n, 0L) * 85 / 100)).toMap
    }
    val expected = r.collect { case (n, v) if n >= 1000000000L => (n - 1000000000L) -> v }
    val got = graft.operators.Analytics.queries("q110_pagerank")(spark, sf)
      .collect().map(x => x.getAs[Long]("s_suppkey") -> x.getAs[Long]("rank_nano")).toMap
    assert(got == expected)
    // hub property: suppliers aggregate customer mass, so their mean
    // rank must exceed the initial per-node mass
    assert(got.values.sum / got.size > 1000000000L)
  }

  test("q109 winsorized aggregate clips ~5% per tail and stays within [lo, hi]") {
    val rows = graft.operators.Analytics.queries("q109_winsorize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val lo = r.getAs[Long]("n_clip_lo")
      val hi = r.getAs[Long]("n_clip_hi")
      // interpolated p05/p95: strictly less than 5% of rows can sit
      // strictly outside the edge on each side (+1 slack for ties)
      assert(lo <= n / 20 + 1 && hi <= n / 20 + 1)
      assert(lo > 0 && hi > 0, "both tails should clip on real data")
      val raw = graft.Tables(spark, sf, "lineitem")
        .filter(col("l_returnflag") === r.getAs[String]("l_returnflag"))
        .agg(avg(col("l_extendedprice"))).collect().head.getDouble(0)
      // clipping pulls tails toward the center but cannot move the
      // mean outside the raw value range
      assert(math.abs(r.getAs[Double]("winsorized_avg") - raw) < raw)
    }
  }

  test("q107 mixture sampling matches a plain-Scala md5 recomputation") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_chars")))
    def u16(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"mix|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      Integer.parseInt(hex.take(4), 16)
    }
    val expected = docs.groupBy(_._2).map { case (src, ds) =>
      val thresh = (src.drop(3).toInt % 4 + 1) * 8192
      val kept = ds.filter(d => u16(d._1) < thresh)
      src -> ((ds.size.toLong, kept.size.toLong, kept.map(_._3).sum))
    }
    val got = graft.operators.Analytics.queries("q107_source_mix")(spark, sf)
      .collect().map { r =>
        r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
            r.getAs[Long]("kept_chars")))
      }.toMap
    assert(got == expected)
    // every configured rate tier is actually exercised by the fixture
    assert(docs.map(_._2.drop(3).toInt % 4).distinct.length == 4)
  }
}
