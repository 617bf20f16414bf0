package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q(name: String) = Similarity.queries(name)(spark, sf)

  test("q31 returns exactly 10 neighbors per query, ranked by similarity") {
    val rows = q("q31_ann_bruteforce").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 10)
    byQuery.foreach { case (_, rs) =>
      assert(rs.length == 10)
      val sims = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    }
  }

  test("q31 excludes self-matches") {
    assert(q("q31_ann_bruteforce")
      .filter(col("query_id") === col("cand_id")).count() == 0)
  }

  test("q32 LSH candidates share the query's bucket and rank within bucket") {
    val rows = q("q32_ann_lsh").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getAs[Int]("bucket")).distinct.length == 1)
    }
  }

  test("q32 top-1 in-bucket matches brute-force restricted to the bucket") {
    // LSH correctness: within a bucket the ranking must equal the
    // brute-force ranking over that bucket's members.
    val lshTop = q("q32_ann_lsh").filter(col("rn") === 1 && col("query_id") < 10)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bf = q("q31_ann_bruteforce").collect()
      .groupBy(_.getAs[Long]("query_id"))
    lshTop.foreach { case (qid, cand) =>
      bf.get(qid).foreach { neighbors =>
        // the in-bucket top-1 must not out-rank the global top-1
        val globalBest = neighbors.minBy(_.getAs[Long]("rn"))
        assert(globalBest.getAs[Double]("cos_sim") >=
          neighbors.find(_.getAs[Long]("cand_id") == cand)
            .map(_.getAs[Double]("cos_sim")).getOrElse(-1.0))
      }
    }
  }

  test("q48 k-means assigns every vector to one of k clusters, deterministically") {
    val a1 = q("q48_ivf_kmeans").collect()
    val a2 = q("q48_ivf_kmeans").collect()
    assert(a1.length == graft.Tables(spark, sf, "embeddings").count())
    val clusters = a1.map(_.getAs[Int]("cluster")).toSet
    assert(clusters.subsetOf((0 until 8).toSet) && clusters.size > 1)
    assert(a1.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq ==
      a2.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq,
      "k-means assignment must be deterministic across runs")
    a1.foreach(r => assert(r.getAs[Double]("dist") >= 0))
  }

  test("q36 norms are positive and min <= avg <= max") {
    q("q36_label_centroid_norm").collect().foreach { r =>
      val (mn, av, mx) = (r.getAs[Double]("min_norm"),
        r.getAs[Double]("avg_norm"), r.getAs[Double]("max_norm"))
      assert(mn > 0 && mn <= av && av <= mx)
    }
  }

  test("q62 IVF search: candidates come from the probed cell, ranks dense") {
    val rows = q("q62_ivf_search").collect()
    assert(rows.nonEmpty)
    val labelOf = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      // one probed cell per query
      assert(rs.map(_.getAs[Int]("label")).toSet.size == 1)
      // every candidate really lives in that cell
      rs.foreach(r => assert(labelOf(r.getAs[Long]("cand_id")) == r.getAs[Int]("label")))
      assert(!rs.exists(_.getAs[Long]("cand_id") == qid), "no self-match")
      val rns = rs.map(_.getAs[Long]("rn")).sorted.toSeq
      assert(rns == (1L to rns.length.toLong) && rns.length <= 3)
    }
  }

  test("q62 in-cell ranking agrees with brute force restricted to the cell") {
    val brute = q("q31_ann_bruteforce").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("cos_sim"))).toSeq
    val ivf = q("q62_ivf_search").collect()
    val labelOf = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // for queries brute force covers (vec_id < 10), the IVF top hit
    // must be the best brute-force hit within the probed cell
    ivf.filter(r => r.getAs[Long]("query_id") < 10 && r.getAs[Long]("rn") == 1L)
      .foreach { r =>
        val qid = r.getAs[Long]("query_id")
        val cell = r.getAs[Int]("label")
        val bruteInCell = brute
          .filter { case (q2, c, _) => q2 == qid && labelOf(c) == cell }
        // brute force only kept top-10 overall; compare when the cell
        // appears there at all
        bruteInCell.headOption.foreach { case (_, bestCand, bestSim) =>
          assert(r.getAs[Double]("cos_sim") >= bestSim - 1e-9 ||
            r.getAs[Long]("cand_id") == bestCand)
        }
      }
  }

  test("q95 PQ/ADC: dense ranks, non-decreasing estimates, self in top-k") {
    import spark.implicits._
    val rows = Similarity.queries("q95_pq_adc")(spark, TestSpark.sf)
      .as[(Long, Long, Double, Int)].collect()
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet == (0L until 5L).toSet)
    byQuery.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to 5), s"ranks not dense for query $q")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.toSeq,
        s"ADC estimate not monotone in rank for query $q")
      // the query's own vector quantizes to its own codes, so its ADC
      // distance is the sum of the query's residuals — in practice the
      // minimum; a PQ whose self-recall fails is miscoded
      assert(rs.exists(_._2 == q), s"query $q missing from its own top-5")
    }
  }

  test("q114 int8 codes match a plain-Scala quantizer and bound the corpus") {
    val vecs = graft.Tables(spark, TestSpark.sf, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
    val expected = vecs.groupBy(_._1).map { case (label, vs) =>
      val per = vs.map { case (_, v) =>
        val mn = v.min; val mx = v.max
        if (mx == mn) (0L, 0L)
        else {
          val sc = (mx.toDouble - mn.toDouble) / 255
          val qs = v.map(x =>
            math.min(math.floor((x.toDouble - mn.toDouble) / sc).toLong, 255L))
          (qs.sum, qs.count(_ == 255L).toLong)
        }
      }
      label -> ((vs.size.toLong, per.map(_._1).sum, per.map(_._2).sum,
        per.count(_._2 > 0).toLong))
    }
    val got = Similarity.queries("q114_int8_quantize")(spark, TestSpark.sf)
      .collect().map { r =>
        r.getAs[Int]("label") ->
          ((r.getAs[Long]("n_vecs"), r.getAs[Long]("sum_codes"),
            r.getAs[Long]("n_saturated_dims"), r.getAs[Long]("n_saturated_vecs")))
      }.toMap
    assert(got == expected)
    // codes stay inside [0, 255] in aggregate (dim from the data; the
    // max dim usually saturates, but a/(a/255) may floor to 254 in
    // IEEE, so no per-vector saturation is asserted)
    val dim = vecs.head._2.size.toLong
    got.values.foreach { case (n, sum, satDims, satVecs) =>
      assert(sum >= 0 && sum <= n * dim * 255L)
      assert(satVecs <= n && satDims >= satVecs)
    }
  }

  // ---- q223: banded embedding near-dup ----

  private def embDf(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("q223 finds an exact clone with cos_sim 1.0 and skips band-disjoint vectors") {
    // a: alternating signs; b: bit-identical clone; c: one sign flip
    // inside EVERY 16-dim band, so it shares no band bucket with a/b
    val a = Array.tabulate(64)(k => if (k % 2 == 0) 1.0f + k else -1.0f - k)
    val c = a.clone()
    Seq(0, 16, 32, 48).foreach(k => c(k) = -c(k))
    val out = Similarity.bandNeardupOf(
      embDf(Seq(1L -> a, 2L -> a.clone(), 3L -> c))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("vec_a") == 1L &&
      out.head.getAs[Long]("vec_b") == 2L)
    assert(out.head.getAs[Double]("cos_sim") == 1.0)
  }

  test("q223 occupancy cap drops a degenerate orthant but keeps normal pairs") {
    // 250 all-positive vectors (> MaxBandOccupancy=200) share every
    // band bucket — the cap must exclude ALL of them from pair
    // generation, while a clone pair in a mixed-sign orthant survives
    val hot = (0 until 250).map { i =>
      (100L + i) -> Array.tabulate(64)(k => 1.0f + ((i * 7 + k) % 13))
    }
    val base = Array.tabulate(64)(k => if (k % 3 == 0) -2.0f - k else 1.5f + k)
    val out = Similarity.bandNeardupOf(
      embDf(hot ++ Seq(1L -> base, 2L -> base.clone()))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("vec_a") == 1L &&
      out.head.getAs[Long]("vec_b") == 2L)
  }

  test("q223 on the gate table emits ordered pairs with verified cosine in range") {
    val rows = q("q223_emb_band_neardup").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b"))
      val cs = r.getAs[Double]("cos_sim")
      assert(cs >= -1.0001 && cs <= 1.0001)
    }
  }

  test("q224 routes an over-dense cluster through the IVF star the cap alone drops") {
    // 20 bit-identical all-positive vectors: every 8-bit band bucket
    // they occupy holds 20 > RoutedCap=6 members, so the LSH half
    // contributes NONE of their pairs — exactly the under-reporting
    // the r9 caps documented. The routed fallback must still connect
    // every member to the cluster's canonical (min id) via the IVF
    // star. A mixed-sign clone pair rides along in sparse buckets to
    // prove the LSH half still works beside the route.
    val hotBase = Array.tabulate(64)(k => 1.0f + (k % 5))
    val hot = (0 until 20).map(i => (100L + i) -> hotBase.clone())
    val base = Array.tabulate(64)(k => if (k % 3 == 0) -2.0f - k else 1.5f + k)
    val out = Similarity.bandNeardupRoutedOf(
      embDf(hot ++ Seq(1L -> base, 2L -> base.clone())), "spec-routed").collect()
    val lsh = out.filter(_.getAs[String]("via") == "lsh")
    val ivf = out.filter(_.getAs[String]("via") == "ivf")
    assert(lsh.length == 1 && lsh.head.getAs[Long]("vec_a") == 1L &&
      lsh.head.getAs[Long]("vec_b") == 2L)
    // every non-canonical member pairs with the canonical, cosine 1.0
    assert(ivf.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      == (101L to 119L).map(b => (100L, b)).toSet)
    assert(ivf.forall(_.getAs[Double]("cos_sim") == 1.0))
  }

  test("q226 purge graph is similarity-gated: a shared Lloyd cell alone merges " +
      "nothing, while an exact clone in the over-dense region still purges") {
    // 20 DISTINCT near-orthogonal all-positive vectors (tiny floor +
    // one big spike on a distinct dim each): every band bucket holds
    // all of them (occupancy 21 > RoutedCap), so the only candidate
    // edges are IVF star pairs at cos ≈ 0 — the r11-advice failure
    // mode where the unfiltered manifest would purge every non-min
    // member of each k-means cell despite nothing being a duplicate.
    // Vector 200 is a bit-identical clone of 105, connected ONLY via
    // the exact-duplicate channel (its star edge is also cos ≈ 0).
    val dense = (0 until 20).map { i =>
      (100L + i) -> Array.tabulate(64)(k =>
        if (k == (i * 3) % 64) 100.0f else 0.01f)
    }
    val emb = embDf(dense :+ (200L -> dense(5)._2.clone()))
    val out = Similarity.purgeManifestOf(emb,
      Similarity.bandNeardupRoutedOf(emb, "spec-purge")).collect()
    assert(out.length == 21) // full coverage: one row per corpus vector
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(byId(200L).getAs[Long]("purge") == 1L &&
      byId(200L).getAs[Long]("cluster") == 105L &&
      byId(200L).getAs[Long]("cluster_size") == 2L)
    out.filter(_.getAs[Long]("vec_id") != 200L).foreach { r =>
      assert(r.getAs[Long]("purge") == 0L &&
        r.getAs[Long]("cluster") == r.getAs[Long]("vec_id"),
        s"distinct vector ${r.getAs[Long]("vec_id")} must keep itself")
      assert(r.getAs[Long]("cluster_size") ==
        (if (r.getAs[Long]("vec_id") == 105L) 2L else 1L))
    }
  }

  test("q226 purge manifest: one kept canonical per cluster, canonical = min id") {
    val rows = q("q226_embedding_purge").collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, rs) =>
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length.toLong),
        s"cluster_size inconsistent for cluster $c")
      val kept = rs.filter(_.getAs[Long]("purge") == 0L)
      assert(kept.length == 1 && kept.head.getAs[Long]("vec_id") == c,
        s"cluster $c must keep exactly its canonical (min-id) member")
      assert(rs.map(_.getAs[Long]("vec_id")).min == c,
        s"cluster label $c must be the component's min vec_id")
    }
    // each member appears exactly once in the manifest
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == ids.length)
  }

  test("q37 occupancy cap drops a degenerate orthant but keeps normal pairs") {
    // 600 all-positive vectors (> MaxQ37BucketOccupancy=512) all land
    // in bucket 15 — the cap must drop the WHOLE bucket from pair
    // generation (single blocking key: nothing rediscovers them),
    // while a clone pair whose dim-0 sign puts it in another bucket
    // survives with cos 1.0
    val hot = (0 until 600).map { i =>
      (100L + i) -> Array.tabulate(64)(k => 1.0f + ((i * 7 + k) % 13))
    }
    val base = Array.tabulate(64)(k => if (k == 0) -2.0f else 1.5f + k)
    val out = Similarity.embeddingNeardupOf(
      embDf(hot ++ Seq(1L -> base, 2L -> base.clone()))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("vec_a") == 1L &&
      out.head.getAs[Long]("vec_b") == 2L)
    assert(out.head.getAs[Double]("cos_sim") == 1.0)
  }

  test("q37 cap never binds at gate scale (max bucket occupancy under the cap)") {
    // the cap exists for 100 TB densities; at the gate SFs it must be
    // invisible — measured max occupancy 146 at sf0.1. If the data or
    // the cap ever drift to where this fails, gate outputs would no
    // longer equal the uncapped join and the constant needs re-siting.
    val maxOcc = graft.Tables(spark, sf, "embeddings")
      .groupBy(Similarity.q37Bucket("embedding")).count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxOcc <= Similarity.MaxQ37BucketOccupancy,
      s"gate occupancy $maxOcc exceeds the cap — no longer output-neutral")
    assert(q("q37_embedding_neardup").count() > 0)
  }

  test("q224 gate table populates BOTH via channels with disjoint ordered pairs") {
    val rows = q("q224_routed_neardup").collect()
    val vias = rows.map(_.getAs[String]("via")).toSet
    assert(vias == Set("lsh", "ivf"),
      s"routing threshold no longer splits the gate corpus: $vias")
    rows.foreach(r => assert(r.getAs[Long]("vec_a") < r.getAs[Long]("vec_b")))
    // channel disjointness: the anti-join keeps one row per pair
    val pairs = rows.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.length == pairs.distinct.length)
  }

  test("q227 recall audit equals an independent plain-Scala recomputation") {
    // recompute ground truth AND the in-bucket result locally: cosine
    // at the same 4-dp HALF_UP rounding, ties broken by cand_id — the
    // oracle's procedure in Scala, so a drift in either side fails here
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def bucket(v: Array[Float]): Int =
      (0 until 8).map(j => (if (v(j * 8) > 0f) 1 else 0) << j).sum
    def top5(qid: Long, cands: Iterable[Long]): Set[Long] =
      cands.filter(_ != qid).toSeq
        .map(c => (c, cos(vecs(qid), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1).toSet
    val rows = q("q227_ann_recall_audit").collect()
    // r13: the sample is the 50 smallest md5(vec_id) keys — recompute
    // it locally, and assert it DISPERSES (not the lowest-id prefix:
    // the r12 lesson the hash sample exists to encode)
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectSample = vecs.keys.toSeq
      .sortBy(id => (md5hex(id.toString), id)).take(50).toSet
    assert(rows.length == 50 &&
      rows.map(_.getAs[Long]("query_id")).toSet == expectSample)
    assert(expectSample.count(_ >= 50L) > 25,
      "hash sample collapsed to low ids — dispersion property lost")
    rows.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val truth = top5(qid, vecs.keys)
      val inBucket = vecs.keys.filter(c => bucket(vecs(c)) == bucket(vecs(qid)))
      val got = top5(qid, inBucket)
      assert(r.getAs[Long]("n_retrieved") == got.size, s"query $qid retrieved")
      assert(r.getAs[Long]("n_hit") == (truth & got).size, s"query $qid hits")
      assert(r.getAs[Long]("recall_micro") == r.getAs[Long]("n_hit") * 200000L)
    }
    // the audit must REPORT loss, not assume it: at gate scale the
    // bucketed search misses some true neighbors for some query
    assert(rows.map(_.getAs[Long]("n_hit")).sum < rows.length * 5L,
      "recall 1.0 everywhere — the audit corpus no longer exercises LSH loss")
  }

  // shared plain-Scala model for the multi-probe surfaces: cosine at
  // the oracle's 4-dp HALF_UP rounding, cand_id tiebreak, 8-bit sign
  // bucket over dims 0,8,...,56, Hamming over bucket ids
  private def localModel() = {
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def bucket(v: Array[Float]): Int =
      (0 until 8).map(j => (if (v(j * 8) > 0f) 1 else 0) << j).sum
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sample = vecs.keys.toSeq
      .sortBy(id => (md5hex(id.toString), id)).take(50)
    def top5(qid: Long, cands: Iterable[Long]): Seq[Long] =
      cands.filter(_ != qid).toSeq
        .map(c => (c, cos(vecs(qid), vecs(c))))
        .sortBy { case (c, s) => (-s, c) }.take(5).map(_._1)
    (vecs, sample, bucket _, top5 _)
  }

  test("q229 multi-probe search equals an independent plain-Scala recomputation") {
    val (vecs, sample, bucket, top5) = localModel()
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    val rows = q("q229_ann_multiprobe").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == sample.toSet)
    byQuery.foreach { case (qid, rs) =>
      val probed = vecs.keys.filter(c =>
        hamming(bucket(vecs(c)), bucket(vecs(qid))) <= 2)
      val expect = top5(qid, probed)
      val got = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("cand_id")).toSeq
      assert(got == expect, s"query $qid: $got vs $expect")
      rs.foreach { r =>
        assert(r.getAs[Int]("probe_hamming") ==
          hamming(bucket(vecs(r.getAs[Long]("cand_id"))), bucket(vecs(qid))),
          s"query $qid probe_hamming mislabeled")
      }
    }
    // the whole point: some hits must come from a probed (non-own)
    // bucket, or multi-probe degenerates to q32
    assert(rows.exists(_.getAs[Int]("probe_hamming") > 0),
      "no hit from a Hamming>0 probe — multi-probe adds nothing here")
  }

  test("q231 ivf nprobe=2 probes exactly the 2 nearest cells and dominates q62 pointwise") {
    val rows = q("q231_ivf_multiprobe").collect()
    val single = q("q62_ivf_search").collect()
      .groupBy(_.getAs[Long]("query_id"))
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == single.keySet)
    byQuery.foreach { case (qid, rs) =>
      assert(rs.length <= 3)
      // hits come from at most the 2 probed cells
      assert(rs.map(_.getAs[Int]("label")).distinct.length <= 2, s"query $qid")
      // widening the probe set can only improve (or tie) each rank's
      // similarity — pointwise dominance over the nprobe=1 search
      val m2 = rs.map(r => r.getAs[Long]("rn") -> r.getAs[Double]("cos_sim")).toMap
      single(qid).foreach { r1 =>
        val rn = r1.getAs[Long]("rn")
        m2.get(rn).foreach { c2 =>
          assert(c2 >= r1.getAs[Double]("cos_sim"),
            s"query $qid rank $rn: nprobe=2 ranked worse than nprobe=1")
        }
      }
    }
    // the second probe must genuinely matter somewhere at gate scale
    assert(rows.map(_.getAs[Int]("label")).toSet.size > 1 &&
      byQuery.exists { case (_, rs) =>
        rs.map(_.getAs[Int]("label")).distinct.length == 2
      }, "no query drew hits from its second cell — nprobe=2 is vacuous here")
  }

  test("multiprobeSearchOf (library form) honors arbitrary queries and the radius/k knobs") {
    val (vecs, _, bucket, top5) = localModel()
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    import org.apache.spark.sql.functions.{col, expr}
    val corpus = graft.Tables(spark, sf, "embeddings")
      .withColumn("bucket", Similarity.bucketExprSpark("embedding"))
      .withColumn("nrm", graft.functions.VectorFunctions.vec_norm(col("embedding")))
    // a caller-chosen query set the hash sample would never pick:
    // three fixed mid-range ids
    val qids = Seq(7L, 123L, 456L).filter(vecs.contains)
    assert(qids.size == 3)
    val queries = corpus.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket").as("qbucket"), col("nrm").as("qn"))
    // radius 1 (9 probes) and k = 2: both knobs off the q229 defaults
    val rows = Similarity.multiprobeSearchOf(corpus, queries, radius = 1, k = 2)
      .collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == qids.toSet)
    byQuery.foreach { case (qid, rs) =>
      assert(rs.length <= 2, s"k=2 violated for query $qid")
      val probed = vecs.keys.filter(c =>
        hamming(bucket(vecs(c)), bucket(vecs(qid))) <= 1)
      val expect = top5(qid, probed).take(2)
      val got = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("cand_id")).toSeq
      assert(got == expect, s"query $qid: $got vs $expect")
      rs.foreach(r => assert(r.getAs[Int]("probe_hamming") <= 1))
    }
  }

  test("q230 recall/cost curve equals the local model and is monotone in radius") {
    val (vecs, sample, bucket, top5) = localModel()
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    val rows = q("q230_multiprobe_recall_curve").collect()
      .sortBy(_.getAs[Int]("probe_radius"))
    assert(rows.map(_.getAs[Int]("probe_radius")).toSeq == Seq(0, 1, 2))
    val expect = (0 to 2).map { r =>
      var nCand = 0L; var nHit = 0L
      sample.foreach { qid =>
        val truth = top5(qid, vecs.keys).toSet
        val probed = vecs.keys.filter(c => c != qid &&
          hamming(bucket(vecs(c)), bucket(vecs(qid))) <= r)
        nCand += probed.size
        nHit += (top5(qid, probed).toSet & truth).size
      }
      (nCand, nHit)
    }
    rows.zip(expect).foreach { case (row, (nCand, nHit)) =>
      assert(row.getAs[Long]("n_candidates") == nCand &&
        row.getAs[Long]("n_hit") == nHit &&
        row.getAs[Long]("recall_micro") == nHit * 4000L,
        s"radius ${row.getAs[Int]("probe_radius")}: $row vs ($nCand, $nHit)")
    }
    val hits = rows.map(_.getAs[Long]("n_hit"))
    assert(hits.sameElements(hits.sorted), "hits must be monotone in radius")
    // radius 0 IS the single-probe search q227 audits: totals must agree
    val q227hits = q("q227_ann_recall_audit").collect()
      .map(_.getAs[Long]("n_hit")).sum
    assert(hits(0) == q227hits,
      s"q230 radius-0 hits ${hits(0)} != q227 total $q227hits")
  }

  // ---- width-16 / margin-directed probing (r14) ------------------

  private def bucket16(v: Array[Float]): Int =
    (0 until 16).map(j => (if (v(j * 4) > 0f) 1 else 0) << j).sum

  /** The `soft` smallest-margin sign-bit positions of the width-16
    * signature, ordered by (|coord|, position) — the plain-Scala twin
    * of [[Similarity.marginProbesOf]]'s window ranking. */
  private def softBits16(v: Array[Float], soft: Int): Seq[Int] =
    (0 until 16).map(j => (math.abs(v(j * 4)), j)).sortBy(identity)
      .take(soft).map(_._2)

  /** Buckets the margin search probes for query vector `v` at flip
    * budget ≤ radius over its `soft` soft bits. */
  private def marginBuckets(v: Array[Float], soft: Int, radius: Int): Set[Int] = {
    val bits = softBits16(v, soft)
    (0 until (1 << soft)).filter(Integer.bitCount(_) <= radius).map { m =>
      bucket16(v) ^ (0 until soft).filter(i => ((m >> i) & 1) == 1)
        .map(i => 1 << bits(i)).sum
    }.toSet
  }

  test("q232 width-16 multi-probe search equals a plain-Scala recomputation") {
    val (vecs, sample, _, top5) = localModel()
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    val rows = q("q232_ann_multiprobe_w16").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet.subsetOf(sample.toSet))
    byQuery.foreach { case (qid, rs) =>
      val probed = vecs.keys.filter(c =>
        hamming(bucket16(vecs(c)), bucket16(vecs(qid))) <= 2)
      val expect = top5(qid, probed)
      val got = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("cand_id")).toSeq
      assert(got == expect, s"query $qid: $got vs $expect")
      rs.foreach(r => assert(r.getAs[Int]("probe_hamming") ==
        hamming(bucket16(vecs(r.getAs[Long]("cand_id"))), bucket16(vecs(qid)))))
    }
    // width-16 queries with ≥1 in-radius candidate must all appear —
    // absence is only legal when the probed space is empty
    sample.foreach { qid =>
      val probed = vecs.keys.filter(c => c != qid &&
        hamming(bucket16(vecs(c)), bucket16(vecs(qid))) <= 2)
      assert(byQuery.contains(qid) == probed.nonEmpty,
        s"query $qid presence vs ${probed.size} candidates")
    }
  }

  test("q234 margin-probe search equals a plain-Scala recomputation of Lv-style probing") {
    val (vecs, sample, _, top5) = localModel()
    val rows = q("q234_ann_margin_probe").collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet.subsetOf(sample.toSet))
    sample.foreach { qid =>
      val buckets = marginBuckets(vecs(qid), soft = 10, radius = 4)
      assert(buckets.size == (0 until 1024).count(Integer.bitCount(_) <= 4),
        s"query $qid: probe buckets not distinct")
      val probed = vecs.keys.filter(c => c != qid &&
        buckets.contains(bucket16(vecs(c))))
      val expect = top5(qid, probed)
      val got = byQuery.getOrElse(qid, Array.empty)
        .sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("cand_id")).toSeq
      assert(got == expect, s"query $qid: $got vs $expect")
      // every hit's ring label = the bucket Hamming distance (probe
      // masks are subsets of soft positions, so the XOR inverts)
      byQuery.getOrElse(qid, Array.empty).foreach { r =>
        assert(r.getAs[Int]("probe_hamming") == Integer.bitCount(
          bucket16(vecs(r.getAs[Long]("cand_id"))) ^ bucket16(vecs(qid))))
      }
    }
  }

  test("q233/q235 width-16 curves equal the local model; margin ⊆ ring at every budget") {
    val (vecs, sample, _, top5) = localModel()
    def hamming(a: Int, b: Int): Int = Integer.bitCount(a ^ b)
    def curveExpect(probedOf: (Long, Int) => Iterable[Long], maxR: Int) =
      (0 to maxR).map { r =>
        var nCand = 0L; var nHit = 0L
        sample.foreach { qid =>
          val truth = top5(qid, vecs.keys).toSet
          val probed = probedOf(qid, r)
          nCand += probed.size
          nHit += (top5(qid, probed).toSet & truth).size
        }
        (nCand, nHit)
      }
    val ringExpect = curveExpect((qid, r) => vecs.keys.filter(c => c != qid &&
      hamming(bucket16(vecs(c)), bucket16(vecs(qid))) <= r), 3)
    val ringRows = q("q233_multiprobe_curve_w16").collect()
      .sortBy(_.getAs[Int]("probe_radius"))
    assert(ringRows.map(_.getAs[Int]("probe_radius")).toSeq == (0 to 3))
    ringRows.zip(ringExpect).foreach { case (row, (nCand, nHit)) =>
      assert(row.getAs[Long]("n_candidates") == nCand &&
        row.getAs[Long]("n_hit") == nHit &&
        row.getAs[Long]("recall_micro") == nHit * 4000L, s"ring: $row")
    }
    val marginExpect = curveExpect((qid, r) => {
      val buckets = marginBuckets(vecs(qid), soft = 10, radius = r)
      vecs.keys.filter(c => c != qid && buckets.contains(bucket16(vecs(c))))
    }, 5)
    val marginRows = q("q235_margin_recall_curve").collect()
      .sortBy(_.getAs[Int]("probe_radius"))
    assert(marginRows.map(_.getAs[Int]("probe_radius")).toSeq == (0 to 5))
    marginRows.zip(marginExpect).foreach { case (row, (nCand, nHit)) =>
      assert(row.getAs[Long]("n_candidates") == nCand &&
        row.getAs[Long]("n_hit") == nHit &&
        row.getAs[Long]("recall_micro") == nHit * 4000L, s"margin: $row")
    }
    // structural containment: a flip-budget-r margin probe set is a
    // subset of the Hamming-r ring, so margin candidates can never
    // exceed ring candidates at the same budget
    marginRows.take(4).zip(ringRows).foreach { case (m, g) =>
      assert(m.getAs[Long]("n_candidates") <= g.getAs[Long]("n_candidates"),
        s"margin probed MORE than the ring at radius ${g.getAs[Int]("probe_radius")}")
    }
  }

  test("q236 auto-probe selects the measured budget and equals the fixed-budget search") {
    val (vecs, sample, _, top5) = localModel()
    def probedAt(qid: Long, r: Int): Iterable[Long] = {
      val buckets = marginBuckets(vecs(qid), soft = 10, radius = r)
      vecs.keys.filter(c => c != qid && buckets.contains(bucket16(vecs(c))))
    }
    def recallAt(r: Int): Long = {
      var nHit = 0L
      sample.foreach { qid =>
        val truth = top5(qid, vecs.keys).toSet
        nHit += (top5(qid, probedAt(qid, r)).toSet & truth).size
      }
      nHit * 4000L
    }
    val expectBudget = (0 to 5).find(recallAt(_) >= 40000L).getOrElse(5)
    val rows = q("q236_ann_autoprobe").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Int]("budget")).distinct.toSeq == Seq(expectBudget),
      s"selected budget != locally recomputed $expectBudget")
    // the search itself must equal the fixed-budget margin search at
    // the selected budget, query by query
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    sample.foreach { qid =>
      val expect = top5(qid, probedAt(qid, expectBudget))
      val got = byQuery.getOrElse(qid, Array.empty)
        .sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("cand_id")).toSeq
      assert(got == expect, s"query $qid: $got vs $expect")
    }
  }

  test("selectMarginBudget: small budget on a clustered corpus, max-budget fallback on isotropic") {
    // the r13-verdict #2 fixtures: a corpus with genuine structure
    // (families of 6 at cos ≈ 1, built by the scale harness's own
    // generator) must select a SMALL measured budget for a 90%
    // target; the isotropic base corpus — where q235 shows no budget
    // gets near 90% — must fall back to maxRadius
    val clustered = graft.ScaleEvidence.clusteredEmbeddings(
      spark, sf, reps = 6, famSize = 6, sigma = 0.01)
    val bC = Similarity.selectMarginBudget(clustered, tag = "spec-clustered",
      targetRecallMicro = 900000L)
    assert(bC < 5, s"clustered corpus fell back to max budget ($bC)")
    // consistency: the selection is exactly the operator's own curve
    // read at the target
    val curve = Similarity.marginRecallCurveOf(clustered, width = 16,
      soft = 10, maxRadius = 5).orderBy(col("probe_radius")).collect()
    val expected = curve.find(_.getAs[Long]("recall_micro") >= 900000L)
      .map(_.getAs[Int]("probe_radius")).getOrElse(5)
    assert(bC == expected, s"selector $bC != curve-derived $expected")
    assert(curve(bC).getAs[Long]("recall_micro") >= 900000L)
    val iso = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val bI = Similarity.selectMarginBudget(iso, tag = "spec-iso",
      targetRecallMicro = 900000L)
    assert(bI == 5, s"isotropic corpus should fall back to max budget, got $bI")
    // memoized: the repeat call is served from CacheRegistry
    assert(Similarity.selectMarginBudget(clustered, tag = "spec-clustered",
      targetRecallMicro = 900000L) == bC)
  }

  test("inRowMarginProbes (streaming form) is row-equal to the window form") {
    // the q237 contract: the stateless in-row margin ranking
    // (array_sort over (|margin|, j) structs) must produce EXACTLY
    // the probe set of the windowed batch form, or the streaming
    // search silently drifts from the gated batch surface
    import org.apache.spark.sql.functions.col
    val e = graft.Tables(spark, sf, "embeddings")
      .withColumn("bucket", Similarity.bucketExprSpark("embedding", 16))
      .withColumn("nrm", graft.functions.VectorFunctions.vec_norm(col("embedding")))
    val queries = e.select(col("vec_id").as("query_id"),
      col("embedding").as("qv"), col("bucket").as("qbucket"),
      col("nrm").as("qn"))
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("bucket"), col("probe_hamming")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    for ((soft, radius) <- Seq((10, 2), (8, 4), (6, 1))) {
      val window = keyed(Similarity.marginProbesOf(queries, 16, soft, radius))
      val inRow = keyed(Similarity.inRowMarginProbes(queries, 16, soft, radius))
      assert(inRow == window, s"forms drifted at soft=$soft radius=$radius")
    }
  }

  test("marginProbeSearchOf (library form) honors arbitrary queries and the knobs") {
    val (vecs, _, _, top5) = localModel()
    import org.apache.spark.sql.functions.col
    val corpus = graft.Tables(spark, sf, "embeddings")
      .withColumn("bucket", Similarity.bucketExprSpark("embedding", 16))
      .withColumn("nrm", graft.functions.VectorFunctions.vec_norm(col("embedding")))
    val qids = Seq(7L, 123L, 456L).filter(vecs.contains)
    assert(qids.size == 3)
    val queries = corpus.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket").as("qbucket"), col("nrm").as("qn"))
    // soft = 6, radius = 2, k = 3: all knobs off the q234 defaults
    val rows = Similarity.marginProbeSearchOf(corpus, queries,
      width = 16, soft = 6, radius = 2, k = 3).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    qids.foreach { qid =>
      val soft = (0 until 16).map(j => (math.abs(vecs(qid)(j * 4)), j))
        .sortBy(identity).take(6).map(_._2)
      val buckets = (0 until 64).filter(Integer.bitCount(_) <= 2).map { m =>
        bucket16(vecs(qid)) ^ (0 until 6).filter(i => ((m >> i) & 1) == 1)
          .map(i => 1 << soft(i)).sum
      }.toSet
      val probed = vecs.keys.filter(c => c != qid &&
        buckets.contains(bucket16(vecs(c))))
      val expect = top5(qid, probed).take(3)
      val got = byQuery.getOrElse(qid, Array.empty)
        .sortBy(_.getAs[Long]("rn")).map(_.getAs[Long]("cand_id")).toSeq
      assert(got == expect, s"query $qid: $got vs $expect")
    }
  }

  test("selectMarginBudget memoizes per (session, tag, knobs): stale after a same-tag rewrite until clear(dropScalars = true)") {
    import spark.implicits._
    // the STALENESS CONTRACT pinned by the selectMarginBudget
    // scaladoc (r14 verdict #5): the memo key embeds nothing about
    // corpus CONTENT, so a corpus rewritten under the same tag is
    // served the stale budget by design, and invalidation
    // (CacheRegistry.clear with dropScalars = true, or a fresh tag)
    // is the caller's obligation. Two corpora with provably different
    // honest budgets make the memo-hit observable:
    //  - A: 60 same-bucket clones (signs never flip) → every truth
    //    neighbor is an own-bucket candidate → budget 0 meets a 90%
    //    target;
    //  - B: 200 sign-scrambled vectors across 65,536 buckets → no
    //    sub-linear budget approaches 90% → maxRadius fallback (5).
    def vecA(i: Int): Array[Float] = Array.tabulate(64) { k =>
      (if (k % 2 == 0) 1f else -1f) + 0.001f * ((i * 31 + k) % 7)
    }
    def vecB(i: Int): Array[Float] = Array.tabulate(64) { k =>
      (((i * 2654435761L + k * 40503L) % 1000L).toInt - 500) / 500.0f + 0.001f
    }
    val dfA = (0 until 60).map(i => (i.toLong, vecA(i))).toDF("vec_id", "embedding")
    val dfB = (0 until 200).map(i => (i.toLong, vecB(i))).toDF("vec_id", "embedding")
    val tag = "staleness-contract-spec"

    // SEQUENTIAL-SUITE ASSUMPTION (r15 ADVICE): the global
    // clear(dropScalars = true) below is the DOCUMENTED invalidation
    // path this test pins, but it drops every session memo — safe
    // here only because this build runs suites sequentially in one
    // forked JVM (Test/fork := true, no testForkedParallel). A build
    // that turns on intra-JVM suite parallelism must scope these two
    // clears to this test's own tag via CacheRegistry.releaseScalar.
    graft.CacheRegistry.clear(spark, dropScalars = true)
    val bA = Similarity.selectMarginBudget(dfA, tag, targetRecallMicro = 900000L)
    assert(bA == 0, s"clustered same-bucket corpus should select budget 0, got $bA")
    // rewrite under the SAME tag: the selector must serve the memo,
    // not recalibrate — the documented staleness
    val bStale = Similarity.selectMarginBudget(dfB, tag, targetRecallMicro = 900000L)
    assert(bStale == bA,
      s"same-tag call recalibrated ($bStale) instead of serving the memo ($bA)")
    // the caller's documented invalidation path
    graft.CacheRegistry.clear(spark, dropScalars = true)
    val bB = Similarity.selectMarginBudget(dfB, tag, targetRecallMicro = 900000L)
    assert(bB == 5,
      s"fresh calibration after clear must reflect the rewritten corpus " +
        s"(isotropic maxRadius fallback), got $bB")
  }
}
