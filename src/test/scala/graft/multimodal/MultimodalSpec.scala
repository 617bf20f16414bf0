package graft.multimodal

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def media = Multimodal.mediaTable(spark, sf)

  test("media table has opaque binary payloads with typed metadata") {
    val rows = media.limit(10).collect()
    assert(rows.nonEmpty)
    rows.foreach { m =>
      assert(m.payload.length.toLong == m.n_bytes)
      assert(Set("image", "audio", "video").contains(m.media_type))
    }
    val types = media.toDF().select("media_type").distinct().collect()
      .map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and keyed 1:1 to media") {
    val feats = Multimodal.extractFeatures(media, Multimodal.FakeDecoder)
    assert(feats.count() == media.count())
    val twice = Multimodal.extractFeatures(media, Multimodal.FakeDecoder)
    assert(feats.toDF().exceptAll(twice.toDF()).count() == 0)
    feats.collect().foreach { f =>
      assert(f.width >= 16 && f.height >= 16)
      assert(f.brightness >= 0 && f.brightness <= 255)
    }
  }

  test("feature extraction survives repartitioning (partition-batch shape)") {
    val feats1 = Multimodal.extractFeatures(media.repartition(1), Multimodal.FakeDecoder)
    val feats16 = Multimodal.extractFeatures(media.repartition(16), Multimodal.FakeDecoder)
    assert(feats1.toDF().exceptAll(feats16.toDF()).count() == 0)
  }

  test("resize shrinks payloads by the expected factor") {
    val small = Multimodal.resize(media, 4)
    val joined = media.toDF().select(col("media_id"), col("n_bytes").as("orig"))
      .join(small.toDF().select(col("media_id"), col("n_bytes").as("resized")), "media_id")
    joined.collect().foreach { r =>
      val (orig, resized) = (r.getAs[Long]("orig"), r.getAs[Long]("resized"))
      assert(resized == (orig + 3) / 4, s"orig=$orig resized=$resized")
    }
  }

  test("frame sampling emits nFrames rows per video, covering the payload") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(media, 5)
    val perVideo = frames.groupByKey(_.media_id).count().collect().toMap
    val nVideos = media.filter(_.media_type == "video").count()
    assert(perVideo.size.toLong == nVideos)
    assert(perVideo.values.forall(_ == 5))
  }

  test("q190 scene cuts equal a plain-Scala frame-luminance recompute") {
    val expected = media.collect().filter(_.media_type == "video").map { m =>
      val size = math.max(1, m.payload.length / 8)
      val frames = (0 until 8).map { f =>
        val from = f * size
        if (from >= m.payload.length) Array.empty[Byte]
        else m.payload.slice(from, math.min(m.payload.length, from + size))
      }.filter(_.nonEmpty)
      val stats = frames.map(b => (b.length.toLong, b.foldLeft(0L)((a, x) => a + (x & 0xff))))
      val jumps = stats.sliding(2).collect { case Seq((pn, ps), (n, s)) =>
        math.abs(s * pn - ps * n) * 1000L / (n * pn)
      }.toSeq
      m.media_id -> ((stats.size.toLong,
        jumps.count(_ > 2000L).toLong,
        if (jumps.isEmpty) 0L else jumps.max))
    }.toMap
    val got = Multimodal.queries("q190_scene_cuts")(spark, sf).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Long]("n_frames"), r.getAs[Long]("n_cuts"),
          r.getAs[Long]("max_jump_milli")))).toMap
    assert(got === expected)
  }

  test("fingerprint signatures: deterministic, 16-bit bands, identical payloads collide") {
    import spark.implicits._
    val sigs = Multimodal.fingerprintSignatures(media)
    // one signature per qualifying payload, bands inside 16-bit range
    assert(sigs.count() == media.filter(_.payload.length >= 64).count())
    sigs.collect().foreach { s =>
      Seq(s.b0, s.b1, s.b2, s.b3).foreach(b => assert(b >= 0 && b <= 0xffff))
    }
    // identical payloads → identical signatures (distance 0), regardless
    // of media_id; a perturbed payload changes at least one band
    val base = media.limit(1).collect().head
    val twin = Seq(
      base.copy(media_id = -1L),
      base.copy(media_id = -2L, payload = base.payload.reverse)).toDS()
    val twinSigs = Multimodal.fingerprintSignatures(twin)
      .collect().map(s => s.media_id -> ((s.b0, s.b1, s.b2, s.b3))).toMap
    val orig = Multimodal.fingerprintSignatures(
      Seq(base).toDS()).collect().head
    assert(twinSigs(-1L) == ((orig.b0, orig.b1, orig.b2, orig.b3)))
  }

  test("q147 pairs are symmetric-free, banded, and within the Hamming bound") {
    val pairs = Multimodal.queries("q147_media_fingerprint_dedup")(spark, sf).collect()
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Long]("hamming") <= 3L)
    }
    // distinct applied: no duplicate pairs from multi-band matches
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).distinct.length == pairs.length)
  }

  test("q148 purge manifest agrees with a driver-side union-find recompute") {
    val pairs = Multimodal.queries("q147_media_fingerprint_dedup")(spark, sf)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // attaching the larger root under the smaller makes each final
    // root the component minimum — the same label minLabel converges to
    val byCluster = pairs.flatMap(p => Seq(p._1, p._2)).distinct.groupBy(find)
    val sizes = media.collect().map(m => m.media_id -> m.n_bytes).toMap
    val manifest = Multimodal.queries("q148_dedup_purge_manifest")(spark, sf)
      .collect().map(r => r.getAs[Long]("cluster") -> r).toMap
    assert(manifest.keySet == byCluster.keySet)
    byCluster.foreach { case (root, members) =>
      val r = manifest(root)
      val survivor = members.maxBy(m => (sizes(m), -m))
      assert(r.getAs[Long]("cluster_size") == members.length.toLong)
      assert(r.getAs[Long]("n_removed") == members.length.toLong - 1)
      assert(r.getAs[Long]("survivor_id") == survivor)
      assert(r.getAs[Long]("bytes_reclaimed") ==
        members.map(sizes).sum - sizes(survivor))
    }
  }

  test("fingerprint occupancy cap drops an over-dense bucket family, keeps normal pairs") {
    // 1100 identical-payload media (> MaxFpBandOccupancy=1000) share
    // every band bucket — the cap must exclude ALL of them from pair
    // generation (an identical-texture family is exact-dedup's job,
    // q27 shape, not LSH's) — while a payload-identical clone pair in
    // a different sketch region survives with hamming 0.
    import spark.implicits._
    val texture = "texturetexture12" * 8 // 128 bytes, one shared sketch
    val base = ("the quick brown fox jumps over the lazy dog " * 3).take(100)
    val rows =
      (0 until 1100).map(i => Multimodal.MediaRecord(100L + i, "image",
        texture.getBytes("UTF-8"), 128L, "tex")) ++ Seq(
        Multimodal.MediaRecord(1L, "image", base.getBytes("UTF-8"), 100L, "s"),
        Multimodal.MediaRecord(2L, "image", base.getBytes("UTF-8"), 100L, "s"))
    val out = Multimodal.fingerprintPairsOf(rows.toDS()).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("id_a") == 1L &&
      out.head.getAs[Long]("id_b") == 2L &&
      out.head.getAs[Long]("hamming") == 0L)
  }

  test("q38 media stats totals match the documents table") {
    val stats = Multimodal.queries("q38_media_stats")(spark, sf)
    val total = stats.agg(sum(col("n_media"))).collect().head.getLong(0)
    assert(total == graft.Tables(spark, sf, "documents").count())
  }
}
