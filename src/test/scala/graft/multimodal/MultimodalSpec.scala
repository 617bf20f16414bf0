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

  test("q38 media stats totals match the documents table") {
    val stats = Multimodal.queries("q38_media_stats")(spark, sf)
    val total = stats.agg(sum(col("n_media"))).collect().head.getLong(0)
    assert(total == graft.Tables(spark, sf, "documents").count())
  }
}
