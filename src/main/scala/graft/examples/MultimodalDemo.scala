package graft.examples

import graft.GraftSession
import graft.multimodal.Multimodal
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Example: multimodal feature pipeline — binary payload table →
  * partition-batched decode → features, resize, frame sampling.
  * Run: sbt "runMain graft.examples.MultimodalDemo /root/testdata/sf0.001 [resizeFactor] [nFrames]"
  */
object MultimodalDemo {
  /** Body shared by `main` and ExamplesSpec: runs against the caller's
    * session and returns the result line instead of owning stdout. */
  def run(spark: SparkSession, dir: String, factor: Int, nFrames: Int): String = {
    val media = Multimodal.mediaTable(spark, dir)
    val feats = Multimodal.extractFeatures(media, Multimodal.FakeDecoder)
    val resized = Multimodal.resize(media, factor)
    val frames = Multimodal.sampleFrames(media, nFrames)

    val f = feats.toDF().agg(
      count(lit(1)).as("n"),
      round(avg(col("brightness")), 2).as("avg_brightness"),
      min(col("width")).as("min_w"), max(col("height")).as("max_h")).collect().head
    val rBytes = resized.toDF().agg(sum(col("n_bytes"))).collect().head.getLong(0)
    val oBytes = media.toDF().agg(sum(col("n_bytes"))).collect().head.getLong(0)
    val nf = frames.count()
    val nVideo = media.filter(_.media_type == "video").count()
    s"MM_RESULT media=${media.count()} features=${f.getLong(0)} " +
      s"avg_brightness=${f.getDouble(1)} dims=[${f.getInt(2)}..${f.getInt(3)}] " +
      s"bytes=$oBytes->$rBytes frames=$nf (videos=$nVideo x $nFrames)"
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val factor = if (args.length > 1) args(1).toInt else 4
    val nFrames = if (args.length > 2) args(2).toInt else 8
    val spark = GraftSession.build("local[4]", 4)
    println(run(spark, dir, factor, nFrames))
    spark.stop()
  }
}
