package graft.examples

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The three runnable demos, asserted — no untested code in the repo.
  * Each demo's `run` executes against the shared test session and
  * returns its result line; the assertions pin the semantics the
  * demos exist to show (dead-lettering, byte-shrinking resize,
  * shuffle-free bucketed joins, salt-invariant skew joins).
  */
class ExamplesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def kv(line: String): Map[String, String] =
    line.split(' ').drop(1).map(_.split('=')).collect {
      case Array(k, v) => k -> v
    }.toMap

  test("PipelineDemo: all records land, the corrupt one dead-letters") {
    val dir = java.nio.file.Files.createTempDirectory("demo").toString
    val line = PipelineDemo.run(spark, s"$dir/out", s"$dir/ckpt", "native")
    val m = kv(line)
    assert(m("records").toLong === 1000L)
    assert(m("quarantined").toLong === 1L)
    assert(m("metric").toLong === 1000L)
  }

  test("MultimodalDemo: features per media row, resize shrinks bytes, frames fan out") {
    val line = MultimodalDemo.run(spark, TestSpark.sf, 4, 8)
    val m = kv(line)
    assert(m("media").toLong > 0)
    assert(m("features").toLong === m("media").toLong)
    val Array(o, r) = m("bytes").split("->").map(_.toLong)
    assert(r < o, s"resize factor 4 must shrink total bytes: $o -> $r")
  }

  test("ScaleDemo: bucketed join plans fewer shuffles, salting keeps the row count") {
    val line = ScaleDemo.run(spark, TestSpark.sf)
    val m = kv(line)
    assert(m("bucketed_shuffles").toInt < m("plain_shuffles").toInt,
      s"bucketing must remove join shuffles: $line")
    assert(m("rows_equal") === "true")
    assert(m("skew_plain").toLong === m("skew_salted").toLong,
      "salted join must be row-identical to the plain join")
  }
}
