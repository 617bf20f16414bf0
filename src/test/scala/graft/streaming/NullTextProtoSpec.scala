package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Null-text documents through the proto encode/decode gates (q149,
  * q207). The shipped corpora have no null text, so the oracle gate
  * cannot cover this path — and the r7 review showed the first fix
  * attempt was unreachable: `size(ws)` on a NULL array short-circuits
  * a primitive-parameter UDF to NULL before its body runs. The fix
  * coalesces the extracted array to array() IN the relation; this
  * spec pins that a null-text row flows through both roundtrips as an
  * empty-tokens document, not a NULL value row.
  */
class NullTextProtoSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-nulltext").toString
    Seq(
      (1L, "alpha beta alpha", "en", "srcA", 16L),
      (2L, null.asInstanceOf[String], "de", "srcB", 0L),
      (3L, "", "en", "srcA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q149 nested roundtrip emits the null-text row as an empty-tokens doc") {
    val rows = graft.streaming.ProtoParity
      .queries("q149_proto_nested_roundtrip")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_head"), r.getAs[String]("lang"), r.getAs[Long]("n_tok")))
      .toMap
    assert(rows.size === 3, "the null-text row must not vanish")
    assert(rows(2L) === ((0, "de", 0L)))
    assert(rows(1L) === ((3, "en", 3L)))
  }

  test("q207 map roundtrip emits the null-text row as an empty map") {
    val rows = graft.streaming.ProtoParity
      .queries("q207_proto_map_roundtrip")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_keys"), Option(r.get(r.fieldIndex("the_cnt")))))
      .toMap
    assert(rows.size === 3)
    assert(rows(2L) === ((0, None)))
  }
}
