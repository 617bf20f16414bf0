package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q(name: String) = Retrieval.queries(name)(spark, sf)

  test("q187 phrase occurrences match a plain-Scala sliding-window recount") {
    val phrases = Map(
      1L -> Seq("batch", "batch"),
      2L -> Seq("merge", "sort"),
      3L -> Seq("join", "order", "batch"))
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> "\\S+".r.findAllIn(r.getString(1)).toVector)
    val expected = (for {
      (docId, ws) <- docs.toSeq
      (pid, terms) <- phrases.toSeq
      n = ws.sliding(terms.size).count(_ == terms)
      if n > 0
    } yield (docId, pid, n.toLong)).toSet
    val got = q("q187_phrase_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "corpus should contain at least one phrase hit")
  }

  test("q187 repeated-term phrase does not double-count overlapping starts") {
    // "batch batch" in a run of k consecutive 'batch' tokens must
    // count k-1 occurrences (every start), which the DISTINCT-offset
    // grouping yields; a row-count grouping would overcount.
    val runs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map { r =>
        val ws = "\\S+".r.findAllIn(r.getString(1)).toVector
        r.getLong(0) -> ws.sliding(2).count(w => w == Vector("batch", "batch")).toLong
      }.filter(_._2 > 0).toMap
    val got = q("q187_phrase_search").filter(col("phrase_id") === 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === runs)
  }
}
