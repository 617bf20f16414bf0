package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Analytics3Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def q(name: String) = Analytics3.queries(name)(spark, sf)

  test("q191 interval union equals a plain-Scala sweep-line recompute") {
    val events = graft.Tables(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS st").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      val iv = evs.map { case (_, id, st) => (st, st + (id % 3600) * 1000000L, id) }
        .sortBy(x => (x._1, x._3))
      // classic sweep: merge while next start <= running max end
      var islands = List.empty[(Long, Long, Long)] // (s0, e1, n)
      iv.foreach { case (s, e, _) =>
        islands match {
          case (s0, e1, n) :: rest if s <= e1 =>
            islands = (s0, math.max(e1, e), n + 1) :: rest
          case _ => islands = (s, e, 1L) :: islands
        }
      }
      u -> ((islands.size.toLong,
        islands.map(i => i._2 - i._1).sum,
        islands.map(_._3).max))
    }
    val got = q("q191_interval_union").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }

  test("q145 PII redaction: planted contact is always found, redacted text is clean") {
    val rows = q("q145_pii_redaction").collect()
    val nDocs = graft.Tables(spark, sf, "documents").count()
    assert(rows.length == nDocs, "one audit row per document")
    // every doc had exactly one synthetic email planted; natural text
    // in the fixture carries none, so the detector must report >= 1
    // (== 1 unless the doc text itself contains an address)
    assert(rows.forall(_.getAs[Long]("n_emails") >= 1L))
    // the planted 4-digit ref code is always present
    assert(rows.forall(_.getAs[Long]("n_codes") >= 1L))
    // redaction is complete: recompute the redacted text for a sample
    // of docs and assert no email-shaped span survives
    val aug = graft.Tables(spark, sf, "documents").limit(20)
      .select(col("doc_id"),
        lower(concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@ex"), col("doc_id") % 7, lit(".org ref "),
          lpad(((col("doc_id") * 37) % 10000).cast("string"), 4, "0"))).as("t2"))
      .withColumn("red", regexp_replace(regexp_replace(col("t2"),
        "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}", "<EMAIL>"),
        "\\b\\d{4}\\b", "<NUM>"))
      .collect()
    aug.foreach { r =>
      val red = r.getAs[String]("red")
      assert(!red.matches(".*[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}.*"),
        s"doc ${r.getAs[Long]("doc_id")}: email survived redaction")
      assert(red.contains("<EMAIL>"))
    }
  }

  test("q146 classifier: scores equal a plain-Scala recompute of the hashed linear model") {
    val rows = q("q146_quality_classifier").collect()
    val nDocs = graft.Tables(spark, sf, "documents").count()
    assert(rows.length == nDocs, "one score row per document (fixture docs all tokenize)")
    // independent reimplementation (JVM MessageDigest, no Spark)
    val docs = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(25).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(tok: String): Long = {
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      (java.lang.Long.parseLong(hex, 16) % 61) - 30
    }
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.foreach { r =>
      val toks = "[a-z]+".r.findAllIn(r.getAs[String]("text").toLowerCase).toSeq
      val row = byId(r.getAs[Long]("doc_id"))
      assert(row.getAs[Long]("n_tok") == toks.length.toLong)
      assert(row.getAs[Long]("score") == toks.map(weight).sum)
      assert(row.getAs[Long]("quality_pass") ==
        (if (toks.map(weight).sum > 0) 1L else 0L))
    }
  }

  test("q208 Gini matches a plain-Scala sorted-rank recompute, bounded [0, 1e6)") {
    val rows = q("q208_source_gini").collect()
    assert(rows.nonEmpty)
    val lens = graft.Tables(spark, sf, "documents")
      .select(col("source"), col("n_chars"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_chars"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val vs = lens(src)
      val n = vs.length.toLong
      assert(r.getAs[Long]("n_docs") === n)
      val s = vs.map(BigInt(_)).sum
      val twoIv = vs.zipWithIndex
        .map { case (v, i) => BigInt(2) * (i + 1) * v }.sum
      val expected = ((twoIv - (n + 1) * s) * 1000000 / (n * s)).toLong
      val g = r.getAs[Long]("gini_micro")
      assert(g === expected, s"source=$src")
      assert(g >= 0L && g < 1000000L)
    }
  }
}
