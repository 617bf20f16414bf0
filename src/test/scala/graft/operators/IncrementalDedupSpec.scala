package graft.operators

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, text: String)

/** Typed row for the q237 streaming vector-search spec. */
case class Vec(vec_id: Long, embedding: Array[Float])

/** The q82 incremental-dedup construction under micro-batch
  * boundaries: documents arriving across SEVERAL micro-batches must
  * produce exactly the result of banding them all at once — the
  * property that makes the stream-static band join a correct
  * continuous-ingest dedup (candidate generation is stateless in-row
  * banding; only the final per-doc aggregate holds state).
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val corpusDocs = Seq(
    Doc(1L, "the quick brown fox jumps over the lazy dog"),
    Doc(2L, "pack my box with five dozen liquor jugs"),
    Doc(3L, "sphinx of black quartz judge my vow today"))

  private val incoming = Seq(
    // near-identical to doc 1 — must match
    Doc(100L, "the quick brown fox jumps over the lazy dog"),
    // shares most shingles with doc 2 — should bucket with it
    Doc(101L, "pack my box with five dozen liquor jugs again"),
    // unrelated — must not match
    Doc(102L, "completely different words having nothing shared whatsoever"))

  test("incremental band-join dedup equals the all-at-once batch answer") {
    import spark.implicits._
    val corpus = StreamingParity.inRowBands(corpusDocs.toDF("doc_id", "text"))
      .select(col("doc_id").as("corpus_doc"), col("band"), col("bh"))

    val stream = MemoryStream[Doc](30, spark, None)
    val agg = StreamingParity.inRowBands(stream.toDF())
      .join(corpus, Seq("band", "bh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_band_hits"),
        size(collect_set(col("corpus_doc"))).cast("long").as("n_near_dups"),
        min(col("corpus_doc")).as("min_match"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("inc_dedup").start()
    try {
      // one incoming doc per micro-batch: candidates for doc N must be
      // unaffected by which batch carried it
      incoming.foreach { d => stream.addData(d); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("inc_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val batch = StreamingParity.inRowBands(incoming.toDF("doc_id", "text"))
      .join(corpus, Seq("band", "bh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_band_hits"),
        size(collect_set(col("corpus_doc"))).cast("long").as("n_near_dups"),
        min(col("corpus_doc")).as("min_match"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got == batch)
    val byDoc = got.map(t => t._1 -> t).toMap
    assert(byDoc.contains(100L) && byDoc(100L)._4 == 1L,
      "identical doc must match its corpus twin across the batch boundary")
    assert(!byDoc.contains(102L), "unrelated doc must not produce candidates")
  }

  test("q237 streaming vector search across micro-batches equals the all-at-once batch answer") {
    import spark.implicits._
    // real vectors from the gate table: corpus = vec_id % 4 != 0
    // (the standing index), incoming = the first 30 of the % 4 == 0
    // split, delivered TEN per micro-batch — per-query results must
    // be invariant to which batch carried the query. The streamed
    // side runs the GATE's per-batch foreachBatch emission (r14
    // verdict #1: no streaming aggregation state at all); the union
    // of the per-batch summaries must equal the all-at-once batch
    // twin exactly, which holds because each query's probes, hits
    // and summary live inside the one batch that carried it.
    val all = graft.Tables(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1).toArray))
    val corpus = StreamingParity.vectorIndexOf(
      all.filter(_.vec_id % 4 != 0).toSeq.toDF("vec_id", "embedding"))
    val incoming = all.filter(_.vec_id % 4 == 0).sortBy(_.vec_id).take(30).toSeq
    assert(incoming.size == 30)

    val stream = MemoryStream[Vec](31, spark, None)
    val hits = StreamingParity.vectorSearchHits(stream.toDF(), corpus,
      radius = 2)
    val streamed = StreamingParity.runPerBatchToParquet(hits, "spec-vecsearch",
      drive = q => incoming.grouped(10).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      })(StreamingParity.vectorSearchSummary)

    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val got = keyed(streamed
      .select("query_id", "n_candidates", "best_cos", "best_cand").collect())
    val batch = keyed(StreamingParity.streamVectorSearch(
      incoming.toDF("vec_id", "embedding"), corpus, radius = 2)
      .collect())
    assert(got == batch,
      "micro-batch boundaries changed the streaming search result")
    // the search must find SOMETHING at gate scale, and every best
    // match must come from the corpus split, never the query's own
    assert(got.nonEmpty, "no query found any candidate — vacuous spec")
    got.foreach { case (qid, n, _, best) =>
      assert(n >= 1L && best % 4 != 0L && best != qid, s"query $qid")
    }
  }

  test("q238 streaming top-k retrieval across micro-batches equals the all-at-once batch ranking") {
    import spark.implicits._
    // q237's delivery discipline applied to the TOP-K form: the
    // per-batch window ranking must union to the global ranking,
    // which holds because every hit of a query lives in the one
    // batch that carried the query
    val all = graft.Tables(spark, TestSpark.sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => Vec(r.getLong(0), r.getSeq[Float](1).toArray))
    val corpus = StreamingParity.vectorIndexOf(
      all.filter(_.vec_id % 4 != 0).toSeq.toDF("vec_id", "embedding"))
    val incoming = all.filter(_.vec_id % 4 == 0).sortBy(_.vec_id).take(30).toSeq

    val stream = MemoryStream[Vec](32, spark, None)
    val hits = StreamingParity.vectorSearchHits(stream.toDF(), corpus,
      radius = 2)
    val streamed = StreamingParity.runPerBatchToParquet(hits, "spec-vectopk",
      drive = q => incoming.grouped(10).foreach { chunk =>
        stream.addData(chunk); q.processAllAvailable()
      })(b => StreamingParity.vectorSearchTopK(b, 3))

    def keyed(rows: Array[org.apache.spark.sql.Row]) = rows
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(1), r.getInt(2),
        r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val cols = Seq("query_id", "cand_id", "probe_hamming", "cos_sim", "rn")
    val got = keyed(streamed.select(cols.head, cols.tail: _*).collect())
    val batch = keyed(StreamingParity.vectorSearchTopK(
      StreamingParity.vectorSearchHits(
        incoming.toDF("vec_id", "embedding"), corpus, radius = 2), 3)
      .select(cols.head, cols.tail: _*).collect())
    assert(got == batch,
      "micro-batch boundaries changed the streaming top-k ranking")
    assert(got.nonEmpty, "no query ranked any candidate — vacuous spec")
    // ranks are dense from 1 per query
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq, s"query $qid")
    }
  }

  test("q237's streamed budget stamp equals the batch selector's choice on the same corpus") {
    // r14 verdict #2: the streaming search must take its flip budget
    // from selectMarginBudget at index-build time, not a hard-coded
    // radius — pinned end-to-end: run the GATE query (real file
    // stream + foreachBatch emission) and assert every emitted row
    // carries exactly the budget the batch selector picks for the
    // same corpus split, same tag, same target.
    val d = TestSpark.sf
    val corpusEmb = graft.Tables(spark, d, "embeddings")
      .filter(col("vec_id") % 4 =!= 0)
    val expected = Similarity.selectMarginBudget(corpusEmb,
      tag = s"streamvec:$d", targetRecallMicro = 40000L)
    // drop the memo the line above populated (r15 ADVICE): otherwise
    // the gate below is SERVED this very entry and the assert could
    // never catch it calibrating from a wrong corpus/tag — releasing
    // the key forces the gate to recalibrate independently
    graft.CacheRegistry.releaseScalar(spark,
      Similarity.marginBudgetKey(s"streamvec:$d", 40000L))
    val res = graft.SparkEntry.queries("q237_stream_vector_search")(spark, d)
    val budgets = res.select(col("budget")).distinct().collect()
      .map(_.getInt(0)).toSeq
    assert(budgets == Seq(expected),
      s"streamed budget stamp $budgets != selector's choice $expected")
    // q238 rides the same front (streamSearchFront) — its stamp must
    // be the same selection
    val res238 = graft.SparkEntry.queries("q238_stream_vector_topk")(spark, d)
    val budgets238 = res238.select(col("budget")).distinct().collect()
      .map(_.getInt(0)).toSeq
    assert(budgets238 == Seq(expected),
      s"q238 budget stamp $budgets238 != selector's choice $expected")
  }

  test("signature-scheme checkpoint guard fails loudly on a cross-version resume") {
    // r11 ADVICE: the version stamp on in-session registry keys cannot
    // reach an on-disk checkpoint; a q82-shape stream resumed across a
    // scheme change would silently drop matches. The guard must (a)
    // stamp a fresh checkpoint, (b) accept a same-version restart,
    // (c) THROW on a version mismatch instead of under-reporting.
    val ck = java.nio.file.Files.createTempDirectory("graft-guard-ck").toString
    StreamingParity.guardSignatureCheckpoint(spark, ck)   // (a) stamps
    StreamingParity.guardSignatureCheckpoint(spark, ck)   // (b) idempotent
    val marker = java.nio.file.Paths.get(ck, "graft-signature-scheme")
    assert(new String(java.nio.file.Files.readAllBytes(marker), "UTF-8").trim
      == s"v${TextDedup.SignatureSchemeVersion}")
    // simulate a checkpoint written under the previous scheme —
    // through the Hadoop FS (the guard's own read path), so the local
    // ChecksumFileSystem's .crc sidecar stays consistent
    val hp = new org.apache.hadoop.fs.Path(ck, "graft-signature-scheme")
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write("v2".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalArgumentException] {
      StreamingParity.guardSignatureCheckpoint(spark, ck)  // (c) loud
    }
    assert(e.getMessage.contains("incompatible") && e.getMessage.contains("v2"))
  }
}
