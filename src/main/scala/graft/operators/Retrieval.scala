package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval / serving-prep operators for the training-data pipeline:
  * BM25 lexical scoring, RAG-style overlapping chunking, per-dimension
  * embedding corpus statistics, and source-mix concentration — the
  * operators that sit between a cleaned corpus and a retrieval or
  * fine-tuning serving layer.
  *
  * == Integer-exact scoring ==
  * Everything the driver hash-compares is kept in integer micro/milli
  * units with explicit `div` (truncating integer division — verified
  * identical to DuckDB's `//` including negative operands): float
  * scoring formulas (BM25's tf saturation, Robertson idf, HHI shares)
  * are cleared of denominators so both engines do the same BIGINT
  * arithmetic. The BM25 idf uses the rational Robertson odds
  * (2N−2df+1)/(2df+1) rather than its logarithm — the q106 lesson:
  * libm `ln` may differ in the last ulp between engines, and a rank
  * or threshold must never sit on a float.
  */
object Retrieval {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Whitespace tokenizer shared with q93/q150 — one corpus explode. */
  private def toks(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))).as("tok"))

  private val sqlToks =
    """SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |  FROM documents""".stripMargin

  /** q187's query workload: a tiny phrase table (the query side of a
    * phrase-search serving layer). Kept as data, not constants baked
    * into the plan, so the operator shape is the production one:
    * broadcast(phrases) ⋈ postings. */
  private val phraseSet = Seq(
    (1L, "batch batch"), (2L, "merge sort"), (3L, "join order batch"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q187: exact PHRASE SEARCH over a positional inverted index —
    // the retrieval operator q125's document-level postings can't
    // answer (order matters: "merge sort" ≠ "sort merge"). The
    // classic n-way positional intersection is expressed as ONE
    // equi-join: postings (doc, pos, tok) ⋈ broadcast phrase terms
    // (term, offset) aligned on start = pos − offset; a start is an
    // occurrence iff it matched all L distinct offsets (repeated
    // terms like "batch batch" are handled by counting DISTINCT
    // offsets, not rows). At 100 TB the corpus is touched once by
    // the explode; the join carries only postings whose token appears
    // in some query phrase — the standard term-selectivity win of an
    // inverted index.
    "q187_phrase_search" -> ((s, d) => {
      import s.implicits._
      val pdf = phraseSet.toDF("phrase_id", "phrase")
        .select(col("phrase_id"),
          size(split(col("phrase"), " ")).as("plen"),
          posexplode(split(col("phrase"), " ")))
        .toDF("phrase_id", "plen", "offset", "term")
      val postings = t(s, d, "documents")
        .select(col("doc_id"),
          posexplode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))))
        .toDF("doc_id", "pos", "tok")
      postings.join(broadcast(pdf), col("tok") === col("term"))
        .withColumn("start", col("pos") - col("offset"))
        .filter(col("start") >= 0)
        .groupBy(col("doc_id"), col("phrase_id"), col("start"), col("plen"))
        .agg(count_distinct(col("offset")).as("hit"))
        .filter(col("hit") === col("plen"))
        .groupBy(col("doc_id"), col("phrase_id"))
        .agg(count(lit(1)).as("n_occ"))
    }),

    // q168: BM25 top-k retrieval (k1=1.2, b=0.75 cleared to the
    // integer form 44·tf·D / (20·tf·D + 6·D + 18·dl·N), scaled to
    // micro units). The query-term postings (tf) are restricted at
    // the corpus explode by an `isin` the scan can evaluate, so the
    // only doc-keyed shuffles carry ≤|terms| rows per doc; N/D are a
    // 1-row broadcast, the per-term df a |terms|-row broadcast. At
    // 1e9 docs the micro scale (1e6) still fits BIGINT for the sat
    // numerator up to D ≈ 2e11 tokens; beyond that drop the scale to
    // 1e3 — the constant is the only thing that changes.
    "q168_bm25_topk" -> ((s, d) => {
      val terms = Seq("spark", "join", "slow")
      val tk = toks(s, d)
      val dl = tk.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("d_total"))
      val tf = tk.filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
      val df_ = tf.groupBy(col("tok").as("df_tok")).agg(count(lit(1)).as("df"))
      tf.join(broadcast(df_), col("tok") === col("df_tok"))
        .join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("sat_micro",
          expr("(1000000L * 44L * tf * d_total) div (20L * tf * d_total + 6L * d_total + 18L * dl * n_docs)"))
        .withColumn("idf_micro",
          expr("(1000000L * (2L * n_docs - 2L * df + 1L)) div (2L * df + 1L)"))
        .groupBy(col("doc_id"))
        .agg(sum(expr("(idf_micro * sat_micro) div 1000000L")).as("score_micro"),
          count(lit(1)).as("n_terms_hit"))
        .orderBy(col("score_micro").desc, col("doc_id"))
        .limit(10)
    }),

    // q169: RAG chunking — fixed 16-token windows at stride 8
    // (half-overlap), each chunk fingerprinted for downstream exact
    // dedup of the chunk store. Pure per-row compute: tokenize once,
    // explode the start offsets from a catalyst `sequence`, slice —
    // zero exchanges, and the fingerprint is md5 (engine-portable).
    "q169_rag_chunks" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)).as("arr"))
        .withColumn("n", size(col("arr")))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("arr"), col("n"),
          explode(sequence(lit(0), col("n") - 1, lit(8))).as("chunk_start"))
        .select(col("doc_id"), col("chunk_start"),
          least(lit(16), col("n") - col("chunk_start")).as("chunk_len"),
          md5(concat_ws(" ", slice(col("arr"), col("chunk_start") + 1, lit(16))))
            .as("chunk_fp"))
    }),

    // q170: per-dimension embedding corpus statistics — the
    // normalization-stats pass a feature store runs before serving
    // (shift/scale, clip bounds). Values are floor-milli quantized at
    // the row (the q140 discipline: float→exact integer BEFORE any
    // aggregation), so sums/extrema/means are exact integers in both
    // engines. One posexplode + one dim-keyed aggregation; the
    // shuffle carries one row per (input row × dim) pre-aggregated
    // map-side to |dims| rows per partition.
    "q170_embedding_dim_stats" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(posexplode(col("embedding")))
        .toDF("dim", "x")
        // BIGINT dim on output: posexplode pos is INT, DuckDB's
        // generator subscript BIGINT
        .select(col("dim").cast("long").as("dim"),
          floor(col("x").cast("double") * lit(1000.0)).cast("long").as("milli"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("milli")).cast("long").as("sum_milli"),
          min(col("milli")).as("min_milli"),
          max(col("milli")).as("max_milli"))
        .withColumn("mean_micro", expr("(sum_milli * 1000L) div n"))
    }),

    // q173: 2-D Pareto front (skyline) of users by (activity count,
    // total value) — multi-objective curation selection ("most active
    // AND highest value") without a scoring weight. The naive skyline
    // is an O(n²) dominance self-join; in 2-D it collapses to ONE
    // sort: a point survives iff its value beats every value at
    // strictly higher activity (a RANGE window over n) and is maximal
    // within its own activity level. Both window frames share one
    // global sort — at scale a range-partitioned sort, never a join.
    // Values are floor-milli integers end-to-end.
    "q173_pareto_front" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pts = t(s, d, "events")
        .select(col("user_id"),
          floor(col("value") * lit(1000.0)).cast("long").as("vm"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("vm")).cast("long").as("v_milli"))
      // dominance test against PER-ACTIVITY-LEVEL maxima, not a global
      // range window over every user: perN is one distributed agg
      // (|distinct n| rows — bounded by distinct per-user event
      // counts, tiny at any corpus size), the suffix max runs over
      // that tiny relation only, and the verdict joins back broadcast.
      // The old un-partitioned RANGE window put every user through a
      // single task (the q138 cliff class).
      val perN = pts.groupBy(col("n")).agg(max(col("v_milli")).as("max_eq"))
      val suffix = perN.withColumn("max_gt",
        max(col("max_eq")).over(Window.orderBy(col("n"))
          .rangeBetween(1L, Window.unboundedFollowing)))
      pts.join(broadcast(suffix), "n")
        .filter(col("v_milli") > coalesce(col("max_gt"), lit(Long.MinValue)) &&
          col("v_milli") === col("max_eq"))
        .select(col("user_id"), col("n"), col("v_milli"))
    }),

    // q174: hybrid-retrieval rank fusion. q128 already gates RRF
    // algebra over two aggregate rankings of the same relation; what
    // this adds is the HYBRID case that algebra alone doesn't cover:
    // one ranking is corpus-derived (lexical tf of a query term, via
    // the token explode) and most documents are absent from it — the
    // left-join + zero-fill places every unranked doc after every
    // ranked one in a single deterministic ranking, which is the
    // behavior a BM25+metadata blender actually needs. rrf =
    // Σ 1e6/(60+rank) in exact integer division; row_number ranks
    // with doc_id tiebreaks so both engines agree bit-for-bit. At
    // 100 TB rank assignment becomes the range-partitioned sort +
    // partition-offset pattern (q141's note applies).
    "q174_rank_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = toks(s, d).filter(col("tok") === "spark")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
      // both rankings via ScalableRank (range partition + broadcast
      // offsets), not an un-partitioned row_number window — the q141
      // note the old comment deferred to, now done. Persisted once and
      // ranked independently per metric (nesting would re-execute the
      // token explode per range-sampling pass, see q138).
      val base = graft.CacheRegistry.getOrPersist(s, s"retrieval.q174base:$d") {
        t(s, d, "documents").select(col("doc_id"), col("n_chars"))
          .join(tf, Seq("doc_id"), "left")
          .na.fill(0L, Seq("tf"))
      }
      // both rankings fused into ONE groupedRowNumber pass over a
      // tagged union (r17 — q138's job-count rationale; both metrics
      // are BIGINTs, so the negated sort key is exact and per-tag
      // (ord, doc_id) is bit-identical to (metric desc, doc_id))
      val tagged = Seq((1, col("tf")), (2, col("n_chars")))
        .map { case (tg, m) =>
          base.select(col("doc_id"), lit(tg).as("tag"),
            (-m.cast("long")).as("ord"))
        }.reduce(_ unionByName _)
      val ranked = graft.operators.ScalableRank
        .groupedRowNumber(tagged, Seq("tag"), "_rank",
          col("ord"), col("doc_id"))
        .groupBy(col("doc_id"))
        .agg(max(when(col("tag") === 1, col("_rank"))).as("ra"),
          max(when(col("tag") === 2, col("_rank"))).as("rb"))
      ranked
        .select(col("doc_id"),
          expr("1000000L div (60L + ra) + 1000000L div (60L + rb)")
            .as("rrf_micro"),
          col("ra"), col("rb"))
        .orderBy(col("rrf_micro").desc, col("doc_id"))
        .limit(20)
    }),

    // q175: embedding-space health report — pairwise squared
    // distances between per-label centroids, all in exact integers
    // (floor-milli rows → per-(label, dim) sums → micro-unit centroid
    // components → 45-pair self-join over a 640-row relation). The
    // only corpus-scale stage is the posexplode + partial-aggregated
    // dim sum; everything after runs on |labels|×|dims| rows. The
    // report a curation dashboard uses to spot label collapse
    // (centroids too close) before training.
    "q175_label_centroid_dist" -> ((s, d) => {
      val cent = t(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding")))
        .toDF("label", "dim", "x")
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * lit(1000.0)).cast("long").as("milli"))
        .groupBy(col("label"), col("dim"))
        .agg(sum(col("milli")).cast("long").as("sm"), count(lit(1)).as("n"))
        .select(col("label"), col("dim"), expr("(sm * 1000L) div n").as("c_micro"))
      val a = cent.select(col("label").as("label_a"), col("dim"),
        col("c_micro").as("ca"))
      val b = cent.select(col("label").as("label_b"), col("dim").as("dim_b"),
        col("c_micro").as("cb"))
      a.join(b, col("dim") === col("dim_b") && col("label_a") < col("label_b"))
        .groupBy(col("label_a"), col("label_b"))
        .agg(sum((col("ca") - col("cb")) * (col("ca") - col("cb")))
          .cast("long").as("sq_dist_micro2"))
    }),

    // q176: hard-negative mining — for a deterministic ~1/16 hash
    // sample of anchor vectors, the nearest DIFFERENT-label vector by
    // exact integer squared distance on floor-milli components,
    // scored with the native codegen'd [[graft.functions.LongVecSqDist]]
    // expression (the zip_with+aggregate HOF formulation was measured
    // ~4× slower — higher-order functions never enter whole-stage
    // codegen). The anchors×corpus join is the candidate generator a
    // contrastive-training pipeline runs after ANN cell pruning; at
    // 100 TB the corpus side would first restrict to the anchor's IVF
    // probe cells (q62's operator) — the scoring algebra here is
    // unchanged by that composition.
    "q176_hard_negatives" -> ((s, d) => {
      val m = t(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))")
            .as("mm"))
      val anchors = m
        .filter(substring(md5(col("vec_id").cast("string").cast("binary")), 1, 1) === "0")
        .select(col("vec_id").as("aid"), col("label").as("alabel"),
          col("mm").as("am"))
      val scored = anchors.join(m, col("label") =!= col("alabel"))
        .select(col("aid"), col("alabel"), col("vec_id"), col("label"),
          graft.functions.VectorFunctions.vec_sqdist(col("am"), col("mm"))
            .as("d2"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("aid")).orderBy(col("d2"), col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("aid"), col("alabel"),
          col("vec_id").as("neg_id"), col("label").as("neg_label"), col("d2"))
    }),

    // q179: per-source document caps — the "max N docs per domain"
    // anti-monoculture rule every web-scale corpus applies, executed
    // through the NATIVE TopKPerGroupExec physical operator (partial
    // top-k per input partition BEFORE the shuffle, so the exchange
    // carries ≤ k rows per source per partition — the window
    // row_number formulation the oracle uses would shuffle every
    // document). Keep the 3 longest per source, doc_id tiebreak.
    "q179_source_caps" -> ((s, d) => {
      graft.plans.TopKPerGroup.topK(
        t(s, d, "documents").select(col("doc_id"), col("source"), col("n_chars")),
        Seq(col("source")),
        Seq(col("n_chars").desc, col("doc_id").asc),
        k = 3)
        .select(col("source"), col("doc_id"), col("n_chars"))
    }),

    // q180: training-export capstone — the composed tail of the
    // pipeline: quality floor → overlapping chunking (q169's op) →
    // exact chunk dedup keeping the earliest occurrence → hash-shard
    // assignment → per-shard manifest with an order-independent
    // checksum. Every stage is an operator gated individually
    // upstream; composition adds one groupBy per stage and nothing
    // driver-side. The checksum folds each fingerprint's first 4 hex
    // digits to an integer via position arithmetic (the q85
    // construction — portable to any engine with instr/substr) and
    // SUMS them, so it is partitioning-independent by construction.
    "q180_training_export" -> ((s, d) => {
      val chunks = t(s, d, "documents")
        .filter(col("n_chars") >= 100)
        .select(col("doc_id"),
          regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)).as("arr"))
        .withColumn("n", size(col("arr")))
        .filter(col("n") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n") - 1, lit(8))).as("cs"),
          col("arr"))
        .select(col("doc_id"), col("cs"),
          md5(concat_ws(" ", slice(col("arr"), col("cs") + 1, lit(16)))).as("fp"))
      val deduped = chunks
        .groupBy(col("fp"))
        .agg(min(struct(col("doc_id"), col("cs"))).as("first"))
        .select(col("fp"), col("first.doc_id").as("doc_id"))
      deduped
        // one-conv decodes (oracle keeps the instr spelling; identical
        // values — see the q99 rationale in Analytics.scala)
        .withColumn("h0", expr("CAST(conv(substr(fp, 1, 1), 16, 10) AS INT)"))
        .withColumn("chk", expr("CAST(conv(substr(fp, 1, 4), 16, 10) AS INT)"))
        .groupBy((col("h0") % 8).cast("int").as("shard"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("chk")).cast("long").as("checksum"))
    }),

    // q171: source-mix concentration — per ingest source, the
    // Herfindahl–Hirschman index of its language distribution in
    // exact micro units (Σ share², share = micro-scaled integer
    // division). A curation dashboard metric: HHI→1e6 means a
    // single-language source. Two tiny keyed aggregations.
    "q171_source_mix_hhi" -> ((s, d) => {
      val byLang = t(s, d, "documents")
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      val bySource = byLang.groupBy(col("source"))
        .agg(sum(col("c")).as("total"), count(lit(1)).as("n_langs"))
      byLang.join(bySource, "source")
        .withColumn("share_micro", expr("(c * 1000000L) div total"))
        .groupBy(col("source"), col("total").as("n_docs"), col("n_langs"))
        .agg(sum(expr("(share_micro * share_micro) div 1000000L")).as("hhi_micro"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q187_phrase_search" -> {
      val phraseValues = phraseSet.map { case (id, p) =>
        s"($id, [${p.split(' ').map(w => s"'$w'").mkString(", ")}])"
      }.mkString(", ")
      s"""WITH toks AS (SELECT doc_id,
         |    regexp_extract_all(lower(text), '\\S+') AS ws FROM documents),
         | ph AS (SELECT * FROM (VALUES $phraseValues) AS t(phrase_id, terms)),
         | occ AS (
         |  SELECT doc_id, CAST(phrase_id AS BIGINT) AS phrase_id,
         |   CAST(len(list_filter(
         |     generate_series(1, greatest(len(ws) - len(terms) + 1, 0)),
         |     s -> len(list_filter(generate_series(1, len(terms)),
         |            i -> ws[s + i - 1] = terms[i])) = len(terms)))
         |    AS BIGINT) AS n_occ
         |  FROM toks CROSS JOIN ph)
         |SELECT doc_id, phrase_id, n_occ FROM occ WHERE n_occ > 0""".stripMargin
    },
    "q168_bm25_topk" ->
      s"""WITH tk AS ($sqlToks),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
         |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS d_total
         |  FROM dl),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk
         |  WHERE tok IN ('spark', 'join', 'slow') GROUP BY 1, 2),
         |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
         |SELECT doc_id,
         | CAST(sum(divide((divide((1000000 * (2 * n_docs - 2 * df + 1)), (2 * df + 1))
         |   * (divide((1000000 * 44 * tf * d_total)
         |, (20 * tf * d_total + 6 * d_total + 18 * dl * n_docs))))
         |, 1000000)) AS BIGINT) AS score_micro,
         | count(*) AS n_terms_hit
         |FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id), stats
         |GROUP BY doc_id
         |ORDER BY score_micro DESC, doc_id
         |LIMIT 10""".stripMargin,

    "q169_rag_chunks" ->
      """WITH arrs AS (
        | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS arr,
        |  len(regexp_extract_all(lower(text), '\S+')) AS n
        | FROM documents),
        |starts AS (
        | SELECT doc_id, arr, n,
        |  unnest(generate_series(0, n - 1, 8)) AS chunk_start
        | FROM arrs WHERE n > 0)
        |SELECT doc_id, CAST(chunk_start AS INT) AS chunk_start,
        | CAST(least(16, n - chunk_start) AS INT) AS chunk_len,
        | md5(array_to_string(arr[chunk_start + 1 : chunk_start + 16], ' '))
        |  AS chunk_fp
        |FROM starts""".stripMargin,

    "q170_embedding_dim_stats" ->
      """WITH e AS (
        | SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT)
        |   AS milli
        | FROM embeddings)
        |SELECT dim, count(*) AS n,
        | CAST(sum(milli) AS BIGINT) AS sum_milli,
        | min(milli) AS min_milli, max(milli) AS max_milli,
        | CAST(divide(sum(milli) * 1000, count(*)) AS BIGINT) AS mean_micro
        |FROM e GROUP BY 1""".stripMargin,

    "q173_pareto_front" ->
      """WITH pts AS (
        | SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(floor(value * 1000.0) AS BIGINT)) AS BIGINT) AS v_milli
        | FROM events GROUP BY 1),
        |w AS (
        | SELECT user_id, n, v_milli,
        |  max(v_milli) OVER (ORDER BY n
        |    RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS max_gt,
        |  max(v_milli) OVER (PARTITION BY n) AS max_eq
        | FROM pts)
        |SELECT user_id, n, v_milli
        |FROM w
        |WHERE v_milli > coalesce(max_gt, CAST(-9223372036854775807 - 1 AS BIGINT))
        |  AND v_milli = max_eq""".stripMargin,

    "q174_rank_fusion" ->
      s"""WITH tf AS (
         | SELECT doc_id, count(*) AS tf FROM ($sqlToks)
         | WHERE tok = 'spark' GROUP BY 1),
         |base AS (
         | SELECT d.doc_id, d.n_chars, coalesce(tf.tf, 0) AS tf
         | FROM documents d LEFT JOIN tf ON d.doc_id = tf.doc_id),
         |ranked AS (
         | SELECT doc_id,
         |  row_number() OVER (ORDER BY tf DESC, doc_id) AS ra,
         |  row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rb
         | FROM base)
         |SELECT doc_id,
         | CAST(divide(1000000, (60 + ra)) + divide(1000000, (60 + rb)) AS BIGINT)
         |  AS rrf_micro,
         | CAST(ra AS BIGINT) AS ra, CAST(rb AS BIGINT) AS rb
         |FROM ranked
         |ORDER BY rrf_micro DESC, doc_id
         |LIMIT 20""".stripMargin,

    "q179_source_caps" ->
      """SELECT source, doc_id, n_chars
        |FROM (SELECT source, doc_id, n_chars,
        |   row_number() OVER (PARTITION BY source
        |     ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 3""".stripMargin,

    "q180_training_export" ->
      """WITH arrs AS (
        | SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS arr,
        |  len(regexp_extract_all(lower(text), '\S+')) AS n
        | FROM documents WHERE n_chars >= 100),
        |chunks AS (
        | SELECT doc_id, unnest(generate_series(0, n - 1, 8)) AS cs, arr, n
        | FROM arrs WHERE n > 0),
        |fps AS (
        | SELECT doc_id, cs,
        |  md5(array_to_string(arr[cs + 1 : cs + 16], ' ')) AS fp
        | FROM chunks),
        |deduped AS (
        | SELECT fp, doc_id FROM (
        |  SELECT fp, doc_id,
        |   row_number() OVER (PARTITION BY fp ORDER BY doc_id, cs) AS rn
        |  FROM fps)
        | WHERE rn = 1)
        |SELECT CAST((instr('0123456789abcdef', substr(fp, 1, 1)) - 1) % 8
        |   AS INT) AS shard,
        | count(*) AS n_chunks,
        | count(DISTINCT doc_id) AS n_docs,
        | CAST(sum((instr('0123456789abcdef', substr(fp, 1, 1)) - 1) * 4096
        |  + (instr('0123456789abcdef', substr(fp, 2, 1)) - 1) * 256
        |  + (instr('0123456789abcdef', substr(fp, 3, 1)) - 1) * 16
        |  + (instr('0123456789abcdef', substr(fp, 4, 1)) - 1)) AS BIGINT)
        |  AS checksum
        |FROM deduped
        |GROUP BY 1""".stripMargin,

    "q175_label_centroid_dist" ->
      """WITH e AS (
        | SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
        |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT)
        |   AS milli
        | FROM embeddings),
        |cent AS (
        | SELECT label, dim,
        |  CAST(divide(CAST(sum(milli) AS BIGINT) * 1000, count(*)) AS BIGINT)
        |   AS c_micro
        | FROM e GROUP BY 1, 2)
        |SELECT a.label AS label_a, b.label AS label_b,
        | CAST(sum((a.c_micro - b.c_micro) * (a.c_micro - b.c_micro))
        |  AS BIGINT) AS sq_dist_micro2
        |FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        |GROUP BY 1, 2""".stripMargin,

    "q176_hard_negatives" ->
      """WITH m AS (
        | SELECT vec_id, label,
        |  list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS mm
        | FROM embeddings),
        |anchors AS (
        | SELECT vec_id AS aid, label AS alabel, mm AS am FROM m
        | WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) = '0'),
        |scored AS (
        | SELECT aid, alabel, vec_id, label,
        |  (SELECT CAST(sum((ax - vx) * (ax - vx)) AS BIGINT)
        |   FROM (SELECT unnest(am) AS ax, unnest(mm) AS vx)) AS d2
        | FROM anchors JOIN m ON label <> alabel),
        |ranked AS (
        | SELECT aid, alabel, vec_id, label, d2,
        |  row_number() OVER (PARTITION BY aid ORDER BY d2, vec_id) AS rn
        | FROM scored)
        |SELECT aid, alabel, vec_id AS neg_id, label AS neg_label, d2
        |FROM ranked WHERE rn = 1""".stripMargin,

    "q171_source_mix_hhi" ->
      """WITH by_lang AS (
        | SELECT source, lang, count(*) AS c FROM documents GROUP BY 1, 2),
        |by_source AS (
        | SELECT source, CAST(sum(c) AS BIGINT) AS total,
        |  count(*) AS n_langs
        | FROM by_lang GROUP BY 1)
        |SELECT source, total AS n_docs, n_langs,
        | CAST(sum(divide((divide(c * 1000000, total)) * (divide(c * 1000000, total))
        |, 1000000)) AS BIGINT) AS hhi_micro
        |FROM by_lang JOIN by_source USING (source)
        |GROUP BY 1, 2, 3""".stripMargin)
}
