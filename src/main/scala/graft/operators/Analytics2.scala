package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth tranche of analytics operators (round 4): slowly-changing-
  * dimension interval construction, Markov transition matrices,
  * numeric profiling histograms, inverted-index construction, and
  * graph triangle counting over a thresholded co-occurrence graph.
  *
  * None of these exist in the reference pipeline (SURVEY.md §2.1 is
  * an ingest pipe); they extend the training-data / warehouse surface
  * the same way Analytics/TextDedup do. Every query has a DuckDB
  * oracle twin and follows the repo determinism policy
  * (Relational.scala): integer/timestamp outputs only where floats
  * would be engine-ambiguous, unique-key tiebreaks on every ordering,
  * md5 as the only hash.
  */
object Analytics2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Auto-oriented form the gate queries use: degree orientation only
    * ENGAGES above `spark.graft.triangles.degreeOrientMinEdges`
    * (default 1M — the [[Components]] hotSplitMinNodes pattern). Below
    * that the whole graph is a handful of tasks, no key can dominate
    * one, and the two degree joins are pure overhead — measured at
    * sf0.1 they cost 0.45 → 2.5 s isolated on a 3k-edge graph, bought
    * nothing. Orientation cannot change the triangle set (see
    * [[trianglesOf]]), so the switch is invisible to the oracles; the
    * edge count is one aggregate over the already-persisted pair
    * relation. */
  private[graft] def trianglesAuto(edges: DataFrame,
      countMemoKey: Option[String] = None): DataFrame = {
    val minEdges = edges.sparkSession.conf
      .getOption("spark.graft.triangles.degreeOrientMinEdges")
      .map(_.toLong).getOrElse(1000000L)
    // the sizing count is a data-dependent plan decision that runs at
    // DataFrame-CONSTRUCTION time; keyed callers (q126/q188 share one
    // edge relation) memoize it so building both plans — or inspecting
    // one repeatedly — runs the job once per (session, key) (r10 ADVICE)
    val n = countMemoKey match {
      case Some(k) =>
        graft.CacheRegistry.getOrComputeLong(edges.sparkSession, k)(edges.count())
      case None => edges.count()
    }
    trianglesOf(edges, byDegree = n >= minEdges)
  }

  /** Distributed triangle enumeration over an undirected edge list
    * (columns `p1 < p2`, one row per edge) → id-sorted corner triples
    * `(a < b < c)`.
    *
    * Orientation is DEGREE-first ((deg, id) lexicographic): every
    * undirected edge becomes one directed edge from its
    * (deg, id)-smaller endpoint. Any total order counts each triangle
    * exactly once (the order makes each triangle a DAG with a unique
    * 2-out-degree source, and the e1⋈e2⋈e3 pattern matches only the
    * src→mid→dst path from that source), so the TRIANGLE SET is
    * invariant to the order chosen — the oracle keeps the plain
    * id-oriented SQL as proof. What the order changes is the join
    * fan-out: under id orientation a power-law hub whose id splits its
    * neighbor ids keeps in·out ≈ (d/2)² wedge candidates on its single
    * middle-vertex join key (the one-task cliff ScaleEvidence path 8
    * measures A/B); under degree orientation the hub is the
    * (deg, id)-maximum of every incident edge, so its out-degree is 0
    * and wedge generation moves to the low-degree corners — max
    * out-degree is O(√E) on ANY graph (an orientation-width/arboricity
    * bound), so no single join key can explode regardless of the
    * degree distribution. Cost of the guard: two cheap joins against
    * the |V|-row degree relation (broadcast at gate scale, key-
    * partitioned at 100 TB). Corners are re-normalized to id order
    * after enumeration (an in-row sort_array — overflow-free for any
    * long ids) so callers and oracles never see the orientation.
    */
  private[graft] def trianglesOf(edges: DataFrame,
      byDegree: Boolean = true): DataFrame = {
    val oriented =
      if (!byDegree) edges.select(col("p1").as("src"), col("p2").as("dst"))
      else {
        val deg = edges.select(col("p1").as("v"))
          .union(edges.select(col("p2").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("dv"))
        // p1 < p2 on every input row, so (d1, p1) < (d2, p2) ⇔ d1 ≤ d2
        edges
          .join(deg.select(col("v").as("p1"), col("dv").as("d1")), Seq("p1"))
          .join(deg.select(col("v").as("p2"), col("dv").as("d2")), Seq("p2"))
          .select(
            when(col("d1") <= col("d2"), col("p1")).otherwise(col("p2"))
              .as("src"),
            when(col("d1") <= col("d2"), col("p2")).otherwise(col("p1"))
              .as("dst"))
      }
    val e1 = oriented.as("e1")
    val e2 = oriented.as("e2")
    val e3 = oriented.as("e3")
    e1.join(e2, col("e1.dst") === col("e2.src"))
      .join(e3, col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"), col("e2.dst").as("z"))
      // in-row 3-element sort: overflow-free for ANY long ids (the
      // old x+y−least−greatest middle could overflow near
      // Long.MaxValue/3 — r10 ADVICE), still no shuffle
      .select(sort_array(array(col("x"), col("y"), col("z"))).as("s"))
      .select(col("s").getItem(0).as("a"), col("s").getItem(1).as("b"),
        col("s").getItem(2).as("c"))
  }

  /** Distinct (order, part) pairs and the support-counted co-purchase
    * edge list — q126 (triangles) and q127 (association rules) both
    * start from the same self-join, so the pair relation is persisted
    * once via [[graft.CacheRegistry]] (the q28/q29 shingle pattern).
    * The ≥ 2 support threshold is applied by the callers that need
    * it; the persisted relation carries the raw pair counts.
    */
  /** Per-document repetition metrics (the Gopher-rule family, Rae et
    * al. 2021 §A1.1): distinct-token ratio, top-unigram share (of n
    * token slots) and top-bigram share (of n−1 bigram SLOTS — a true
    * fraction ≤ 1e6 micro; an overlapping-occurrence × 2/n form can
    * exceed 100%, review r11), all exact integer micro-units. ONE
    * definition feeds both the per-doc gate (q131) and the per-source
    * rollup (TextDedup q225) — persisted per (session, dir) so the
    * documents scan + tokenization run once, not once per consumer
    * (review r11). Shape: in-row array work plus two doc-keyed
    * partial-aggregated shuffles; no cross-doc state. */
  private[operators] def repetitionPerDoc(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrPersist(s, s"analytics2.repdoc:$d") {
      val toks = t(s, d, "documents")
        .select(col("doc_id"),
          regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)).as("l"))
        .filter(size(col("l")) >= 2)
      val base = toks.select(col("doc_id"), size(col("l")).as("n"),
        size(array_distinct(col("l"))).as("nd"))
      val topUni = toks
        .select(col("doc_id"), explode(col("l")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("max_uni"))
      val topBi = toks
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(l) - 1)," +
            " i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"))
          .as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id")).agg(max(col("c")).as("max_bi"))
      base.join(topUni, Seq("doc_id")).join(topBi, Seq("doc_id"))
        .select(col("doc_id"), col("n").cast("long").as("n_tok"),
          expr("nd * 1000000 div n").cast("long").as("distinct_micro"),
          expr("max_uni * 1000000 div n").as("top_unigram_micro"),
          expr("max_bi * 1000000 div (n - 1)").as("top_bigram_micro"))
    }

  /** DuckDB twin of [[repetitionPerDoc]] as a WITH-body ending in
    * `repdoc(doc_id, n_tok, distinct_micro, top_unigram_micro,
    * top_bigram_micro)` — shared by the q131 and q225 oracles. */
  private[operators] val repetitionPerDocCte: String =
    """toks AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS l
      |  FROM documents),
      | rbase AS (
      |  SELECT doc_id, len(l) AS n, len(list_distinct(l)) AS nd
      |  FROM toks WHERE len(l) >= 2),
      | uni AS (
      |  SELECT doc_id, max(c) AS max_uni FROM (
      |   SELECT doc_id, count(*) AS c FROM (
      |    SELECT doc_id, unnest(l) AS tok FROM toks WHERE len(l) >= 2)
      |   GROUP BY doc_id, tok)
      |  GROUP BY 1),
      | bi AS (
      |  SELECT doc_id, max(c) AS max_bi FROM (
      |   SELECT doc_id, count(*) AS c FROM (
      |    SELECT doc_id, l[i] || ' ' || l[i + 1] AS bg FROM (
      |     SELECT doc_id, l, unnest(range(1, len(l))) AS i
      |     FROM toks WHERE len(l) >= 2))
      |   GROUP BY doc_id, bg)
      |  GROUP BY 1),
      | repdoc AS (
      |  SELECT rbase.doc_id, CAST(n AS BIGINT) AS n_tok,
      |   CAST(divide(nd * 1000000, n) AS BIGINT) AS distinct_micro,
      |   divide(max_uni * 1000000, n) AS top_unigram_micro,
      |   divide(max_bi * 1000000, (n - 1)) AS top_bigram_micro
      |  FROM rbase
      |  JOIN uni ON rbase.doc_id = uni.doc_id
      |  JOIN bi ON rbase.doc_id = bi.doc_id)""".stripMargin

  private def copurchasePairs(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrPersist(s, s"analytics2.copairs:$d") {
      val op = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      op.as("a").join(op.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
        .agg(count(lit(1)).as("n_pair"))
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q122: SCD Type-2 interval construction (gaps-and-islands) — the
    // warehouse op that turns an event log into a dimension history:
    // consecutive runs of the same per-user event_type collapse into
    // one [valid_from, valid_to) row, valid_to = next run's start
    // (NULL while current). The island id is the classic rn − rn_by_key
    // difference: two row_number passes over the SAME (user, ts,
    // event_id) order, so both windows reuse one sort+shuffle on
    // user_id (Catalyst plans a single Exchange + Sort). The run
    // collapse is then an ordinary hash agg and the valid_to lookup
    // one more window over far fewer rows. At 100 TB this is the
    // standard plan: everything is partitioned by user_id, per-user
    // history is bounded, nothing driver-side.
    "q122_scd2_intervals" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val byUserType = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val runs = t(s, d, "events")
        .withColumn("grp",
          row_number().over(byUser) - row_number().over(byUserType))
        .groupBy(col("user_id"), col("event_type"), col("grp"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
      runs
        .withColumn("valid_to",
          lead(col("valid_from"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("valid_from"))))
        .select(col("user_id"), col("event_type").as("state"),
          col("valid_from"), col("valid_to"), col("n_events"))
    }),

    // q123: Markov transition matrix over per-user event sequences —
    // the behavioral-model building block (next-event prediction,
    // anomaly scoring). from_type = lag(event_type) on the unique
    // (ts, event_id) order; the per-from transition share is reported
    // in exact integer micro-units (n×1e6 div row_total) so the gate
    // is arithmetic-identical across engines — the same
    // aggregate-then-window share idiom as q121. Scale: one shuffle
    // on user_id for the lag, one small agg keyed by the (from, to)
    // type pair (bounded by |types|²), window over that tiny result.
    "q123_markov_transitions" -> ((s, d) => {
      val seq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val trans = t(s, d, "events")
        .withColumn("from_type", lag(col("event_type"), 1).over(seq))
        .filter(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      trans
        .withColumn("micro_share",
          expr("n * 1000000 div sum(n) OVER (PARTITION BY from_type)"))
        .select(col("from_type"), col("to_type"), col("n"), col("micro_share"))
    }),

    // q124: numeric profiling histogram — per event_type, a 10-bucket
    // equi-width histogram of `value` (the data-profiling step before
    // any normalization choice). Bounds come from one map-side-
    // combined groupBy (NOT a window over the skewed type key — a
    // handful of types would serialize the whole table through a few
    // reducers), broadcast back as a tiny dim. The bucket expression
    // (v − min) * 10.0 / (max − min) is the same IEEE-754 op sequence
    // in both engines, so floor() lands identically and the gate
    // stays exact with integer counts.
    "q124_value_histogram" -> ((s, d) => {
      val ev = t(s, d, "events").filter(col("value").isNotNull)
      val bounds = ev.groupBy(col("event_type"))
        .agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .withColumn("bucket",
          when(col("vmax") === col("vmin"), lit(0L)).otherwise(
            least(floor((col("value") - col("vmin")) * lit(10.0)
              / (col("vmax") - col("vmin"))), lit(9L))).cast("long"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"))
    }),

    // q125: inverted-index construction — term → document frequency +
    // the first 5 postings (sorted doc ids), the retrieval-side
    // artifact of a text corpus build. Postings are made deterministic
    // the q120 way: collect_list + array_sort + slice, never raw
    // collection order. df ≥ 5 bounds the emitted vocabulary to terms
    // with real support (hapaxes dominate the raw vocab and carry no
    // retrieval value). Scale: distinct (term, doc) pairs are one
    // shuffle keyed by term; per-term posting lists here are truncated
    // in-row — a full-corpus index would range-bucket postings by
    // (term, doc_id range) instead of collecting unbounded lists.
    "q125_inverted_index" -> ((s, d) => {
      val td = t(s, d, "documents")
        .select(col("doc_id"),
          // in-row dedup (key = (doc_id, term), doc_id fixed per row):
          // array_distinct before the explode replaces a full-corpus
          // post-explode .distinct() exchange; the groupBy(term) below
          // is then the relation's ONLY shuffle
          explode(array_distinct(
            regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))))
            .as("term"))
      td.groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          expr("array_join(transform(slice(array_sort(collect_list(doc_id))," +
            " 1, 5), x -> CAST(x AS STRING)), ',')").as("postings"))
        .filter(col("df") >= 5)
    }),

    // q126: triangle counting on the thresholded co-purchase graph —
    // parts that co-occur in ≥ 2 orders form an edge; triangles are
    // the cohesion signal (product-bundle detection; same machinery as
    // social-graph clustering coefficients). Enumeration is the
    // DEGREE-oriented wedge join in [[trianglesOf]] (r10: the id
    // orientation shipped through r9 was the last operator with an
    // acknowledged-but-unguarded power-law cliff; ScaleEvidence path 8
    // measures the A/B). Scale posture: the support threshold bounds
    // the graph — pair generation is a self-join on l_orderkey
    // (per-order fan-out is C(k,2) with k = lines per order, a small
    // constant), the ≥ 2 filter prunes the long tail before any graph
    // join runs, and degree orientation bounds every wedge-join key's
    // fan-out by O(√E) whatever the degree distribution.
    // q127: association-rule mining over the co-purchase pairs —
    // support / confidence / lift for part pairs appearing in ≥ 2
    // orders, the recommendation-engine building block. All three
    // metrics are exact integer micro-units (n×1e6 div m): floats
    // would make the gate engine-ambiguous, and the integer forms are
    // what a production scorer thresholds on anyway. lift multiplies
    // three longs before the divide — bounded by n_ab ≤ N and the
    // 1e6 scale, it stays < 2^63 up to ~10^6 orders per item pair;
    // beyond that the same expression moves to DECIMAL. Plan shape:
    // the pair self-join is the only big shuffle; item counts join
    // back as a (broadcastable) dim keyed by part.
    "q127_association_rules" -> ((s, d) => {
      val op = t(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val items = op.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
      val pairs = copurchasePairs(s, d).filter(col("n_pair") >= 2)
      // N as a broadcast 1-row aggregate keeps the whole query lazy
      // (no driver-side count per invocation)
      val total = op.select(col("ok")).distinct()
        .agg(count(lit(1)).as("n_orders"))
      pairs
        .join(items.withColumnRenamed("pk", "p1").withColumnRenamed("n_item", "n_a"),
          Seq("p1"))
        .join(items.withColumnRenamed("pk", "p2").withColumnRenamed("n_item", "n_b"),
          Seq("p2"))
        .crossJoin(broadcast(total))
        .select(col("p1"), col("p2"), col("n_pair"), col("n_a"), col("n_b"),
          expr("n_pair * 1000000 div n_a").as("conf_ab_micro"),
          expr("n_pair * 1000000 div n_b").as("conf_ba_micro"),
          expr("n_pair * n_orders * 1000000 div (n_a * n_b)").as("lift_micro"))
    }),

    // q128: reciprocal-rank-fusion of two part rankings (by DECIMAL
    // revenue and by DECIMAL quantity) — the standard zero-tuning way
    // to merge heterogeneous rankings (search result fusion, feature
    // ensembling). RRF's 1/(k+r) becomes 1e6 div (60+r) so the fused
    // score is exact integer; both input ranks carry the p_partkey
    // tiebreak required for cross-engine determinism, and the money
    // sums go through DECIMAL per repo policy (a double-sum ORDER BY
    // would be partitioning-order-dependent). Scale: one groupBy on
    // partkey, two global sorts of the small aggregate, top-20 out.
    "q128_rrf_fusion" -> ((s, d) => {
      // both global rankings via ScalableRank (range partition +
      // broadcast offsets): an un-partitioned row_number window here
      // would single-task the whole part aggregate — ~2e8 rows at
      // 100 TB (the q138 cliff class). BIGINT ranks match DuckDB's.
      // persisted once, ranked independently per metric, joined back —
      // nesting the two ranks re-executes the lineitem aggregate per
      // range-sampling pass (see q138)
      val agg = graft.CacheRegistry.getOrPersist(s, s"analytics2.q128agg:$d") {
        t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("revenue"),
            sum(col("l_quantity").cast("decimal(12,2)")).as("qty"))
      }
      // both rankings fused into ONE groupedRowNumber pass over a
      // tagged union (r17 — see the q138 comment: same job-count
      // rationale, same exactness argument; negated DECIMAL(22,2)
      // sums on DECIMAL(38,2) are exact, so per-tag (ord, l_partkey)
      // is bit-identical to (metric desc, l_partkey))
      val tagged = Seq((1, -col("revenue")), (2, -col("qty")))
        .map { case (tg, ordv) =>
          agg.select(col("l_partkey"), lit(tg).as("tag"),
            ordv.cast("decimal(38,2)").as("ord"))
        }.reduce(_ unionByName _)
      val ranked = ScalableRank
        .groupedRowNumber(tagged, Seq("tag"), "_rank",
          col("ord"), col("l_partkey"))
        .groupBy(col("l_partkey"))
        .agg(max(when(col("tag") === 1, col("_rank"))).as("r_rev"),
          max(when(col("tag") === 2, col("_rank"))).as("r_qty"))
      ranked
        .withColumn("rrf_micro",
          expr("1000000 div (60 + r_rev) + 1000000 div (60 + r_qty)"))
        .orderBy(col("rrf_micro").desc, col("l_partkey"))
        .limit(20)
        .select(col("l_partkey"), col("r_rev"), col("r_qty"), col("rrf_micro"))
    }),

    // q129: 7-day rolling distinct users — the engagement metric that
    // naive SQL writes as a non-equi self-join (BETWEEN d-6 AND d →
    // nested-loop at scale). The scale-correct plan used here inverts
    // it: each (day, user) observation CONTRIBUTES to the 7 report
    // days that cover it, generated as an in-row sequence explode (×7
    // map-side fan-out, no join), then one distinct-agg keyed by
    // report day. The trailing semi-join only drops report days past
    // the observed calendar — a tiny day-dimension join.
    "q129_rolling_distinct" -> ((s, d) => {
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = du.select(col("day")).distinct()
      du.select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 6))")).as("report_day"))
        .join(days.withColumnRenamed("day", "report_day"), Seq("report_day"),
          "left_semi")
        .groupBy(col("report_day"))
        .agg(countDistinct(col("user_id")).as("u7"))
    }),

    // q130: quantile binning (ntile semantics) — per-type quartile
    // assignment of `value`, the feature-discretization step before
    // bucketized training; min/max per bin are raw stored doubles
    // (exact values, no arithmetic), counts integers. Computed as the
    // intersection of histogram rank intervals with ntile bucket
    // intervals: equal values occupy CONSECUTIVE ranks whatever the
    // intra-value tiebreak order, so a value row's rank interval
    // [cum−cnt+1, cum] (from ScalableRank.groupedCumSum) contributes
    // min(cum, bend) − max(cum−cnt+1, bstart) + 1 rows to bucket b —
    // bit-identical to per-row ntile(4) with the (value, event_id)
    // order, including ntile's front-loaded remainder (bucket b gets
    // n div 4 + 1 rows iff b ≤ n mod 4). The old per-type row window
    // pushed each type's entire event set through one task (the
    // q141/q138 cliff); the ORACLE keeps per-row ntile as proof.
    "q130_ntile_binning" -> ((s, d) => {
      val hist = t(s, d, "events").filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("value").as("v"))
        .agg(count(lit(1)).as("cnt"))
      ScalableRank.groupedCumSum(hist, Seq("event_type"), "v", "cnt", "cum", "n")
        .select(col("event_type"), col("v"), col("cnt"), col("cum"), col("n"),
          explode(sequence(lit(1), lit(4))).as("b"))
        .withColumn("bstart",
          expr("(b - 1) * (n div 4) + least(b - 1, n % 4) + 1"))
        .withColumn("bend", expr(
          "bstart + (n div 4) + (CASE WHEN b <= n % 4 THEN 1 ELSE 0 END) - 1"))
        .filter(expr("cum - cnt + 1 <= bend AND cum >= bstart"))
        .groupBy(col("event_type"), col("b").cast("long").as("quartile"))
        .agg(expr("CAST(sum(least(cum, bend) - greatest(cum - cnt + 1, bstart) + 1) AS BIGINT)").as("n"),
          min(col("v")).as("vmin"), max(col("v")).as("vmax"))
    }),

    // q131: repetition-based quality scoring (the Gopher-rule family:
    // Rae et al. 2021 §A1.1) — per-doc distinct-token ratio, top
    // unigram share, top bigram share, all in exact integer
    // micro-units. Documents whose mass concentrates in few (bi)grams
    // are boilerplate/spam; these three scores are the standard
    // cheap screens before a corpus reaches training. Everything is
    // in-row array work (token array, bigram transform) plus two
    // doc-keyed aggs — one shuffle each, no cross-doc state.
    "q131_repetition_quality" -> ((s, d) => repetitionPerDoc(s, d)),

    // q132: multi-touch attribution (linear model) — every purchase
    // distributes 1e6 micro-credits equally over the user's touches
    // in the preceding 3 days; per touch-type totals are the
    // marketing-attribution report. The interval join is bucketed the
    // scale-correct way: a purchase explodes to its 4 candidate DAY
    // buckets (purchases are the smaller side) and equi-joins touches
    // on (user_id, day) with the exact time-range residual — the
    // standard interval-join decomposition that avoids the non-equi
    // nested loop a naive BETWEEN join plans. Credits are integer
    // (1e6 div n_touches), so the gate is exact.
    "q132_attribution" -> ((s, d) => {
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pt"))
        .withColumn("day",
          explode(expr("sequence(date_sub(to_date(pt), 3), to_date(pt))")))
      val tch = ev.select(col("user_id"), col("ts").as("tt"),
          col("event_type").as("touch_type"))
        .withColumn("day", to_date(col("tt")))
      val tp = p.join(tch, Seq("user_id", "day"))
        .filter(col("tt") < col("pt") &&
          col("tt") >= col("pt") - expr("INTERVAL 3 DAYS"))
        .select(col("pid"), col("touch_type"))
      tp.withColumn("n_t",
          count(lit(1)).over(Window.partitionBy(col("pid"))))
        .groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct(col("pid")).as("n_purchases"),
          sum(expr("1000000 div n_t")).cast("long").as("credit_micro"))
    }),

    // q133: seasonal anomaly screen — per (event_type, hour-of-day)
    // the all-days total is the seasonal baseline; a (type, date,
    // hour) cell is anomalous when its count exceeds 2× its seasonal
    // average. The ratio is exact integer micro-units
    // (actual × n_days × 1e6 div baseline_total) — no float division,
    // so the gate holds. Plan: two aggregates over the same scan
    // (cells, baselines) joined on the tiny (type, hour) key, the
    // global day count broadcast as a 1-row aggregate.
    "q133_seasonal_anomaly" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_type"),
        to_date(col("ts")).as("day"), hour(col("ts")).as("hh"))
      val cells = ev.groupBy(col("event_type"), col("day"), col("hh"))
        .agg(count(lit(1)).as("actual"))
      val baseline = ev.groupBy(col("event_type"), col("hh"))
        .agg(count(lit(1)).as("total"))
      val nDays = ev.select(col("day")).distinct()
        .agg(count(lit(1)).as("n_days"))
      cells.join(baseline, Seq("event_type", "hh"))
        .crossJoin(broadcast(nDays))
        .withColumn("ratio_micro",
          expr("actual * n_days * 1000000 div total"))
        .filter(col("ratio_micro") >= 2000000L)
        .select(col("event_type"), col("day"), col("hh"),
          col("actual"), col("total"), col("ratio_micro"))
    }),

    // q134: join-key skew profiler — the "do I need salting?"
    // diagnostic run before any big join: per candidate key, total
    // rows, distinct keys, the heaviest key's frequency and share,
    // and a log-bucketed keys-per-frequency histogram. One groupBy
    // per key column then tiny aggregates — the profile costs one
    // shuffle per key at any scale. Top-key share ≥ a few percent is
    // the signal that ScaleOps.saltedJoin is needed.
    "q134_skew_profile" -> ((s, d) => {
      def profile(df: DataFrame, key: String, label: String) = {
        val freq = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
        freq.agg(
            sum(col("c")).cast("long").as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("c")).as("max_freq"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).cast("long").as("keys_f1"),
            sum(when(col("c").between(2, 9), 1L).otherwise(0L)).cast("long")
              .as("keys_f2_9"),
            sum(when(col("c").between(10, 99), 1L).otherwise(0L)).cast("long")
              .as("keys_f10_99"),
            sum(when(col("c") >= 100, 1L).otherwise(0L)).cast("long")
              .as("keys_f100p"))
          .select(lit(label).as("profiled_key"), col("n_rows"), col("n_keys"),
            col("max_freq"),
            expr("max_freq * 1000000 div n_rows").as("top_share_micro"),
            col("keys_f1"), col("keys_f2_9"), col("keys_f10_99"),
            col("keys_f100p"))
      }
      profile(t(s, d, "lineitem"), "l_orderkey", "lineitem.l_orderkey")
        .unionByName(profile(t(s, d, "events"), "user_id", "events.user_id"))
    }),

    // q135: deterministic train/val/test split — the md5-uniform
    // 80/10/10 partition of a corpus (same engine-portable u16 hash
    // as q107/q54; rand() would be irreproducible across engines,
    // runs and partitionings). Per-split counts/chars/langs are the
    // manifest a training job records. Scan-side map + one tiny agg.
    "q135_dataset_split" -> ((s, d) => {
      // one-md5 u16 decode (conv), not per-digit instr — see q99
      t(s, d, "documents")
        .withColumn("h", md5(concat(lit("split|"), col("doc_id").cast("string"))))
        .withColumn("u16", expr("CAST(conv(substr(h, 1, 4), 16, 10) AS INT)"))
        .withColumn("split",
          when(col("u16") < 52429, "train")
            .when(col("u16") < 58982, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars"),
          countDistinct(col("lang")).as("n_langs"))
    }),

    // q136: user growth accounting — per day: new users (first-ever
    // activity), returning users, and the cumulative registered base.
    // First-activity is one groupBy(user) min(date); the daily rollup
    // joins new vs active counts on the tiny day key and the
    // cumulative base is a window over days (a few hundred rows at
    // any corpus size — the window input is the AGGREGATE, never the
    // event log; same aggregate-then-window shape as q121).
    "q136_user_growth" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val firstDay = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      val news = firstDay.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      val active = ev.distinct().groupBy(col("day"))
        .agg(count(lit(1)).as("n_active"))
      active.join(news, Seq("day"), "left")
        .select(col("day"), col("n_active"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          (col("n_active") - coalesce(col("n_new"), lit(0L))).as("n_returning"))
        .withColumn("cum_users",
          sum(col("n_new")).over(Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, 0)))
    }),

    // q137: churn segmentation — per user, days idle vs the corpus
    // max date bucket into active / cooling / churned, keyed by the
    // user's LAST event type (max_by on the zero-padded (ts,
    // event_id) key — the q101 order-unambiguous idiom). The global
    // reference date rides along as a broadcast 1-row aggregate.
    // One shuffle on user_id; the segment rollup is tiny.
    "q137_churn_segments" -> ((s, d) => {
      val key = concat(
        lpad(unix_micros(col("ts")).cast("string"), 20, "0"), lit("|"),
        lpad(col("event_id").cast("string"), 12, "0"))
      val ev = t(s, d, "events")
      val refDay = ev.agg(max(to_date(col("ts"))).as("ref_day"))
      val perUser = ev.groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("last_day"),
          max_by(col("event_type"), key).as("last_type"))
      perUser.crossJoin(broadcast(refDay))
        .withColumn("days_idle", datediff(col("ref_day"), col("last_day")))
        .withColumn("segment",
          when(col("days_idle") <= 3, "active")
            .when(col("days_idle") <= 7, "cooling").otherwise("churned"))
        .groupBy(col("segment"), col("last_type"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // q138: RFM segmentation — the classic customer scoring: recency
    // (days since last order), frequency (order count), monetary
    // (DECIMAL revenue) quartiled over the per-customer aggregate,
    // combined into a 3-digit segment code. Money stays DECIMAL end
    // to end per repo policy; every quartile order carries the
    // custkey tiebreak, so codes are engine-deterministic. Quartiles
    // are the explicit floor bucketing q = (rank-1)*4 div n + 1 over
    // a [[ScalableRank.globalRowNumber]] (range-partitioned, per-
    // partition rank + broadcast offsets) — no un-partitioned ntile
    // window remains (r5 verdict: that window single-tasked the whole
    // customer aggregate, and ntile's remainder distribution is
    // engine-version-sensitive; the floor formula is pinned math on
    // both sides of the oracle gate).
    "q138_rfm_segments" -> ((s, d) => {
      val o = t(s, d, "orders")
      val refDay = o.agg(max(to_date(col("o_orderdate"))).as("ref_day"))
      val perCust = o.groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(col("o_totalprice").cast("decimal(12,2)")).as("monetary"))
        .crossJoin(broadcast(refDay))
        .withColumn("recency_days", datediff(col("ref_day"), col("last_order")))
      val nTotal = perCust.agg(count(lit(1)).as("n_total"))
      // the customer aggregate is persisted ONCE and each metric ranks
      // it independently (then joins back by custkey): nesting the
      // three ranks would re-execute the whole upstream plan per
      // range-sampling pass (2^3 recomputes — measured 5× slower).
      // Local cost note: the ~1.9 s over the old single-task-window
      // form at sf0.1 is sequential round-trip latency (range
      // sampling + offset broadcast per metric, ~0.3 s/round on this
      // host), not data volume — the price of a plan that still works
      // when the aggregate is 1e9 customers instead of 15e3 (q184's
      // deliberately-bought-tax pattern).
      val base = graft.CacheRegistry.getOrPersist(s, s"analytics2.q138base:$d") {
        perCust.crossJoin(broadcast(nTotal))
      }
      // The three quartile rankings FUSED into one groupedRowNumber
      // pass (r17, guide §2.4): r15/r16 ran three independent
      // globalRowNumber calls over the same persisted base — three
      // range-sampling passes, three offset jobs, three broadcast-join
      // round-trips, strictly sequential fixed cost (the r16 8-core
      // run was 2× FASTER than 32-core: pure job-count overhead, not
      // data). Each metric becomes a tagged projection of base with
      // its sort key encoded on a common exact type — DECIMAL(38,2)
      // holds recency days (int), negated frequency (count) and
      // negated DECIMAL(22,2) monetary exactly, so the per-tag
      // (ord, o_custkey) order is bit-identical to the previous
      // (metric [desc], o_custkey) orders — and one rank pass over the
      // 3× union replaces all three. Same formula, same n_total, same
      // tiebreaks: oracle-gated value-identical.
      val tagged = Seq(
        (1, col("recency_days").cast("decimal(38,2)")),
        (2, (-col("frequency")).cast("decimal(38,2)")),
        (3, (-col("monetary")).cast("decimal(38,2)"))
      ).map { case (tg, ordv) =>
        base.select(col("o_custkey"), col("monetary"), col("n_total"),
          lit(tg).as("tag"), ordv.as("ord"))
      }.reduce(_ unionByName _)
      val scored = ScalableRank
        .groupedRowNumber(tagged, Seq("tag"), "_rank",
          col("ord"), col("o_custkey"))
        .withColumn("q", (expr("((_rank - 1) * 4) div n_total") + 1).cast("int"))
        .groupBy(col("o_custkey"))
        .agg(max(when(col("tag") === 1, col("q"))).as("r"),
          max(when(col("tag") === 2, col("q"))).as("f"),
          max(when(col("tag") === 3, col("q"))).as("m"),
          // every custkey carries the same monetary on all 3 tag rows
          max(col("monetary")).as("monetary"))
      // final cast to DOUBLE: output columns are never DecimalType
      // (driver-compare stringify contract — see the r7 policy note in
      // Analytics.scala and OutputTypePolicySpec); the money math above
      // stays DECIMAL-exact.
      scored.groupBy((col("r") * 100 + col("f") * 10 + col("m")).as("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("monetary")).cast("decimal(32,2)").cast("double")
            .as("monetary_total"))
    }),

    // q139: source-distribution divergence — total variation distance
    // between per-source unigram distributions over the global
    // top-200 vocabulary, in exact integer micro-units (TVD = half
    // the L1 gap; floats never appear). The mixture-health check of a
    // multi-source corpus: a source drifting from the rest shows up
    // as a high-TVD row. The vocabulary cap is what bounds the
    // all-pairs stage: |sources|² × 200 cells, trivially small, while
    // the raw term counting stays one shuffle keyed by (source,
    // term). Missing terms materialize as zero shares via the
    // source × vocab grid (a broadcast cross of two tiny dims).
    "q139_source_divergence" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(col("source"),
          explode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
            .as("term"))
      val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(200).select(col("term"))
      val st = toks.join(broadcast(vocab), Seq("term"))
        .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      val tot = st.groupBy(col("source")).agg(sum(col("n")).as("tot"))
      val share = st.join(tot, Seq("source"))
        .select(col("source"), col("term"), expr("n * 1000000 div tot").as("p"))
      val grid = tot.select(col("source")).crossJoin(broadcast(vocab))
        .join(share, Seq("source", "term"), "left")
        .select(col("source"), col("term"), coalesce(col("p"), lit(0L)).as("p"))
      grid.as("a").join(grid.as("b"),
          col("a.term") === col("b.term") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src1"), col("b.source").as("src2"))
        .agg(sum(abs(col("a.p") - col("b.p"))).as("l1"))
        .select(col("src1"), col("src2"), expr("l1 div 2").as("tvd_micro"))
    }),

    // q140: embedding distribution drift — per-dimension mean shift
    // between two corpus halves (even/odd vec_id standing in for
    // old/new snapshots), the model-ops check that a new embedding
    // batch matches the serving distribution. Floats are quantized to
    // integer millis FIRST (floor(x × 1000) — f32→f64 widening and
    // ×1000 are both exact IEEE ops, floor lands identically on both
    // engines), so every downstream sum is integer-exact and
    // summation order can't flake the gate — the same reason q110
    // runs PageRank in integer arithmetic. Plan: posexplode is an
    // in-row generator (dim× fan-out, no shuffle) and the only
    // shuffle is the groupBy on the tiny dimension key.
    "q140_embedding_drift" -> ((s, d) => {
      t(s, d, "embeddings")
        .select(col("vec_id") % 2 === 0, posexplode(col("embedding")))
        .toDF("is_even", "dim", "x")
        .select(col("is_even"), col("dim"),
          floor(col("x").cast("double") * lit(1000.0)).as("milli"))
        .groupBy(col("dim"))
        .agg(
          sum(when(col("is_even"), col("milli"))).cast("long").as("s_even"),
          sum(when(!col("is_even"), col("milli"))).cast("long").as("s_odd"),
          sum(when(col("is_even"), 1L).otherwise(0L)).cast("long").as("n_even"),
          sum(when(!col("is_even"), 1L).otherwise(0L)).cast("long").as("n_odd"))
        // BIGINT dim on output: posexplode pos is INT, DuckDB's
        // generator subscript BIGINT
        .select(col("dim").cast("long").as("dim"), col("s_even"), col("s_odd"),
          abs(expr("s_even * 1000 div n_even - s_odd * 1000 div n_odd"))
            .as("drift_milli_x1000"))
    }),

    // q141: exact distributed percentiles (p50/p90/p99) per event
    // type — the exact counterpart of q63's GK sketch, for when the
    // SLA number must be exact, not ε-approximate. The rank
    // conditions are pure integers (a value qualifies for percentile
    // p iff its MIN row rank ≤ the lower percentile rank — the same
    // prefix test the per-row form writes as rn × 100 ≤ p × n), so no
    // float percent_rank enters the gate. Ranks come from a (type,
    // value, cnt) histogram through [[ScalableRank.groupedCumSum]]
    // (range-partitioned per-chunk running counts + broadcast
    // offsets): the old per-type row_number window put each type's
    // ENTIRE event set through one task — with a handful of types
    // that is the q138/q112 cliff, now gone. Equal values collapse to
    // one histogram row whose min rank = cum − cnt + 1, which is
    // exactly when the per-row prefix test first fires, so the
    // selected values are bit-identical to the row form (the oracle
    // keeps the per-row formulation as proof).
    "q141_exact_percentiles" -> ((s, d) => {
      val hist = t(s, d, "events").filter(col("value").isNotNull)
        .groupBy(col("event_type").as("g"), col("value").as("v"))
        .agg(count(lit(1)).as("cnt"))
      val ranked = ScalableRank.groupedCumSum(
        hist, Seq("g"), "v", "cnt", "cum", "n")
      ranked.groupBy(col("g").as("event_type"))
        .agg(
          max(when(expr("(cum - cnt + 1) * 2 <= n + 1"), col("v"))).as("p50"),
          max(when(expr("(cum - cnt + 1) * 10 <= n * 9"), col("v"))).as("p90"),
          max(when(expr("(cum - cnt + 1) * 100 <= n * 99"), col("v"))).as("p99"),
          max(col("v")).as("p100"),
          sum(col("cnt")).cast("long").as("n_rows"))
    }),

    // q142: incremental SCD2 maintenance — merge a delta batch (days
    // ≥ 16) into the dimension history built from the prior snapshot
    // (days ≤ 15) WITHOUT recomputing history: only each user's open
    // (last) run can interact with the delta, and only the delta's
    // first run can extend it (same state → merge, else the open run
    // closes at the delta's start). The gate is the strongest form of
    // the incremental-correctness claim: the oracle is the FULL
    // recompute (identical SQL to q122), so the merge path must
    // reproduce the batch rebuild bit-for-bit. Scale: every join is
    // keyed by user_id over RUN lists (orders of magnitude smaller
    // than the event log), and the old snapshot's closed runs are
    // untouched — the whole point of incremental maintenance.
    "q142_scd2_merge" -> ((s, d) => {
      // r17 restructure (guide §2.4 / verdict #2) — value-identical,
      // measured 3× subtree re-execution removed. The r16 plan built
      // the old/delta run lists as two independent window+agg
      // pipelines and then re-executed oldF/deltaF/fused in every
      // union branch (only the SCAN exchange was reused): oldF ran
      // 3×, deltaF 3×, fused 2× (plans/r17/q142_scd2_merge_before.txt,
      // ~10 AQE stages). Now:
      //  - ONE pass computes both run lists: `side` joins every
      //    window/group key, and row_number over (user_id, side[,
      //    event_type]) restricted to one side's rows is EXACTLY
      //    row_number over that side's filtered slice (the filter IS
      //    the side), so per-side runs and grp ids are bit-identical;
      //  - is_open/is_first come from one more window over the same
      //    single hash(user_id) exchange (max/min per (user_id, side)
      //    ≡ the per-slice max/min of the old formulation);
      //  - one lazy localCheckpoint materializes the flagged run list
      //    ONCE for all four consumers below (the q144 pattern; an
      //    explicit repartition was tried first and did NOT stick:
      //    Catalyst pushes the side/flag filters through the exchange
      //    into per-consumer re-derived pipelines, so only a plan
      //    barrier shares the work) — bounded blocks, run-scoped, the
      //    run list is orders smaller than the event log;
      //  - both anti-joins consume the SAME `fused` relation (the
      //    projection difference was what blocked broadcast reuse),
      //    differing only in which fused column the condition tests.
      val sideEv = t(s, d, "events")
        .withColumn("side", when(dayofmonth(col("ts")) <= 15, 0).otherwise(1))
      val byUS = Window.partitionBy(col("user_id"), col("side"))
        .orderBy(col("ts"), col("event_id"))
      val byUST = Window.partitionBy(col("user_id"), col("side"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wSide = Window.partitionBy(col("user_id"), col("side"))
      val flagged = sideEv
        .withColumn("grp",
          row_number().over(byUS) - row_number().over(byUST))
        .groupBy(col("user_id"), col("side"), col("event_type"), col("grp"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"))
        .drop("grp")
        .withColumn("is_open", col("side") === 0 &&
          col("valid_from") === max(col("valid_from")).over(wSide))
        .withColumn("is_first", col("side") === 1 &&
          col("valid_from") === min(col("valid_from")).over(wSide))
      val runsX = flagged.localCheckpoint(false)
      // the only cross-slice interaction: open old run × first delta
      // run of the same user AND state fuse into one continued run.
      // `fused` carries both originals' valid_from so each side's
      // anti-join removes EXACTLY the run it replaced (a later delta
      // run may legitimately repeat the fused state).
      val fused = runsX.filter(col("is_open")).as("o")
        .join(runsX.filter(col("is_first")).as("n"),
          col("o.user_id") === col("n.user_id") &&
            col("o.event_type") === col("n.event_type"))
        .select(col("o.user_id").as("user_id"),
          col("o.event_type").as("event_type"),
          col("o.valid_from").as("valid_from"),
          col("n.valid_from").as("delta_from"),
          (col("o.n_events") + col("n.n_events")).as("n_events"))
      def kept(side: Int, fusedCol: String): DataFrame =
        runsX.filter(col("side") === side)
          .drop("side", "is_open", "is_first").as("r")
          .join(fused.as("f"),
            col("r.user_id") === col("f.user_id") &&
              col("r.valid_from") === col(s"f.$fusedCol"), "left_anti")
      val all = kept(0, "valid_from").unionByName(fused.drop("delta_from"))
        .unionByName(kept(1, "delta_from"))
      all.withColumn("valid_to",
          lead(col("valid_from"), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("valid_from"))))
        .select(col("user_id"), col("event_type").as("state"),
          col("valid_from"), col("valid_to"), col("n_events"))
    }),

    // q144: BPE vocabulary induction — 10 greedy merge steps of the
    // byte-pair-encoding trainer (Sennrich et al. 2016) run as a
    // distributed job over the word-type table: each step counts
    // adjacent token pairs weighted by word frequency (explode over
    // the in-row token list, one small shuffle keyed by pair),
    // selects the max pair with a total (weight, a, b) tiebreak, and
    // rewrites representations with a literal string replace (both
    // engines substitute left-to-right non-overlapping — verified).
    // Like q48's k-means, the ONLY driver-side state is the model
    // itself (10 merge decisions — the algorithm's sequential
    // dependency, not a shortcut); all counting stays distributed,
    // and each step's input is the word-type aggregate
    // (vocabulary-sized, orders below the corpus). Each step is
    // localCheckpoint'ed (the q68 pattern): chaining persist() alone
    // nests k InMemoryRelations by step k, and the quadratic plan
    // re-canonicalization/stringification cost dominated the compute
    // (measured 45-100 s at sf0.001 vs ~4 s checkpointed).
    "q144_bpe_merges" -> ((s, d) => {
      import s.implicits._
      bpeMerges(s, d).toDF("step", "left_tok", "right_tok", "weight")
    }),

    // q151: BPE tokenizer INFERENCE — apply q144's induced merge
    // table to every document (induce once, encode everywhere: the
    // production split between tokenizer training and the tokenize
    // pass over the corpus). The 10 merges are driver constants
    // (memoized with q144 — one induction per session+dir serves
    // both), so encoding compiles to a pure per-row expression: each
    // word → char sequence → 10 nested replace()s → piece count,
    // summed in-row with aggregate(). Zero exchanges at any corpus
    // size; fertility (pieces per word) is exact integer micro-units.
    "q151_bpe_tokenize" -> ((s, d) => {
      val applied = bpeMerges(s, d)
        .foldLeft("concat(' ', array_join(regexp_extract_all(w, '.', 0), ' '), ' ')") {
          case (acc, (_, a, b, _)) =>
            val (qa, qb) = (a.replace("'", "''"), b.replace("'", "''"))
            s"replace($acc, ' $qa $qb ', ' $qa$qb ')"
        }
      t(s, d, "documents")
        .select(col("doc_id"),
          expr("filter(split(lower(text), '\\\\s+'), x -> length(x) > 0)").as("ws"))
        .filter(size(col("ws")) > 0)
        .select(col("doc_id"), size(col("ws")).cast("long").as("n_words"),
          expr(s"aggregate(transform(ws, w -> size(split(trim($applied), ' '))), " +
            "0L, (acc, x) -> acc + x)").as("n_pieces"))
        .select(col("doc_id"), col("n_words"), col("n_pieces"),
          expr("n_pieces * 1000000L div n_words").as("fertility_micro"))
    }),

    "q126_copurchase_triangles" -> ((s, d) =>
      trianglesAuto(copurchasePairs(s, d).filter(col("n_pair") >= 2)
        .select(col("p1"), col("p2")),
        countMemoKey = Some(s"analytics2.triedgecount:$d"))),

    // q188: per-node CLUSTERING COEFFICIENT on the same thresholded
    // co-purchase graph — 2·T(v) / (deg(v)·(deg(v)−1)) in exact
    // integer micro-units. q126's global triangle listing becomes a
    // per-node metric by unioning the three corners before one
    // count-by-node; degree is the same union trick on the edge
    // endpoints. No new join shapes beyond q126's: the shared
    // [[trianglesOf]] degree-oriented enumeration over the (persisted)
    // pair relation, so the power-law guard is inherited too (corner
    // naming is irrelevant here — the union folds all three).
    "q188_clustering_coeff" -> ((s, d) => {
      val edges = copurchasePairs(s, d).filter(col("n_pair") >= 2)
        .select(col("p1"), col("p2"))
      // same relation as q126 → same memo key: ONE sizing job per
      // (session, dir) across both queries
      val tri = trianglesAuto(edges,
        countMemoKey = Some(s"analytics2.triedgecount:$d"))
      val tcnt = tri.select(col("a").as("v"))
        .union(tri.select(col("b")))
        .union(tri.select(col("c")))
        .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
      val deg = edges.select(col("p1").as("v"))
        .union(edges.select(col("p2")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      deg.filter(col("deg") >= 2)
        .join(tcnt, Seq("v"), "left")
        .select(col("v").as("pk"), col("deg"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          expr("2 * coalesce(n_tri, 0L) * 1000000L div (deg * (deg - 1))")
            .as("coeff_micro"))
    }))

  /** Shared oracle text: the 10-step BPE induction CTE chain (words →
    * char reprs → per-step top pair m1..m10 → rewritten reprs).
    * r/m CTEs are MATERIALIZED: each step references its predecessor
    * more than once, and DuckDB's default per-reference inlining
    * would expand the 10-step chain exponentially. */
  private lazy val bpeInductionCtes: String = {
    val steps = (1 to 10).map { k =>
      s""" t$k AS (SELECT freq, string_split(trim(repr), ' ') AS l
         |   FROM r${k - 1}),
         | p$k AS (
         |  SELECT l[i] AS a, l[i + 1] AS b, sum(freq) AS weight FROM (
         |   SELECT freq, l, unnest(range(1, len(l))) AS i FROM t$k)
         |  GROUP BY 1, 2),
         | m$k AS MATERIALIZED (SELECT a, b, weight FROM p$k
         |   ORDER BY weight DESC, a, b LIMIT 1),
         | r$k AS MATERIALIZED (
         |  SELECT freq, replace(repr,
         |    ' ' || (SELECT a FROM m$k) || ' ' || (SELECT b FROM m$k) || ' ',
         |    ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ') AS repr
         |  FROM r${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""words AS (
       |  SELECT w, count(*) AS freq FROM (
       |   SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
       |   FROM documents)
       |  WHERE len(w) > 0 GROUP BY 1),
       | r0 AS MATERIALIZED (
       |  SELECT freq,
       |   ' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' '
       |    AS repr
       |  FROM words),
       |$steps""".stripMargin
  }

  // Induced merges memoized per (session, dir): q144 (induction
  // surface) and q151 (tokenize pass) share one driver loop. The
  // key uses session identity — entries die with the session object;
  // the payload is 10 driver-side tuples, not cluster state.
  private val mergeMemo = scala.collection.concurrent.TrieMap
    .empty[(Int, String), Seq[(Int, String, String, Long)]]

  private[operators] def bpeMerges(
      s: SparkSession, d: String): Seq[(Int, String, String, Long)] =
    mergeMemo.getOrElseUpdate((System.identityHashCode(s), d), {
      // The merge loop runs 10 × (tiny agg + rewrite) over a
      // vocabulary-sized table: AQE's per-stage re-optimization is
      // pure overhead here (measured ~2× the whole loop), so it is
      // switched off for the loop and restored after. Fixed shuffle
      // width 4: the vocab table is orders below the corpus at any SF.
      val aqeWas = s.conf.get("spark.sql.adaptive.enabled", "true")
      val shufWas = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try q144Body(s, d)
      finally {
        s.conf.set("spark.sql.adaptive.enabled", aqeWas)
        s.conf.set("spark.sql.shuffle.partitions", shufWas)
      }
    })

  private def q144Body(s: SparkSession, d: String): Seq[(Int, String, String, Long)] = {
      val words = t(s, d, "documents")
        .select(explode(split(lower(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .withColumn("repr", concat(lit(" "),
          array_join(regexp_extract_all(col("w"), lit("."), lit(0)), " "),
          lit(" ")))
        .select(col("freq"), col("repr"))
      var reprDf = words.localCheckpoint() // eager; flat-plan input for step 1
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      for (step <- 1 to 10) {
        val top = reprDf
          .select(col("freq"), split(trim(col("repr")), " ").as("l"))
          .filter(size(col("l")) >= 2) // sequence(1, 0) would count DOWN
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(l) - 1)," +
              " j -> struct(element_at(l, j) AS a, element_at(l, j + 1) AS b))"))
            .as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("weight"))
          .orderBy(col("weight").desc, col("a"), col("b"))
          .limit(1).collect()
        val (a, b, w) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step, a, b, w))
        // SQL-literal escape; fixture tokens are plain words, but the
        // operator shouldn't break on corpora containing quotes
        val (qa, qb) = (a.replace("'", "''"), b.replace("'", "''"))
        // localCheckpoint truncates lineage: step k+1 reads a flat
        // scan of these blocks (old steps' blocks are dropped by the
        // ContextCleaner once unreferenced)
        reprDf = reprDf.withColumn("repr",
          expr(s"replace(repr, ' $qa $qb ', ' $qa$qb ')"))
          .localCheckpoint()
      }
      merges.toSeq
  }

  def oracleSql: Map[String, String] = Map(
    "q122_scd2_intervals" ->
      """WITH runs AS (
        |  SELECT user_id, event_type, min(ts) AS valid_from,
        |   count(*) AS n_events
        |  FROM (
        |   SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     - row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS grp
        |   FROM events)
        |  GROUP BY user_id, event_type, grp)
        |SELECT user_id, event_type AS state, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
        |  AS valid_to,
        | n_events
        |FROM runs""".stripMargin,

    "q123_markov_transitions" ->
      """WITH trans AS (
        |  SELECT from_type, event_type AS to_type, count(*) AS n
        |  FROM (
        |   SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     AS from_type
        |   FROM events)
        |  WHERE from_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        | CAST(divide(n * 1000000, sum(n) OVER (PARTITION BY from_type))
        |  AS BIGINT) AS micro_share
        |FROM trans""".stripMargin,

    "q124_value_histogram" ->
      """WITH bounds AS (
        |  SELECT event_type, min(value) AS vmin, max(value) AS vmax
        |  FROM events WHERE value IS NOT NULL GROUP BY 1)
        |SELECT e.event_type,
        | CAST(CASE WHEN vmax = vmin THEN 0
        |  ELSE least(floor((value - vmin) * 10.0 / (vmax - vmin)), 9)
        |  END AS BIGINT) AS bucket,
        | count(*) AS n
        |FROM events e JOIN bounds b ON e.event_type = b.event_type
        |WHERE value IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "q125_inverted_index" ->
      """WITH td AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text),
        |   '\S+')) AS term
        |  FROM documents),
        | r AS (
        |  SELECT term, doc_id,
        |   row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM td)
        |SELECT term, count(*) AS df,
        | string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
        |  ',' ORDER BY doc_id) AS postings
        |FROM r
        |GROUP BY term
        |HAVING count(*) >= 5""".stripMargin,

    "q127_association_rules" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        | items AS (SELECT pk, count(*) AS n_item FROM op GROUP BY 1),
        | pairs AS (
        |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_pair
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        | total AS (SELECT count(DISTINCT ok) AS n_orders FROM op)
        |SELECT p1, p2, n_pair, ia.n_item AS n_a, ib.n_item AS n_b,
        | divide(n_pair * 1000000, ia.n_item) AS conf_ab_micro,
        | divide(n_pair * 1000000, ib.n_item) AS conf_ba_micro,
        | divide(n_pair * n_orders * 1000000, (ia.n_item * ib.n_item)) AS lift_micro
        |FROM pairs
        |JOIN items ia ON ia.pk = p1
        |JOIN items ib ON ib.pk = p2
        |CROSS JOIN total""".stripMargin,

    "q128_rrf_fusion" ->
      """WITH agg AS (
        |  SELECT l_partkey,
        |   sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS revenue,
        |   sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        |  FROM lineitem GROUP BY 1),
        | ranked AS (
        |  SELECT l_partkey,
        |   row_number() OVER (ORDER BY revenue DESC, l_partkey) AS r_rev,
        |   row_number() OVER (ORDER BY qty DESC, l_partkey) AS r_qty
        |  FROM agg)
        |SELECT l_partkey, r_rev, r_qty,
        | divide(1000000, (60 + r_rev)) + divide(1000000, (60 + r_qty)) AS rrf_micro
        |FROM ranked
        |ORDER BY rrf_micro DESC, l_partkey
        |LIMIT 20""".stripMargin,

    "q129_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        | days AS (SELECT DISTINCT day FROM du)
        |SELECT r.report_day, CAST(count(DISTINCT r.user_id) AS BIGINT) AS u7
        |FROM (
        |  SELECT user_id,
        |   CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS DATE)
        |    AS report_day
        |  FROM du) r
        |WHERE r.report_day IN (SELECT day FROM days)
        |GROUP BY 1""".stripMargin,

    "q130_ntile_binning" ->
      """SELECT event_type, quartile, count(*) AS n,
        | min(value) AS vmin, max(value) AS vmax
        |FROM (
        |  SELECT event_type, value,
        |   ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id)
        |    AS quartile
        |  FROM events WHERE value IS NOT NULL)
        |GROUP BY 1, 2""".stripMargin,

    "q131_repetition_quality" ->
      s"""WITH $repetitionPerDocCte
         |SELECT doc_id, n_tok, distinct_micro, top_unigram_micro,
         | top_bigram_micro
         |FROM repdoc""".stripMargin,

    "q132_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS pid, user_id, ts AS pt FROM events
        |  WHERE event_type = 'purchase'),
        | tp AS (
        |  SELECT p.pid, e.event_type AS touch_type
        |  FROM p JOIN events e ON e.user_id = p.user_id
        |   AND e.ts < p.pt AND e.ts >= p.pt - INTERVAL 3 DAY),
        | w AS (SELECT *, count(*) OVER (PARTITION BY pid) AS n_t FROM tp)
        |SELECT touch_type, count(*) AS n_touches,
        | CAST(count(DISTINCT pid) AS BIGINT) AS n_purchases,
        | CAST(sum(divide(1000000, n_t)) AS BIGINT) AS credit_micro
        |FROM w GROUP BY 1""".stripMargin,

    "q133_seasonal_anomaly" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |   CAST(date_part('hour', CAST(ts AS TIMESTAMP)) AS INT) AS hh
        |  FROM events),
        | cells AS (
        |  SELECT event_type, day, hh, count(*) AS actual
        |  FROM ev GROUP BY 1, 2, 3),
        | baseline AS (
        |  SELECT event_type, hh, count(*) AS total FROM ev GROUP BY 1, 2),
        | nd AS (SELECT count(DISTINCT day) AS n_days FROM ev)
        |SELECT cells.event_type, day, cells.hh, actual, total,
        | divide(actual * n_days * 1000000, total) AS ratio_micro
        |FROM cells
        |JOIN baseline ON baseline.event_type = cells.event_type
        | AND baseline.hh = cells.hh
        |CROSS JOIN nd
        |WHERE divide(actual * n_days * 1000000, total) >= 2000000""".stripMargin,

    "q134_skew_profile" ->
      """WITH lf AS (
        |  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        | ef AS (SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1),
        | lp AS (
        |  SELECT 'lineitem.l_orderkey' AS profiled_key,
        |   CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |   max(c) AS max_freq,
        |   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS keys_f1,
        |   CAST(sum(CASE WHEN c BETWEEN 2 AND 9 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS keys_f2_9,
        |   CAST(sum(CASE WHEN c BETWEEN 10 AND 99 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS keys_f10_99,
        |   CAST(sum(CASE WHEN c >= 100 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS keys_f100p
        |  FROM lf),
        | ep AS (
        |  SELECT 'events.user_id' AS profiled_key,
        |   CAST(sum(c) AS BIGINT) AS n_rows, count(*) AS n_keys,
        |   max(c) AS max_freq,
        |   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS keys_f1,
        |   CAST(sum(CASE WHEN c BETWEEN 2 AND 9 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS keys_f2_9,
        |   CAST(sum(CASE WHEN c BETWEEN 10 AND 99 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS keys_f10_99,
        |   CAST(sum(CASE WHEN c >= 100 THEN 1 ELSE 0 END) AS BIGINT)
        |     AS keys_f100p
        |  FROM ef)
        |SELECT profiled_key, n_rows, n_keys, max_freq,
        | divide(max_freq * 1000000, n_rows) AS top_share_micro,
        | keys_f1, keys_f2_9, keys_f10_99, keys_f100p
        |FROM lp
        |UNION ALL
        |SELECT profiled_key, n_rows, n_keys, max_freq,
        | divide(max_freq * 1000000, n_rows) AS top_share_micro,
        | keys_f1, keys_f2_9, keys_f10_99, keys_f100p
        |FROM ep""".stripMargin,

    "q135_dataset_split" -> {
      def dig(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
      s"""SELECT split, count(*) AS n_docs,
         | CAST(sum(n_chars) AS BIGINT) AS n_chars,
         | CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
         |FROM (
         | SELECT *, CASE WHEN u16 < 52429 THEN 'train'
         |   WHEN u16 < 58982 THEN 'val' ELSE 'test' END AS split
         | FROM (
         |  SELECT n_chars, lang,
         |   ${dig(1)} * 4096 + ${dig(2)} * 256 + ${dig(3)} * 16 + ${dig(4)} AS u16
         |  FROM (SELECT *, md5('split|' || CAST(doc_id AS VARCHAR)) AS h
         |    FROM documents)))
         |GROUP BY 1""".stripMargin
    },

    "q136_user_growth" ->
      """WITH ev AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        | fd AS (SELECT user_id, min(day) AS day FROM ev GROUP BY 1),
        | news AS (SELECT day, count(*) AS n_new FROM fd GROUP BY 1),
        | act AS (SELECT day, count(*) AS n_active FROM ev GROUP BY 1)
        |SELECT act.day, n_active,
        | coalesce(n_new, 0) AS n_new,
        | n_active - coalesce(n_new, 0) AS n_returning,
        | CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY act.day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS BIGINT) AS cum_users
        |FROM act LEFT JOIN news ON news.day = act.day""".stripMargin,

    "q137_churn_segments" ->
      """WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM events),
        | pu AS (
        |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
        |   max_by(event_type,
        |    lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
        |     || '|' || lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_type
        |  FROM events GROUP BY 1)
        |SELECT CASE WHEN ref_day - last_day <= 3 THEN 'active'
        |  WHEN ref_day - last_day <= 7 THEN 'cooling'
        |  ELSE 'churned' END AS segment,
        | last_type, count(*) AS n_users
        |FROM pu CROSS JOIN ref
        |GROUP BY 1, 2""".stripMargin,

    // quartile = (row_number-1)*4 floor-div n + 1 spelled with
    // floor(x*4.0/n) — no ntile (its remainder distribution is the
    // engine-version-sensitive part, r5 driver red), no // operator.
    // The float division is exact here: (rank-1)*4 and n are exact
    // integers in double and the quotient's distance to an integer is
    // >= 1/n >> one ulp for any plausible customer count.
    "q138_rfm_segments" ->
      """WITH pc AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_order,
        |   count(*) AS frequency,
        |   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary
        |  FROM orders GROUP BY o_custkey),
        | n AS (SELECT count(*) AS n_total FROM pc),
        | scored AS (
        |  SELECT monetary,
        |   CAST(floor((row_number() OVER (ORDER BY last_order DESC,
        |     o_custkey) - 1) * 4.0 / n_total) AS INT) + 1 AS r,
        |   CAST(floor((row_number() OVER (ORDER BY frequency DESC,
        |     o_custkey) - 1) * 4.0 / n_total) AS INT) + 1 AS f,
        |   CAST(floor((row_number() OVER (ORDER BY monetary DESC,
        |     o_custkey) - 1) * 4.0 / n_total) AS INT) + 1 AS m
        |  FROM pc CROSS JOIN n)
        |SELECT CAST(r * 100 + f * 10 + m AS INT) AS segment,
        | CAST(count(*) AS BIGINT) AS n_customers,
        | CAST(CAST(sum(monetary) AS DECIMAL(32,2)) AS DOUBLE) AS monetary_total
        |FROM scored GROUP BY r * 100 + f * 10 + m""".stripMargin,

    "q139_source_divergence" ->
      """WITH toks AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        | vocab AS (
        |  SELECT term FROM (
        |   SELECT term, count(*) AS n FROM toks GROUP BY 1)
        |  ORDER BY n DESC, term LIMIT 200),
        | st AS (
        |  SELECT source, toks.term, count(*) AS n FROM toks
        |  JOIN vocab ON vocab.term = toks.term
        |  GROUP BY 1, 2),
        | tot AS (SELECT source, sum(n) AS tot FROM st GROUP BY 1),
        | share AS (
        |  SELECT st.source, term, divide(n * 1000000, tot) AS p
        |  FROM st JOIN tot ON tot.source = st.source),
        | grid AS (
        |  SELECT s.source, v.term, coalesce(p, 0) AS p
        |  FROM (SELECT source FROM tot) s
        |  CROSS JOIN vocab v
        |  LEFT JOIN share ON share.source = s.source AND share.term = v.term)
        |SELECT a.source AS src1, b.source AS src2,
        | CAST(divide(sum(abs(a.p - b.p)), 2) AS BIGINT) AS tvd_micro
        |FROM grid a JOIN grid b
        | ON a.term = b.term AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,

    "q140_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id % 2 = 0 AS is_even,
        |   generate_subscripts(embedding, 1) - 1 AS dim,
        |   CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT)
        |    AS milli
        |  FROM embeddings)
        |SELECT dim,
        | CAST(sum(CASE WHEN is_even THEN milli END) AS BIGINT) AS s_even,
        | CAST(sum(CASE WHEN NOT is_even THEN milli END) AS BIGINT) AS s_odd,
        | CAST(abs(divide(sum(CASE WHEN is_even THEN milli END) * 1000
        |, sum(CASE WHEN is_even THEN 1 ELSE 0 END))
        |  - divide(sum(CASE WHEN NOT is_even THEN milli END) * 1000
        |, sum(CASE WHEN NOT is_even THEN 1 ELSE 0 END))) AS BIGINT)
        |  AS drift_milli_x1000
        |FROM e GROUP BY 1""".stripMargin,

    "q141_exact_percentiles" ->
      """WITH ranked AS (
        |  SELECT event_type, value,
        |   row_number() OVER (PARTITION BY event_type
        |     ORDER BY value, event_id) AS rn,
        |   count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type,
        | max(CASE WHEN rn * 2 <= n + 1 THEN value END) AS p50,
        | max(CASE WHEN rn * 10 <= n * 9 THEN value END) AS p90,
        | max(CASE WHEN rn * 100 <= n * 99 THEN value END) AS p99,
        | max(value) AS p100,
        | count(*) AS n_rows
        |FROM ranked GROUP BY 1""".stripMargin,

    // q142's oracle is the FULL recompute — identical to q122's SQL:
    // the incremental merge must equal the batch rebuild exactly.
    "q142_scd2_merge" ->
      """WITH runs AS (
        |  SELECT user_id, event_type, min(ts) AS valid_from,
        |   count(*) AS n_events
        |  FROM (
        |   SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |     - row_number() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS grp
        |   FROM events)
        |  GROUP BY user_id, event_type, grp)
        |SELECT user_id, event_type AS state, valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
        |  AS valid_to,
        | n_events
        |FROM runs""".stripMargin,

    // q144's oracle unrolls the 10 BPE steps as CTE stages (the q48
    // unrolled-Lloyd technique): step k counts pairs from r{k-1},
    // picks the (weight DESC, a, b) max, and rewrites via the same
    // left-to-right replace().
    "q144_bpe_merges" -> {
      val unions = (1 to 10).map { k =>
        s"SELECT $k AS step, a AS left_tok, b AS right_tok, CAST(weight AS BIGINT) AS weight FROM m$k"
      }.mkString("\nUNION ALL\n")
      s"""WITH $bpeInductionCtes
         |$unions""".stripMargin
    },

    "q151_bpe_tokenize" -> {
      // re-derives the same 10 merges (bpeInductionCtes) and applies
      // them to every document word via the nested-replace chain the
      // engine compiles from the driver-side merge list
      val applied = (1 to 10).foldLeft(
        "' ' || array_to_string(regexp_extract_all(w, '.'), ' ') || ' '") {
        (acc, k) =>
          s"""replace($acc,
             |   ' ' || (SELECT a FROM m$k) || ' ' || (SELECT b FROM m$k) || ' ',
             |   ' ' || (SELECT a FROM m$k) || (SELECT b FROM m$k) || ' ')""".stripMargin
      }
      s"""WITH $bpeInductionCtes,
         | docw AS (
         |  SELECT doc_id, w FROM (
         |   SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS w
         |   FROM documents)
         |  WHERE len(w) > 0),
         | docp AS (
         |  SELECT doc_id, len(string_split(trim($applied), ' ')) AS pieces
         |  FROM docw)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         | CAST(sum(pieces) AS BIGINT) AS n_pieces,
         | CAST(divide(CAST(sum(pieces) AS BIGINT) * 1000000
         |, CAST(count(*) AS BIGINT)) AS BIGINT) AS fertility_micro
         |FROM docp GROUP BY doc_id""".stripMargin
    },

    "q126_copurchase_triangles" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        | edges AS (
        |  SELECT a.pk AS p1, b.pk AS p2
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |FROM edges e1
        |JOIN edges e2 ON e1.p2 = e2.p1
        |JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2""".stripMargin,

    "q188_clustering_coeff" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        | edges AS (
        |  SELECT a.pk AS p1, b.pk AS p2
        |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        | tri AS (
        |  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
        |  FROM edges e1
        |  JOIN edges e2 ON e1.p2 = e2.p1
        |  JOIN edges e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2),
        | tcnt AS (SELECT v, count(*) AS n_tri FROM (
        |   SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
        |   UNION ALL SELECT c FROM tri) GROUP BY v),
        | deg AS (SELECT v, count(*) AS deg FROM (
        |   SELECT p1 AS v FROM edges UNION ALL SELECT p2 FROM edges)
        |  GROUP BY v)
        |SELECT deg.v AS pk, deg.deg,
        |  COALESCE(tcnt.n_tri, 0) AS n_tri,
        |  CAST(divide(2 * COALESCE(tcnt.n_tri, 0) * 1000000
        |, (deg.deg * (deg.deg - 1))) AS BIGINT) AS coeff_micro
        |FROM deg LEFT JOIN tcnt ON deg.v = tcnt.v
        |WHERE deg.deg >= 2""".stripMargin)
}
