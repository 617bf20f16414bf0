package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fifth tranche (round 4, continued): privacy + model-inference
  * operators a production training-data pipeline runs between ingest
  * and tokenization — PII detection/redaction and linear quality-
  * classifier scoring.
  *
  * Neither exists in the reference (SURVEY.md §2.1 — an ingest pipe);
  * they extend the LLM-pipeline surface like TextDedup/Analytics.
  * Repo determinism policy applies: the synthetic-contact suffix in
  * q145 is constructed identically in both engines (the fixture text
  * carries no natural PII, so the query plants some — derived purely
  * from doc_id, never from randomness), regexes are RE2-safe subsets
  * that Java regex and DuckDB/RE2 evaluate identically, and the
  * classifier in q146 is exact integer arithmetic over md5-hashed
  * features (the q54/q85/q99 portability construction).
  */
object Analytics3 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  /** Email + 4-digit-code patterns: RE2-safe (no backrefs/lookahead),
    * identical leftmost-first greedy semantics in Java regex and RE2.
    */
  private val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val CodePat  = "\\b\\d{4}\\b"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q208: per-source Gini concentration of document length — the
    // contribution-inequality health metric of a multi-source corpus
    // (a source where a few giant documents carry most characters
    // trains very differently from an evenly-spread one; HHI q171
    // measures the SOURCE mix, this measures inequality WITHIN each
    // source). Exact integer algebra with ties handled in closed
    // form: for ranks 1..n ascending by length v, Gini =
    // (2·Σ i·vᵢ − (n+1)·Σv) / (n·Σv); a tie block of cnt equal
    // values at cumulative count `cum` contributes
    // v·(2·cum − cnt + 1)·cnt to 2·Σ i·vᵢ regardless of intra-block
    // order, so the whole statistic computes from the (source, v,
    // cnt) HISTOGRAM through ScalableRank.groupedCumSum — no
    // whole-source window, no per-row rank. DECIMAL(38,0) carries
    // the scaled numerator (×1e6 overflows BIGINT past ~1e12 total
    // chars per source), output is exact integer micro-units.
    "q208_source_gini" -> ((s, d) => {
      val hist = t(s, d, "documents")
        .groupBy(col("source"), col("n_chars").cast("long").as("v"))
        .agg(count(lit(1)).as("cnt"))
      ScalableRank.groupedCumSum(hist, Seq("source"), "v", "cnt", "cum", "n")
        .groupBy(col("source"))
        .agg(
          max(col("n")).as("n_docs"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * (2 * cum - cnt + 1) * cnt"))
            .as("two_iv"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * cnt")).as("s"))
        .select(col("source"),
          col("n_docs").cast("long").as("n_docs"),
          expr("""CAST((two_iv - (n_docs + 1) * s) * 1000000
                 DIV (n_docs * s) AS BIGINT)""").as("gini_micro"))
    }),

    // q209: NATIVE session windows — Spark's session_window()
    // aggregation (dynamic-gap session assignment inside the
    // aggregate operator) in BATCH mode: q78 gates the same construct
    // through the streaming engine (merging session state across
    // micro-batches); this gates the batch operator path plus the
    // duration algebra q78's per-session output doesn't aggregate.
    // What's gated: Spark's merge rule (an event extends a session
    // iff its time is STRICTLY before last_event + gap — session
    // windows are end-exclusive) lands on exactly the islands the
    // oracle's lag/cum-sum form computes with `delta >= gap` opening
    // a new session. Duration = (end − start) = (last − first) + gap,
    // in exact integer micros. Scale shape: session_window is a
    // keyed aggregate — one (user_id) exchange, per-key in-operator
    // merging, never a corpus-wide sort or window.
    "q209_session_window" -> ((s, d) => {
      import org.apache.spark.sql.functions.{session_window => sw}
      val sess = t(s, d, "events")
        .groupBy(sw(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_ev"))
        .select(col("user_id"),
          (unix_micros(col("session_window.end")) -
            unix_micros(col("session_window.start"))).as("dur"),
          col("n_ev"))
      sess.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"),
          max(col("n_ev")).as("max_session_events"),
          sum(col("dur")).as("total_session_micros"))
    }),

    // q210: LISTAGG ... WITHIN GROUP (ORDER BY ...) — Spark 4's
    // ordered string aggregation (the SQL:2016 construct analysts
    // reach for first when flattening a dimension); deterministic
    // because the order key is total. DuckDB spells the same thing
    // string_agg(x, sep ORDER BY k). The per-nation branch exercises
    // a bigger group (customers per nation ordered by key) so the
    // gate covers multi-element ordering, not just the 5-row region
    // case.
    "q210_listagg" -> ((s, d) => {
      t(s, d, "region").createOrReplaceTempView("graft_region")
      t(s, d, "nation").createOrReplaceTempView("graft_nation2")
      t(s, d, "customer").createOrReplaceTempView("graft_customer2")
      s.sql("""
        SELECT r.r_name,
          listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name) AS nations,
          CAST(count(*) AS BIGINT) AS n_nations,
          CAST(sum(c.n_cust) AS BIGINT) AS n_customers,
          md5(CAST(listagg(c.cust_heads, '|')
            WITHIN GROUP (ORDER BY n.n_name) AS BINARY)) AS heads_fp
        FROM graft_region r
        JOIN graft_nation2 n ON n.n_regionkey = r.r_regionkey
        JOIN (
          SELECT c_nationkey, count(*) AS n_cust,
            listagg(c_name, ';') WITHIN GROUP (ORDER BY c_custkey) AS cust_heads
          FROM graft_customer2 WHERE c_custkey <= 300
          GROUP BY c_nationkey
        ) c ON c.c_nationkey = n.n_nationkey
        GROUP BY r.r_name
      """)
    }),

    // q211: rank-filter pushdown — the `WHERE rk <= k` over a ranked
    // subquery that Spark 4 plans as WindowGroupLimit: every task
    // keeps only its local top-k per group BEFORE the shuffle, so the
    // exchange carries O(tasks × groups × k) rows instead of the
    // corpus — the optimizer-derived sibling of the native
    // TopKPerGroup operator (q91) and the plan shape that makes
    // per-group top-k viable at 100 TB without a custom operator.
    // Plan-guarded in PlanQualitySpec; rank() with a total tiebreak
    // is deterministic and identical in DuckDB.
    "q211_window_group_limit" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem4")
      s.sql("""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
          CAST(rk AS BIGINT) AS rk
        FROM (
          SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
            rank() OVER (PARTITION BY l_returnflag
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
          FROM graft_lineitem4)
        WHERE rk <= 3
      """)
    }),

    // q212: SALTED SKEW JOIN — the other half of q60's salted
    // distinct and q134's skew profiler: actually JOINING through a
    // hot key without one task owning the hot key's entire fan-in.
    // A synthetic 70%-hot key (the q134 construction) joins a derived
    // dimension; the fact side salts with a DETERMINISTIC shard
    // ((orderkey + linenumber) mod S — no randomness, q54 policy;
    // NOT linenumber mod S alone: l_linenumber ∈ [1,7], so that
    // expression never hits salt 0 and spreads the hot key over at
    // most 7 of the S shards while every dim key drags a dead salt-0
    // replica through the join — r7 ADVICE), the dim side replicates
    // ×S via explode(sequence), and the join key becomes (key, salt)
    // — the hot key's rows spread over S tasks instead of one. S=8 is
    // a local constant; at 100 TB S sizes to hot-key-rows /
    // target-task-rows, and AQE's skew-join split is the adaptive
    // alternative when skew is not known a priori. The oracle is the
    // UNSALTED join — salting must be invisible in the result.
    "q212_salted_join" -> ((s, d) => {
      val S = 8
      val fact = t(s, d, "lineitem")
        .select(
          when(col("l_orderkey") % 10 < 7, lit(1L))
            .otherwise(col("l_orderkey")).as("k"),
          col("l_quantity").cast("long").as("qty"),
          ((col("l_orderkey") + col("l_linenumber")) % S).cast("int").as("_salt"))
      val dim = t(s, d, "orders")
        .select(
          when(col("o_orderkey") % 10 < 7, lit(1L))
            .otherwise(col("o_orderkey")).as("k"),
          col("o_orderpriority"))
        .groupBy(col("k"))
        .agg(min(col("o_orderpriority")).as("prio"))
        .withColumn("_salt", explode(expr(s"sequence(0, ${S - 1})")))
      fact.join(dim, Seq("k", "_salt"))
        .groupBy(col("prio"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("qty")).as("qty_sum"))
    }),

    // q213: BITWISE AGGREGATES (bit_and / bit_or / bit_xor) — the
    // feature-flag / bitmap-rollup surface (e.g. "which capability
    // bits are common to ALL events of a type"). Order-insensitive
    // and exact by construction, so the gate is pure semantics
    // parity; grouped + a global ALL row via UNION (not CUBE — keys
    // stay non-null VARCHAR).
    "q213_bit_aggs" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("graft_events2")
      s.sql("""
        SELECT event_type,
          CAST(bit_and(user_id) AS BIGINT) AS b_and,
          CAST(bit_or(user_id)  AS BIGINT) AS b_or,
          CAST(bit_xor(user_id) AS BIGINT) AS b_xor,
          count(*) AS n
        FROM graft_events2 GROUP BY event_type
        UNION ALL
        SELECT 'ALL' AS event_type,
          CAST(bit_and(user_id) AS BIGINT) AS b_and,
          CAST(bit_or(user_id)  AS BIGINT) AS b_or,
          CAST(bit_xor(user_id) AS BIGINT) AS b_xor,
          count(*) AS n
        FROM graft_events2
      """)
    }),

    // q214: CALENDAR EDGE SEMANTICS — month/year arithmetic at
    // end-of-month boundaries is where engines classically diverge
    // (Jan 31 + 1 month; leap-day + 1 year), plus quarter truncation
    // and last_day. Spark's add_months clamps to month end and DuckDB's
    // INTERVAL arithmetic does the same — this gate PINS that
    // equivalence over every order date rather than assuming it.
    // Output: per (quarter, is-month-end flag of the +1-month due
    // date) counts — any divergence in any row moves a count.
    "q214_calendar_edges" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(to_date(col("o_orderdate")).as("od"))
        .withColumn("due", add_months(col("od"), 1))
        .withColumn("q_start", to_date(date_trunc("quarter", col("od"))))
        .withColumn("is_eom", (col("due") === last_day(col("due"))).cast("int"))
      o.groupBy(col("q_start"), col("is_eom"))
        .agg(count(lit(1)).as("n"),
          min(col("due")).as("min_due"),
          max(col("due")).as("max_due"))
    }),

    // q215: EXACT Kolmogorov–Smirnov drift per source — the
    // two-sample KS statistic between two md5-hash-split halves
    // of each source's length distribution (the snapshot
    // drift check q140 does for embeddings, here for a scalar shape
    // with the full-CDF statistic instead of per-dim means).
    // Exactness construction: at every distinct length v,
    // |CDF₀(v) − CDF₁(v)| = |cum0·n1 − cum1·n0| / (n0·n1) — the
    // common denominator makes the numerator EXACT integer algebra,
    // so the max is found before any division and one truncating
    // division at the end yields micro-units (q208's DECIMAL(38,0)
    // pattern: cum×n products overflow BIGINT at corpus scale).
    // Plan: both cumulative counts ride ONE groupedCumSums pass
    // (single range exchange, per-partition scan) over the (source,
    // v) histogram — never a whole-source window, never two passes.
    "q215_ks_drift" -> ((s, d) => {
      // halves split by the md5-hash coin (q71's portable
      // construction) — doc_id PARITY is degenerate in this corpus
      // (source assignment correlates with it), the hash bit is not
      val half0 = substring(md5(col("doc_id").cast("string")
        .cast("binary")), 1, 1) < "8"
      val hist = t(s, d, "documents")
        .groupBy(col("source"), col("n_chars").cast("long").as("v"))
        .agg(
          sum(when(half0, 1L).otherwise(0L)).as("c0"),
          sum(when(!half0, 1L).otherwise(0L)).as("c1"))
      ScalableRank.groupedCumSums(hist, Seq("source"), "v",
          Seq("c0", "c1"), Seq("cum0", "cum1"), Seq("n0", "n1"))
        .groupBy(col("source"))
        .agg(
          max(col("n0")).as("n_h0"),
          max(col("n1")).as("n_h1"),
          max(abs(expr("CAST(cum0 AS DECIMAL(38,0)) * n1 - " +
            "CAST(cum1 AS DECIMAL(38,0)) * n0"))).as("num"))
        // a source entirely inside one half has no two-sample
        // statistic (division by n0·n1 = 0) — excluded on both sides
        .filter(col("n_h0") > 0 && col("n_h1") > 0)
        .select(col("source"),
          col("n_h0").cast("long").as("n_h0"),
          col("n_h1").cast("long").as("n_h1"),
          expr("CAST(num * 1000000 DIV (CAST(n_h0 AS DECIMAL(38,0)) " +
            "* n_h1) AS BIGINT)").as("ks_micro"))
    }),

    // q216: URL PARSING (parse_url HOST/PATH/QUERY-param) — the
    // web-corpus staple (a crawl pipeline groups by registrable
    // host and slices by query params constantly). URLs are built
    // deterministically from document columns, so what's gated is
    // Spark's parse_url component extraction landing on exactly the
    // regexp decomposition the oracle spells — including the
    // query-param lookup path.
    "q216_url_parse" -> ((s, d) => {
      t(s, d, "documents").createOrReplaceTempView("graft_docs3")
      s.sql("""
        WITH u AS (
          SELECT concat('https://crawl-', source, '.example.org/docs/',
                        CAST(doc_id AS STRING), '/view?lang=', lang,
                        '&len=', CAST(n_chars AS STRING)) AS url
          FROM graft_docs3)
        SELECT parse_url(url, 'HOST') AS host,
          count(*) AS n_pages,
          count(DISTINCT parse_url(url, 'PATH')) AS n_paths,
          CAST(sum(CAST(parse_url(url, 'QUERY', 'len') AS BIGINT))
            AS BIGINT) AS len_sum,
          CAST(sum(CASE WHEN parse_url(url, 'QUERY', 'lang') = 'en'
            THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        FROM u GROUP BY parse_url(url, 'HOST')
      """)
    }),

    // q217: PERCENTILE_DISC ... WITHIN GROUP — the SQL-standard
    // inverse-distribution function (smallest value whose cumulative
    // distribution reaches p). On an integer-valued column the
    // result is an ACTUAL data value, so the gate is exact with no
    // interpolation rounding in sight; quartiles per return flag,
    // the q63/q141 percentile family's parser-level sibling.
    "q217_percentile_disc" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem5")
      s.sql("""
        SELECT l_returnflag,
          CAST(percentile_disc(0.25) WITHIN GROUP
            (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS q25,
          CAST(percentile_disc(0.50) WITHIN GROUP
            (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS q50,
          CAST(percentile_disc(0.75) WITHIN GROUP
            (ORDER BY CAST(l_quantity AS BIGINT)) AS BIGINT) AS q75,
          count(*) AS n
        FROM graft_lineitem5 GROUP BY l_returnflag
      """)
    }),

    // q218: DATETIME CONVENTION PARITY — the functions whose
    // conventions genuinely DIFFER between engines, pinned by
    // desugaring the oracle to Spark's convention: dayofweek is
    // 1-based-Sunday in Spark but 0-based-Sunday in DuckDB (+1 in the
    // oracle); timestampdiff(MONTH) counts FULL elapsed months in
    // Spark while DuckDB's datediff('month') counts month-boundary
    // CROSSINGS (Jan 31 → Feb 15 is 1 there, 0 here) — the oracle
    // spells the full-month closed form. weekofyear is ISO in both
    // (2023-01-01 → week 52) and rides along as the agreeing control.
    // The anchor day 15 exists in every month, so no end-of-month
    // clamping interacts with the closed form.
    "q218_datetime_conventions" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("graft_orders3")
      s.sql("""
        SELECT CAST(dayofweek(od) AS BIGINT) AS dow, count(*) AS n,
          CAST(sum(weekofyear(od)) AS BIGINT) AS isoweek_sum,
          CAST(sum(timestampdiff(MONTH, od, DATE '2026-01-15'))
            AS BIGINT) AS full_months_sum
        FROM (SELECT to_date(o_orderdate) AS od FROM graft_orders3)
        GROUP BY dayofweek(od)
      """)
    }),

    // q220: INCREMENTAL JOIN-AGGREGATE MAINTENANCE — q115's mergeable-
    // partials idea carried across a JOIN: a materialized aggregate
    // over fact ⋈ dim absorbs an appended fact batch by joining ONLY
    // the delta against the dim and merging partials (sum-of-counts,
    // sum-of-sums) — the base relation is never re-joined or
    // re-scanned. At 100 TB this is the difference between touching a
    // day's append and recomputing a year's join. The driver gate
    // compares the incrementally-maintained result against the oracle's
    // full recompute — the merge algebra must be invisible. The
    // "append" is the deterministic l_orderkey % 10 = 9 slice standing
    // in for a new ingest batch.
    "q220_join_ivm" -> ((s, d) => {
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      def partial(li: DataFrame): DataFrame = li
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("qty"))
      val base = partial(t(s, d, "lineitem")
        .filter(col("l_orderkey") % 10 =!= 9))
      val delta = partial(t(s, d, "lineitem")
        .filter(col("l_orderkey") % 10 === 9))
      base.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).cast("long").as("n"),
          sum(col("qty")).cast("long").as("qty"))
    }),

    // q221: LOCF gap fill — last_value(... IGNORE NULLS) over a
    // per-user event-time frame, the last-observation-carried-forward
    // staple of sensor/metric pipelines (q101 fills MISSING buckets on
    // a spine; this fills NULL measurements on existing rows). Nulls
    // are planted deterministically (event_id % 3 ≠ 0 masks the
    // value), values quantized to integer cents so the carried value
    // is exact; the leading-null run stays NULL in both engines, and
    // the aggregate counts both fill states so any divergence on any
    // row moves a count.
    "q221_locf_fill" -> ((s, d) => {
      t(s, d, "events").createOrReplaceTempView("graft_events3")
      s.sql("""
        WITH masked AS (
          SELECT user_id, ts, event_id,
            CASE WHEN event_id % 3 = 0
                 THEN CAST(round(value * 100) AS BIGINT) END AS v
          FROM graft_events3),
        filled AS (
          SELECT user_id, v,
            last_value(v) IGNORE NULLS OVER (PARTITION BY user_id
              ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
          FROM masked)
        SELECT user_id,
          count(*) AS n,
          CAST(count(v) AS BIGINT) AS n_observed,
          CAST(count(v_fill) AS BIGINT) AS n_filled,
          CAST(sum(v_fill) AS BIGINT) AS fill_sum
        FROM filled GROUP BY user_id
      """)
    }),

    // q222: PAGINATION — ORDER BY ALL + LIMIT/OFFSET, the result-page
    // surface (Spark 3.4 added OFFSET, 4.0 ORDER BY ALL — both
    // DuckDB-native, so the oracle is byte-identical SQL). The page
    // is deterministic because ORDER BY ALL totals the row; the gate
    // pins that both engines infer the same column order for ALL and
    // land on the same second page.
    "q222_pagination" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem6")
      s.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM graft_lineitem6
        GROUP BY l_returnflag, l_linestatus
        ORDER BY ALL
        LIMIT 3 OFFSET 2
      """)
    }),

    // q191: INTERVAL UNION / coverage — the overlap-merging sweep
    // (total "active time" from possibly-overlapping sessions), the
    // gaps-and-islands variant q122's same-state runs don't cover:
    // here islands are defined by TEMPORAL OVERLAP, not value
    // equality. Intervals derive deterministically from events
    // (duration = event_id mod 3600 seconds, so the oracle is exact
    // integer micros end to end). The sweep is the classic two-window
    // form: a row opens a new island iff its start exceeds the
    // running max of all previous ends; the island id is the running
    // sum of those opens. Both windows share ONE user_id exchange and
    // one (start, event_id) sort; per-user state is the single
    // running max — nothing materializes an island in memory, so the
    // plan is insensitive to how many intervals an island spans.
    // Touching intervals (start == prev end) merge, start > pmax
    // opens — pinned by the strict comparison, identical in both
    // engines.
    "q191_interval_union" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
      val iv = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("st"),
          (unix_micros(col("ts")) + (col("event_id") % 3600) * 1000000L).as("en"))
      iv
        .withColumn("pmax",
          max(col("en")).over(w.rowsBetween(Long.MinValue, -1)))
        .withColumn("island",
          sum(when(col("pmax").isNull || col("st") > col("pmax"), 1L)
            .otherwise(0L)).over(w))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("st")).as("s0"), max(col("en")).as("e1"),
          count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("e1") - col("s0")).as("covered_us"),
          max(col("n")).as("max_island_events"))
    }),

    // q145: PII detection + redaction — the compliance pass every
    // training corpus goes through before tokenization. Each doc gets
    // a deterministic synthetic contact block (the fixture has no
    // natural PII; planting it from doc_id keeps the oracle exact),
    // then one scan detects emails / numeric codes and emits the
    // redacted text's fingerprint. Plan shape at 100 TB: a pure
    // per-row map over the corpus — regex extract + replace + md5,
    // no shuffle at all, trivially whole-stage-codegen'd. Counting
    // and fingerprinting per doc (not per lang) keeps the gate strong:
    // any engine disagreement on a single regex match flips a hash.
    "q145_pii_redaction" -> ((s, d) => {
      val aug = t(s, d, "documents").select(col("doc_id"), col("lang"),
        lower(concat(col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@ex"), col("doc_id") % 7, lit(".org ref "),
          lpad(((col("doc_id") * 37) % 10000).cast("string"), 4, "0"))).as("t2"))
      aug.select(col("doc_id"), col("lang"),
        size(regexp_extract_all(col("t2"), lit(EmailPat), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t2"), lit(CodePat), lit(0)))
          .cast("long").as("n_codes"),
        md5(regexp_replace(regexp_replace(col("t2"), EmailPat, "<EMAIL>"),
          CodePat, "<NUM>").cast("binary")).as("redacted_md5"))
    }),

    // q146: quality-classifier inference — a fasttext-shaped linear
    // model over hashed bag-of-words features, the standard "model
    // quality filter" stage (CCNet/Llama-style) run as a pure Spark
    // plan. Feature hash = first 4 md5 hex digits of the token
    // (u16, engine-portable); weight = u16 % 61 - 30 (a fixed integer
    // weight table indexed by feature hash — inference-time shape is
    // identical to a trained model's, the weights here are just a
    // deterministic stand-in). Score = sum of weights over token
    // OCCURRENCES (not types), label = score > 0. Plan at 100 TB:
    // explode + partial-aggregated groupBy on doc_id — near-unique
    // keys, so map-side combine collapses each doc locally and the
    // one shuffle carries ~1 row/doc. Exact integers end-to-end.
    "q146_quality_classifier" -> ((s, d) => {
      // one-md5 u16 decode (conv), not per-digit instr — see q99; at
      // scale this runs per token OCCURRENCE, so the 4x md5 the
      // collapsed projection used to evaluate was the hot path
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
            .as("tok"))
        .withColumn("h", md5(col("tok").cast("binary")))
        .withColumn("wt",
          expr("CAST(conv(substr(h, 1, 4), 16, 10) AS INT)") % 61 - 30)
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tok"),
          sum(col("wt")).as("score"))
        .withColumn("quality_pass",
          when(col("score") > 0, 1L).otherwise(0L))
    }),

    // q150: per-document bigram language-model scoring — the
    // KenLM/CCNet-shaped "perplexity filter": train a conditional
    // bigram model ON the corpus itself, then score every document by
    // its average conditional probability, in exact integer
    // micro-units (P(w2|w1) ≈ n(w1 w2)·10⁶ div n(w1 ·) — integer
    // division is part of the operator's definition, so the oracle
    // matches bit-for-bit; the float-log form would flake the hash on
    // ulp differences). Plan shape at 100 TB: ONE corpus explode
    // compressed immediately into the per-doc bigram multiset
    // (doc_id, w1, w2, m) — persisted, since both the LM build and
    // the scoring join consume it; the LM is derived from the
    // multiset by re-aggregation (no second corpus pass), and the
    // scoring join is a hash equi-join on (w1, w2) between two
    // already-compressed relations. Skewed hot bigrams ("of the")
    // are AQE-split.
    "q150_bigram_lm_score" -> ((s, d) => {
      val docBg = graft.CacheRegistry.getOrPersist(s, s"analytics3.docbg:$d") {
        t(s, d, "documents")
          .select(col("doc_id"),
            regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)).as("ws"))
          .filter(size(col("ws")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(ws)-1), " +
              "i -> struct(ws[i-1] AS w1, ws[i] AS w2))")).as("p"))
          .groupBy(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
          .agg(count(lit(1)).as("m"))
      }
      val lm = docBg.groupBy(col("w1"), col("w2"))
        .agg(sum(col("m")).cast("long").as("n2"))
      val uni = lm.groupBy(col("w1")).agg(sum(col("n2")).cast("long").as("n1"))
      val cond = lm.join(uni, "w1")
        .select(col("w1"), col("w2"), expr("n2 * 1000000L div n1").as("cond_micro"))
      docBg.join(cond, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(sum(col("m")).cast("long").as("n_bigrams"),
          sum(col("m") * col("cond_micro")).cast("long").as("lm_total_micro"))
        .select(col("doc_id"), col("n_bigrams"), col("lm_total_micro"),
          expr("lm_total_micro div n_bigrams").as("avg_micro"))
    }),

    // q172: Z-order curve locality accounting — the layout-planning
    // pass behind [[graft.scale.ScaleOps.zOrderWrite]]: every event
    // is placed on the Morton curve over (user_id, ⌊value⌋), the
    // curve is cut into 64 equal-width position ranges (what the
    // clustered write turns into files), and each range reports the
    // (user, value) bounding box it covers. Small per-bucket boxes =
    // the file-skipping property; the oracle re-derives the curve
    // with the same mask-and-multiply integer arithmetic, so the gate
    // pins the exact bit layout of the curve, not just statistics.
    // One scan + one tiny 1-row max broadcast + one 64-group agg.
    "q172_zorder_locality" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id").cast("long").bitwiseAND(lit(65535L)).as("ux"),
          floor(col("value")).cast("long").bitwiseAND(lit(65535L)).as("vb"))
        .withColumn("z", graft.scale.ScaleOps.morton16(col("ux"), col("vb")))
      val mx = ev.agg(max(col("z")).as("zmax"))
      ev.join(broadcast(mx))
        .groupBy(expr("(z * 64L) div (zmax + 1L)").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("ux")).as("min_user"), max(col("ux")).as("max_user"),
          min(col("vb")).as("min_val"), max(col("vb")).as("max_val"))
    }),

    // q177: recency-weighted engagement — exponential half-life decay
    // done EXACTLY: each event's milli-value is right-shifted by its
    // age in 28-day half-lives (integer `div 2^k` = the decay factor
    // 2^-k with floor semantics, identical in both engines; shift
    // capped at 62 so the divisor stays in BIGINT). The usual
    // `value * exp(-age/τ)` float scoring can't be hash-gated; the
    // shift formulation keeps half-life semantics AND exactness.
    // Plan: scan + one user-keyed aggregation; the anchor "now" is
    // the corpus max(ts) (1-row broadcast), so results are
    // reproducible for a frozen corpus at any wall-clock.
    "q177_decayed_engagement" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"),
          floor(col("value") * lit(1000.0)).cast("long").as("vm"))
      val mx = ev.agg(max(col("ts")).as("now_ts"))
      ev.join(broadcast(mx))
        .withColumn("halves",
          least(expr("(unix_micros(now_ts) - unix_micros(ts)) div 2419200000000L"),
            lit(62L)))
        .withColumn("decayed", expr("vm div shiftleft(1L, CAST(halves AS INT))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("decayed")).cast("long").as("score_milli"),
          max(col("ts")).as("last_seen"))
    }),

    // q178: per-group OLS trend — slope of value over time per event
    // type, in exact integer rational form: with x = days since the
    // corpus min date and y = floor-milli value, slope = (nΣxy −
    // ΣxΣy)/(nΣx² − (Σx)²) is a ratio of exact BIGINT sums; the
    // gated output is its micro-scaled integer quotient plus both
    // raw numerator and denominator, so ranking/thresholding never
    // touches a float. One scan + one per-type aggregation (all five
    // sums in the same pass — the single-pass sufficient-statistics
    // shape every distributed regression uses).
    "q178_value_trend" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), col("ts"),
          floor(col("value") * lit(1000.0)).cast("long").as("y"))
      val mn = ev.agg(min(col("ts")).as("t0"))
      ev.join(broadcast(mn))
        .withColumn("x", expr("(unix_micros(ts) - unix_micros(t0)) div 86400000000L"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("long").as("sx"),
          sum(col("y")).cast("long").as("sy"),
          sum(col("x") * col("x")).cast("long").as("sxx"),
          sum(col("x") * col("y")).cast("long").as("sxy"))
        .select(col("event_type"), col("n"),
          expr("n * sxy - sx * sy").as("slope_num"),
          expr("n * sxx - sx * sx").as("slope_den"),
          // 1e3 scale, not 1e6: |num| reaches ~2e12 at sf0.1, so the
          // milli quotient keeps ~5000× BIGINT headroom for larger
          // corpora (y is already milli-scaled, so this is micro
          // value-units per day)
          expr("(1000L * (n * sxy - sx * sy)) div (n * sxx - sx * sx)")
            .as("slope_milli_per_day"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q222_pagination" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY ALL
        |LIMIT 3 OFFSET 2""".stripMargin,

    // same construct (IGNORE NULLS is inside the parens in DuckDB's
    // grammar, after them in Spark's). round(double→int) ties are
    // half-AWAY-from-zero in both engines (Spark's HALF_UP on the
    // magnitude ≡ C round), so the integer-cents quantization is
    // engine-stable; fill_sum would red instantly if it weren't.
    "q221_locf_fill" ->
      """WITH masked AS (
        |  SELECT user_id, ts, event_id,
        |   CASE WHEN event_id % 3 = 0
        |        THEN CAST(round(value * 100) AS BIGINT) END AS v
        |  FROM events),
        | filled AS (
        |  SELECT user_id, v,
        |   last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill
        |  FROM masked)
        |SELECT user_id,
        | count(*) AS n,
        | CAST(count(v) AS BIGINT) AS n_observed,
        | CAST(count(v_fill) AS BIGINT) AS n_filled,
        | CAST(sum(v_fill) AS BIGINT) AS fill_sum
        |FROM filled GROUP BY user_id""".stripMargin,

    // the oracle is the FULL recompute — incremental maintenance must
    // be invisible in the result
    "q220_join_ivm" ->
      """SELECT o.o_orderpriority,
        | count(*) AS n,
        | CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |GROUP BY o.o_orderpriority""".stripMargin,

    // dow+1 (0-based→1-based Sunday), full months spelled closed-form
    // (DuckDB datediff('month') counts boundary crossings, not full
    // months)
    "q218_datetime_conventions" ->
      """SELECT CAST(dayofweek(od) + 1 AS BIGINT) AS dow, count(*) AS n,
        | CAST(sum(weekofyear(od)) AS BIGINT) AS isoweek_sum,
        | CAST(sum((2026 - year(od)) * 12 + (1 - month(od))
        |   - CASE WHEN day(od) > 15 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS full_months_sum
        |FROM (SELECT CAST(o_orderdate AS DATE) AS od FROM orders)
        |GROUP BY dayofweek(od) + 1""".stripMargin,

    // oracle rebuilds the same URLs and decomposes them with regexps
    // (parse_url is the gated Spark construct; DuckDB spells the
    // generic URL grammar)
    "q216_url_parse" ->
      """WITH u AS (
        |  SELECT concat('https://crawl-', source, '.example.org/docs/',
        |                CAST(doc_id AS VARCHAR), '/view?lang=', lang,
        |                '&len=', CAST(n_chars AS VARCHAR)) AS url
        |  FROM documents)
        |SELECT regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
        | count(*) AS n_pages,
        | CAST(count(DISTINCT regexp_extract(url,
        |   '^[a-z]+://[^/?#]+([^?#]*)', 1)) AS BIGINT) AS n_paths,
        | CAST(sum(CAST(regexp_extract(url, '[?&]len=([^&#]*)', 1)
        |   AS BIGINT)) AS BIGINT) AS len_sum,
        | CAST(sum(CASE WHEN regexp_extract(url, '[?&]lang=([^&#]*)', 1)
        |   = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
        |FROM u GROUP BY 1""".stripMargin,

    "q217_percentile_disc" ->
      """SELECT l_returnflag,
        | CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.25) AS BIGINT) AS q25,
        | CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.50) AS BIGINT) AS q50,
        | CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.75) AS BIGINT) AS q75,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    // plain per-source windows (fine for the oracle); HUGEINT carries
    // the cum×n products, floor division at the very end only
    "q215_ks_drift" ->
      """WITH hist AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v,
        |   sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |       THEN 1 ELSE 0 END) AS c0,
        |   sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
        |       THEN 0 ELSE 1 END) AS c1
        |  FROM documents GROUP BY source, CAST(n_chars AS BIGINT)),
        | cum AS (
        |  SELECT source,
        |   sum(c0) OVER (PARTITION BY source ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum0,
        |   sum(c1) OVER (PARTITION BY source ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
        |   sum(c0) OVER (PARTITION BY source) AS n0,
        |   sum(c1) OVER (PARTITION BY source) AS n1
        |  FROM hist)
        |SELECT source,
        | CAST(max(n0) AS BIGINT) AS n_h0,
        | CAST(max(n1) AS BIGINT) AS n_h1,
        | CAST(divide(max(abs(CAST(cum0 AS HUGEINT) * n1 -
        |              CAST(cum1 AS HUGEINT) * n0)) * 1000000
        |, (CAST(max(n0) AS HUGEINT) * max(n1))) AS BIGINT) AS ks_micro
        |FROM cum GROUP BY source
        |HAVING max(n0) > 0 AND max(n1) > 0""".stripMargin,

    // the UNSALTED join — salting must be invisible in the result
    "q212_salted_join" ->
      """WITH fact AS (
        |  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1
        |              ELSE l_orderkey END AS k,
        |   CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        | dim AS (
        |  SELECT CASE WHEN o_orderkey % 10 < 7 THEN 1
        |              ELSE o_orderkey END AS k,
        |   min(o_orderpriority) AS prio
        |  FROM orders GROUP BY 1)
        |SELECT d.prio, count(*) AS n_items,
        | CAST(sum(f.qty) AS BIGINT) AS qty_sum
        |FROM fact f JOIN dim d ON d.k = f.k
        |GROUP BY d.prio""".stripMargin,

    "q213_bit_aggs" ->
      """SELECT event_type,
        | CAST(bit_and(user_id) AS BIGINT) AS b_and,
        | CAST(bit_or(user_id)  AS BIGINT) AS b_or,
        | CAST(bit_xor(user_id) AS BIGINT) AS b_xor,
        | count(*) AS n
        |FROM events GROUP BY event_type
        |UNION ALL
        |SELECT 'ALL' AS event_type,
        | CAST(bit_and(user_id) AS BIGINT) AS b_and,
        | CAST(bit_or(user_id)  AS BIGINT) AS b_or,
        | CAST(bit_xor(user_id) AS BIGINT) AS b_xor,
        | count(*) AS n
        |FROM events""".stripMargin,

    "q214_calendar_edges" ->
      """WITH o AS (
        |  SELECT CAST(o_orderdate AS DATE) AS od,
        |   CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS due,
        |   CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
        |     AS q_start
        |  FROM orders)
        |SELECT q_start,
        | CAST(CASE WHEN due = last_day(due) THEN 1 ELSE 0 END AS INT)
        |   AS is_eom,
        | count(*) AS n, min(due) AS min_due, max(due) AS max_due
        |FROM o GROUP BY q_start,
        | CAST(CASE WHEN due = last_day(due) THEN 1 ELSE 0 END AS INT)""".stripMargin,

    // islands form: a session opens where the gap from the previous
    // event is >= 30 min (Spark's end-exclusive merge rule), duration
    // = span + gap — exact integer micros end to end
    "q209_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tu FROM events),
        | lagged AS (SELECT user_id, tu,
        |   lag(tu) OVER (PARTITION BY user_id ORDER BY tu) AS prev
        |  FROM e),
        | isl AS (SELECT user_id, tu,
        |   sum(CASE WHEN prev IS NULL OR tu - prev >= 1800000000
        |     THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY tu) AS sid
        |  FROM lagged),
        | sess AS (SELECT user_id, sid, count(*) AS n_ev,
        |   max(tu) - min(tu) + 1800000000 AS dur
        |  FROM isl GROUP BY user_id, sid)
        |SELECT user_id,
        | CAST(count(*) AS BIGINT) AS n_sessions,
        | CAST(sum(n_ev) AS BIGINT) AS n_events,
        | CAST(max(n_ev) AS BIGINT) AS max_session_events,
        | CAST(sum(dur) AS BIGINT) AS total_session_micros
        |FROM sess GROUP BY user_id""".stripMargin,

    "q210_listagg" ->
      """WITH c AS (
        |  SELECT c_nationkey, count(*) AS n_cust,
        |   string_agg(c_name, ';' ORDER BY c_custkey) AS cust_heads
        |  FROM customer WHERE c_custkey <= 300
        |  GROUP BY c_nationkey)
        |SELECT r.r_name,
        | string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
        | CAST(count(*) AS BIGINT) AS n_nations,
        | CAST(sum(c.n_cust) AS BIGINT) AS n_customers,
        | md5(string_agg(c.cust_heads, '|' ORDER BY n.n_name)) AS heads_fp
        |FROM region r
        |JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN c ON c.c_nationkey = n.n_nationkey
        |GROUP BY r.r_name""".stripMargin,

    "q211_window_group_limit" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        | CAST(rk AS BIGINT) AS rk
        |FROM (
        | SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |  rank() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        | FROM lineitem)
        |WHERE rk <= 3""".stripMargin,

    // same closed-form tie algebra over the histogram; the running
    // count is a plain window (fine for the oracle — DuckDB only has
    // to be right, not scalable). HUGEINT carries the ×1e6 numerator.
    // `//` (floor div) is deliberate and safe here, consistent with
    // the five long-green oracles that use it (q139/q150/q177/q178/
    // q172): both operands are non-negative (Gini numerator >= 0), so
    // floor == Spark's truncating `div`; the r5/r6 driver reds that
    // once made `//` a suspect were root-caused in r7 to decimal
    // OUTPUT stringification (see tools/check_driver_hash.py), not to
    // any oracle operator.
    "q208_source_gini" ->
      """WITH hist AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
        |  FROM documents GROUP BY source, CAST(n_chars AS BIGINT)),
        |ranked AS (
        |  SELECT source, v, cnt,
        |   sum(cnt) OVER (PARTITION BY source ORDER BY v
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist),
        |agg AS (
        |  SELECT source,
        |   sum(cnt) AS n_docs,
        |   sum(CAST(v AS HUGEINT) * (2 * cum - cnt + 1) * cnt) AS two_iv,
        |   sum(CAST(v AS HUGEINT) * cnt) AS s
        |  FROM ranked GROUP BY source)
        |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        | CAST(divide((two_iv - (n_docs + 1) * s) * 1000000
        |, (n_docs * s)) AS BIGINT) AS gini_micro
        |FROM agg""".stripMargin,
    "q191_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS st,
        |   epoch_us(ts) + (event_id % 3600) * 1000000 AS en
        |  FROM events),
        | m AS (SELECT user_id, event_id, st, en,
        |   max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        | isl AS (SELECT user_id, st, en,
        |   sum(CASE WHEN pmax IS NULL OR st > pmax THEN 1 ELSE 0 END)
        |     OVER (PARTITION BY user_id ORDER BY st, event_id) AS island
        |  FROM m),
        | g AS (SELECT user_id, island, min(st) AS s0, max(en) AS e1,
        |   count(*) AS n FROM isl GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        | CAST(sum(e1 - s0) AS BIGINT) AS covered_us,
        | CAST(max(n) AS BIGINT) AS max_island_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q145_pii_redaction" ->
      """WITH aug AS (
        |  SELECT doc_id, lang,
        |    lower(text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |      '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org ref ' ||
        |      lpad(CAST(doc_id * 37 % 10000 AS VARCHAR), 4, '0')) AS t2
        |  FROM documents)
        |SELECT doc_id, lang,
        |  len(regexp_extract_all(t2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))
        |    AS n_emails,
        |  len(regexp_extract_all(t2, '\b\d{4}\b')) AS n_codes,
        |  md5(regexp_replace(regexp_replace(t2,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{4}\b', '<NUM>', 'g')) AS redacted_md5
        |FROM aug""".stripMargin,

    "q146_quality_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |    unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, lang,
        |    ((instr('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 4096 +
        |     (instr('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 256 +
        |     (instr('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) * 16 +
        |     (instr('0123456789abcdef', substr(md5(tok), 4, 1)) - 1)) % 61 - 30
        |      AS wt
        |  FROM tok)
        |SELECT doc_id, lang, count(*) AS n_tok,
        |  CAST(sum(wt) AS BIGINT) AS score,
        |  CAST(CASE WHEN sum(wt) > 0 THEN 1 ELSE 0 END AS BIGINT) AS quality_pass
        |FROM w GROUP BY doc_id, lang""".stripMargin,

    "q150_bigram_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
        |  FROM documents),
        | bg AS (
        |  SELECT doc_id, w1, w2 FROM (
        |   SELECT doc_id, unnest(list_transform(
        |     generate_series(1, greatest(len(ws)-1, 0)),
        |     i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS p FROM t)
        |   ,LATERAL (SELECT p.w1 AS w1, p.w2 AS w2)),
        | docbg AS (
        |  SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY 1, 2, 3),
        | lm AS (
        |  SELECT w1, w2, CAST(sum(m) AS BIGINT) AS n2 FROM docbg GROUP BY 1, 2),
        | uni AS (SELECT w1, CAST(sum(n2) AS BIGINT) AS n1 FROM lm GROUP BY 1),
        | cond AS (
        |  SELECT lm.w1, lm.w2, CAST(divide(n2 * 1000000, n1) AS BIGINT) AS cond_micro
        |  FROM lm JOIN uni ON lm.w1 = uni.w1)
        |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
        | CAST(sum(m * cond_micro) AS BIGINT) AS lm_total_micro,
        | CAST(divide(CAST(sum(m * cond_micro) AS BIGINT)
        |, CAST(sum(m) AS BIGINT)) AS BIGINT) AS avg_micro
        |FROM docbg JOIN cond ON docbg.w1 = cond.w1 AND docbg.w2 = cond.w2
        |GROUP BY doc_id""".stripMargin,

    "q172_zorder_locality" ->
      """WITH dims AS (
        | SELECT (CAST(user_id AS BIGINT) & 65535) AS xa,
        |  (CAST(floor(value) AS BIGINT) & 65535) AS xb
        | FROM events),
        |s1 AS (SELECT xa, xb,
        |  ((xa | (xa * 256)) & 16711935) AS a1,
        |  ((xb | (xb * 256)) & 16711935) AS b1 FROM dims),
        |s2 AS (SELECT xa, xb,
        |  ((a1 | (a1 * 16)) & 252645135) AS a2,
        |  ((b1 | (b1 * 16)) & 252645135) AS b2 FROM s1),
        |s3 AS (SELECT xa, xb,
        |  ((a2 | (a2 * 4)) & 858993459) AS a3,
        |  ((b2 | (b2 * 4)) & 858993459) AS b3 FROM s2),
        |zc AS (SELECT xa AS ux, xb AS vb,
        |  (((a3 | (a3 * 2)) & 1431655765)
        |   | (((b3 | (b3 * 2)) & 1431655765) * 2)) AS z FROM s3),
        |mx AS (SELECT max(z) AS zmax FROM zc)
        |SELECT divide((z * 64), (zmax + 1)) AS bucket, count(*) AS n,
        | min(ux) AS min_user, max(ux) AS max_user,
        | min(vb) AS min_val, max(vb) AS max_val
        |FROM zc, mx
        |GROUP BY 1""".stripMargin,

    "q177_decayed_engagement" ->
      """WITH mx AS (SELECT max(ts) AS now_ts FROM events),
        |ev AS (
        | SELECT user_id, ts,
        |  CAST(floor(value * 1000.0) AS BIGINT) AS vm,
        |  least(divide((epoch_us(now_ts) - epoch_us(ts)), 2419200000000), 62)
        |   AS halves
        | FROM events, mx)
        |SELECT user_id, count(*) AS n_events,
        | CAST(sum(divide(vm, (1::BIGINT << CAST(halves AS INT)))) AS BIGINT)
        |  AS score_milli,
        | max(ts) AS last_seen
        |FROM ev GROUP BY 1""".stripMargin,

    "q178_value_trend" ->
      """WITH t0 AS (SELECT min(ts) AS tmin FROM events),
        |ev AS (
        | SELECT event_type,
        |  divide((epoch_us(ts) - epoch_us(tmin)), 86400000000) AS x,
        |  CAST(floor(value * 1000.0) AS BIGINT) AS y
        | FROM events, t0),
        |s AS (
        | SELECT event_type, count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * x) AS BIGINT) AS sxx,
        |  CAST(sum(x * y) AS BIGINT) AS sxy
        | FROM ev GROUP BY 1)
        |SELECT event_type, n,
        | CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        | CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        | CAST(divide((1000 * (n * sxy - sx * sy)), (n * sxx - sx * sx)) AS BIGINT)
        |  AS slope_milli_per_day
        |FROM s""".stripMargin)
}
