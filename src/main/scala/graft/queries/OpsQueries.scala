package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.operators.{Checks, Classifier, Corpus, Events, FuzzyJoin, Graph, Layout, Retrieval, Similarity, Sketches}
import graft.sources.Tables

/** Declared queries for the operations layer (SURVEY.md §2.3 extensions,
  * round 13): event sessionization / funnels, data-quality constraint
  * suites, snapshot diffing, canary scanning, link-graph centrality, BM25
  * retrieval. Every query's arithmetic is integer-exact (microsecond
  * timestamps, counts, micro-quantized scores), so each carries a full
  * DuckDB re-derivation as its oracle. */
object OpsQueries {

  private def t(s: SparkSession, dir: String, name: String): MetaFrame =
    Tables.loadMeta(s, dir, name)

  /** Session gap for the declared queries: 4 hours. The events table's
    * median per-user inter-event gap is ~7 h, so 4 h yields a discriminating
    * mix (~70% boundary events at sf0.01) instead of all-singletons. */
  private val GapSeconds = 14400L

  /** Day-1 cutoff (2024-01-02T00:00:00Z as epoch seconds) for the funnel
    * query: the full 30-day table completes any 3-step funnel for every
    * user, so the declared query restricts to the first day, where depths
    * 0..3 all occur. The `cast(ts as timestamp).cast(long)` form is
    * deliberate: it is identical for TIMESTAMP and TIMESTAMP_NTZ inputs
    * under the session-UTC convention. */
  private val FunnelCutoffEpochS = 1704153600L

  /** The deterministic "crawl N+1" snapshot shared by the diff and SCD2
    * queries: ÷17 docs removed, ÷13 text-mutated, ÷23 re-added under a
    * shifted id (DuckDB twin: [[NewtSql]]). */
  private def mutatedSnapshot(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val mutated = docs.filter(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
    val added = docs.filter(col("doc_id") % 23 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
    mutated.unionByName(added)
  }

  /** DuckDB twin of [[mutatedSnapshot]] as a `newt` CTE body. */
  private val NewtSql: String =
    "newt AS (" +
    "SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text, " +
    "lang, source FROM documents WHERE doc_id % 17 <> 0 " +
    "UNION ALL SELECT doc_id + 100000, text, lang, source FROM documents " +
    "WHERE doc_id % 23 = 0)"

  /** Shared copurchase CTE chain through the enriched pair table `p`. */
  private val CopurchaseCtes: String =
    "WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem " +
    "WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL), " +
    "sz AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 5), " +
    "kept AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)), " +
    "nb AS (SELECT count(DISTINCT b) AS n_baskets FROM kept), " +
    "ic AS (SELECT i, count(*) AS ci FROM kept GROUP BY i), " +
    "pc AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS pair_baskets " +
    "FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i " +
    "GROUP BY 1, 2 HAVING count(*) >= 2), " +
    "p AS (SELECT item_a, item_b, pair_baskets, " +
    "ia.ci AS item_a_baskets, ib.ci AS item_b_baskets, nb.n_baskets, " +
    "CAST(round((pair_baskets * nb.n_baskets * 1000000.0) / (ia.ci * ib.ci)) " +
    "AS BIGINT) AS lift_micro, " +
    "CAST(round((pair_baskets * 1000000.0) / (ia.ci + ib.ci - pair_baskets)) " +
    "AS BIGINT) AS jaccard_micro " +
    "FROM pc JOIN ic ia ON pc.item_a = ia.i JOIN ic ib ON pc.item_b = ib.i " +
    "CROSS JOIN nb)"

  /** Shared copurchase oracle (direct AND incremental-serve contract). */
  private val CopurchaseSql: String =
    CopurchaseCtes + " SELECT * FROM p ORDER BY item_a, item_b"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sessionize" -> ((s, d) =>
      Events.sessionize(t(s, d, "events").df, "user_id", "ts", "event_id",
          gapSeconds = GapSeconds)
        .orderBy("event_id")),

    "events_session_stats" -> ((s, d) =>
      Events.sessionStats(t(s, d, "events").df, "user_id", "ts", "event_id",
          "event_type", gapSeconds = GapSeconds)
        .orderBy("user_id", "session_idx")),

    "events_funnel" -> ((s, d) =>
      Events.funnel(
          t(s, d, "events").df
            .filter(col("ts").cast("timestamp").cast("long") < FunnelCutoffEpochS),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy("user_id")),

    // conversion latency per funnel depth over the same day-1 funnel
    "events_funnel_latency" -> ((s, d) =>
      Events.funnelLatency(
          Events.funnel(
            t(s, d, "events").df
              .filter(col("ts").cast("timestamp").cast("long") < FunnelCutoffEpochS),
            "user_id", "ts", "event_type", Seq("view", "click", "purchase")))
        .orderBy("steps_completed")),

    "events_retention" -> ((s, d) =>
      Events.retentionCohorts(t(s, d, "events").df, "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),

    // top first-4-event journey paths across all users; at 6 event types
    // the aggregated path table is ≤ 1296 keys, top-20 discriminates
    "events_top_paths" -> ((s, d) =>
      Events.topPaths(t(s, d, "events").df, "user_id", "ts", "event_id",
        "event_type", depth = 4, k = 20)),

    // per-VISIT paths: first 3 event types of each 4h-gap session
    "events_session_paths" -> ((s, d) =>
      Events.topPathsBySession(t(s, d, "events").df, "user_id", "ts",
        "event_id", "event_type", gapSeconds = GapSeconds, depth = 3, k = 15)),

    // Markov transition matrix with per-source micro probabilities
    "events_transitions" -> ((s, d) =>
      Events.transitions(t(s, d, "events").df, "user_id", "ts", "event_id",
          "event_type")
        .orderBy("src_type", "dst_type")),

    // journey-scoped first/last-touch attribution: purchases credited to
    // view/click touches; direct conversions keep NULL attributions
    "events_attribution" -> ((s, d) =>
      Events.attribution(t(s, d, "events").df, "user_id", "ts", "event_id",
          "event_type", "purchase", Seq("view", "click"))
        .orderBy("conversion_id")),

    // incremental attribution: batch conversions credited against the
    // O(users) store of the first half — the equivalence contract makes
    // the oracle the PLAIN full-history attribution restricted to batch
    // conversions (history is never read by the engine side)
    "events_attribution_incremental" -> ((s, d) => {
      val ev = t(s, d, "events").df
      val hist = ev.filter(col("ts").cast("timestamp").cast("long") < 1705363200L)
      val batch = ev.filter(col("ts").cast("timestamp").cast("long") >= 1705363200L)
      val store = Events.attributionStore(hist, "user_id", "ts", "event_id",
        "event_type", "purchase", Seq("view", "click"))
      Events.attributionIncremental(batch, store, "user_id", "ts", "event_id",
          "event_type", "purchase", Seq("view", "click"))
        .orderBy("conversion_id")
    }),

    // volume drift monitor at 2σ — the uniform synthetic rates put ~5% of
    // (type, day) cells over the line, so both verdicts occur
    "events_anomaly_daily" -> ((s, d) =>
      Events.dailyAnomalies(t(s, d, "events").df, "ts", "event_type",
          window = 7, minPrior = 3, thresholdMicro = 2000000L)
        .orderBy("event_type", "day")),

    // dense daily resample: per-user daily event counts with explicit
    // zero rows for silent days inside each user's own observed range —
    // oracle re-derives the grid with generate_series
    "events_resample_daily" -> ((s, d) =>
      Events.resampleDaily(t(s, d, "events").df, "user_id", "ts")
        .orderBy("key", "day")),

    // seasonal anomaly twin: weekday-matched trailing baseline (a Sunday
    // compares to Sundays) — the events table spans 30 days, so each
    // (type, weekday) series holds 4-5 points and the window genuinely
    // engages; dow from engine-neutral date-diff arithmetic
    "events_anomaly_seasonal" -> ((s, d) =>
      Events.dailyAnomaliesSeasonal(t(s, d, "events").df, "ts", "event_type",
          window = 3, minPrior = 2, thresholdMicro = 2000000L)
        .orderBy("event_type", "day")),

    // incremental sessionization: sessions for the post-01-16 batch are
    // assigned against the O(users) store of the first half — the
    // equivalence contract makes the oracle the PLAIN full-history window
    // restricted to batch rows (history is never read by the engine side)
    "events_sessionize_incremental" -> ((s, d) => {
      val ev = t(s, d, "events").df
      val hist = ev.filter(col("ts").cast("timestamp").cast("long") < 1705363200L)
      val batch = ev.filter(col("ts").cast("timestamp").cast("long") >= 1705363200L)
      val store = Events.sessionStore(hist, "user_id", "ts", "event_id", GapSeconds)
      Events.sessionizeIncremental(batch, store, "user_id", "ts", "event_id", GapSeconds)
        .orderBy("event_id")
    }),

    // Deequ-style suite over lineitem: a deliberate pass/fail mix — the
    // synthetic (l_orderkey, l_linenumber) key is NOT unique and ~10% of
    // quantities sit above 45, so the failing verdicts carry real counts
    "dq_constraints" -> ((s, d) =>
      Checks.check(t(s, d, "lineitem").df, Seq(
          Checks.NotNull("l_orderkey"),
          Checks.InRange("l_quantity", 1, 45),
          Checks.InSet("l_returnflag", Seq("A", "N", "R")),
          Checks.MatchesRegex("l_linestatus", "^[FO]$"),
          Checks.Unique(Seq("l_orderkey", "l_linenumber")),
          Checks.RowCountBetween(1000L, 100000000L)))
        .orderBy("check_name")),

    // PSI drift: reference prices vs the same prices inflated 30% (the
    // canary-plant pattern — the synthetic columns are measured
    // independent, so a filter can't shift anything; a multiplicative
    // shift drives values up ~3 deciles and PSI lands in the
    // "act" band, while the same-distribution buckets stay near 0)
    "dq_drift_psi" -> ((s, d) => {
      val li = t(s, d, "lineitem").df
      val shifted = li.select((col("l_extendedprice") * lit(1.3))
        .as("l_extendedprice"))
      Checks.driftPsi(li, shifted, "l_extendedprice", buckets = 10)
        .orderBy("bucket")
    }),

    // embedding centroid drift: even labels' vectors planted NEGATED in
    // the current frame — cos exactly −1 (drift 2e6) there, exactly +1
    // (drift 0) on the untouched odd labels
    "dq_drift_embedding" -> ((s, d) => {
      val emb = t(s, d, "embeddings").df
      val cur = emb.select(col("label"),
        when(col("label") % 2 === 0,
          transform(col("embedding"), v => -v))
          .otherwise(col("embedding")).as("embedding"))
      Similarity.centroidDrift(emb, cur, "label", "embedding", dim = 64)
        .orderBy("label")
    }),

    // categorical PSI: 20% of docs re-sourced to an UNSEEN 'crawl_v2'
    // (the new-crawl-source alarm) — drift lands in __other__, every
    // surviving category thins proportionally
    "dq_drift_psi_cat" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val cur = docs.select(when(col("doc_id") % 5 === 0, lit("crawl_v2"))
        .otherwise(col("source")).as("source"))
      Checks.driftPsiCategorical(docs, cur, "source", maxCategories = 5)
        .orderBy("category")
    }),

    // MAD outlier filter at k=1.5 over the near-uniform price column —
    // uniform tails sit just past 1.5·MAD, so both verdicts occur
    "dq_outliers_mad" -> ((s, d) =>
      Checks.outliersMad(t(s, d, "lineitem").df
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice")),
          "l_returnflag", "l_extendedprice", k = 1.5)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("med"), col("mad"), col("is_outlier"))
        // the synthetic (orderkey, linenumber) key is NOT unique; the four
        // base columns make the order total (everything else is a
        // function of l_returnflag)
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")),

    // join-key skew report over the 5-language documents table: every
    // lang absorbs ~20% of rows, so salting advice engages (factor ~6 at
    // 32 target partitions)
    "dq_skew_report" -> ((s, d) =>
      Checks.skewReport(t(s, d, "documents").df, "lang", k = 5,
          targetPartitions = 32)
        .orderBy("rank")),

    // constraint suggestion over lineitem: the full profile-driven rule
    // set (not_null everywhere, in_range for the 8 numeric columns,
    // in_set for the two low-cardinality strings, no unique column)
    "dq_suggest" -> ((s, d) =>
      Checks.suggest(t(s, d, "lineitem").df).orderBy("col_name", "kind")),

    // snapshot diff: "crawl N+1" derived from documents by deterministic
    // mod rules (÷17 removed, ÷13 text-mutated, ÷23 re-added under a
    // shifted id) so every verdict class occurs and DuckDB rebuilds the
    // same second snapshot exactly
    "corpus_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      Corpus.snapshotDiff(docs, mutatedSnapshot(docs), "doc_id",
          Seq("text", "lang", "source"))
        .orderBy("id")
    }),

    // SCD2 dimension history: init from documents at version 1, apply the
    // SAME mutated snapshot at version 2 — unchanged rows stay open,
    // changed/removed close, changed/added reopen
    "corpus_scd2" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val dim1 = Corpus.scd2Init(docs, "doc_id", Seq("text", "lang", "source"), 1L)
      Corpus.scd2Apply(dim1, mutatedSnapshot(docs), "doc_id",
          Seq("text", "lang", "source"), 2L)
        .orderBy("id", "valid_from")
    }),

    // time-travel read: the v1 snapshot reconstructed from the two-version
    // SCD2 history must be EXACTLY the original table (and the oracle IS
    // the original table plus the version columns) — the read-contract pin
    // for the half-open validity boundary
    "corpus_scd2_asof" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val dim1 = Corpus.scd2Init(docs, "doc_id", Seq("text", "lang", "source"), 1L)
      val dim2 = Corpus.scd2Apply(dim1, mutatedSnapshot(docs), "doc_id",
        Seq("text", "lang", "source"), 2L)
      Corpus.scd2AsOf(dim2, 1L)
        .select(col("id"), col("text"), col("lang"), col("source"))
        .orderBy("id")
    }),

    // canary scan over planted sentinels: ÷31 docs get CANARY-A1 (twice
    // for ÷62), ÷37 docs get SECRET-B2 — the oracle re-plants and re-counts
    "text_canary_scan" -> ((s, d) => {
      val docs = t(s, d, "documents").df
        .withColumn("text",
          when(col("doc_id") % 62 === 0, concat(col("text"), lit(" CANARY-A1 CANARY-A1")))
            .when(col("doc_id") % 31 === 0, concat(col("text"), lit(" CANARY-A1")))
            .otherwise(col("text")))
        .withColumn("text",
          when(col("doc_id") % 37 === 0, concat(col("text"), lit(" SECRET-B2")))
            .otherwise(col("text")))
      Corpus.canaryScan(docs, "doc_id", "text", Seq("CANARY-A1", "SECRET-B2"))
        .orderBy("id", "canary")
    }),

    // mergeable HLL distinct-count store, as a measured property query
    // (hash-family convention): the oracle asserts the VERDICT columns —
    // batch-union ≡ direct-sketch estimate equality, batch row-count
    // conservation, and the estimate within 2% of the exact distinct
    // count DuckDB recomputes
    "agg_hll_mergeable" -> ((s, d) => {
      val ev = t(s, d, "events").df
      val whole = Sketches.hllByGroup(ev, "event_type", "user_id")
      val halves = Sketches.hllByGroup(ev.filter(col("event_id") % 2 === 0),
          "event_type", "user_id")
        .unionByName(Sketches.hllByGroup(ev.filter(col("event_id") % 2 =!= 0),
          "event_type", "user_id"))
      val merged = Sketches.hllUnionEstimate(halves)
        .select(col("group").as("event_type"), col("distinct_est"),
          col("n_rows").as("n_batch_rows"))
      val direct = whole.select(col("group").as("event_type"),
        hll_sketch_estimate(col("sketch")).as("direct_est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"),
          count(lit(1)).as("n_events"))
      exact.join(merged, Seq("event_type")).join(direct, Seq("event_type"))
        .select(col("event_type"), col("exact_distinct"), col("n_events"),
          (col("n_batch_rows") === col("n_events")).as("rows_consistent"),
          (col("distinct_est") === col("direct_est")).as("merge_consistent"),
          (abs(col("distinct_est") - col("exact_distinct")) <=
            greatest(lit(1L), (col("exact_distinct") * 2 / 100).cast("long")))
            .as("est_ok"))
        .orderBy("event_type")
    }),

    // PMI collocations over the documents corpus: top-50 adjacent pairs
    // at a min-count floor of 5
    "text_pmi_bigrams" -> ((s, d) =>
      Corpus.pmiCollocations(t(s, d, "documents").df, "text",
        minCount = 5L, k = 50)),

    // weighted sampling without replacement (A-ES): char-count weights, so
    // long docs are proportionally likelier — reproducible top-50
    "corpus_weighted_sample" -> ((s, d) =>
      Corpus.weightedSample(t(s, d, "documents").df, "doc_id", "n_chars",
        k = 50, salt = "wsamp")),

    // per-language weighted quotas: top-10 per lang under the same key
    "corpus_weighted_sample_by" -> ((s, d) =>
      Corpus.weightedSampleBy(t(s, d, "documents").df, "lang", "doc_id",
          "n_chars", kPerGroup = 10, salt = "wsamp")
        .orderBy("lang", "rank")),

    // KLL quantile sketch store property query: 4 per-batch sketch tables
    // union to per-group estimates whose EXACT ranks (computed against the
    // raw data) must sit within 5pp of the requested ranks — generous vs
    // the published ~1.65% bound at k=200, so the randomized compaction
    // can't flake the gate; a direct whole-input sketch passes the same
    // check (merge consistency in rank error, never bytes — KLL flips
    // random coins, unlike HLL)
    "agg_kll_mergeable" -> ((s, d) => {
      val li = t(s, d, "lineitem").df
      val ranks = Seq(0.25, 0.5, 0.75, 0.95)
      val store = (0 until 4)
        .map(i => Sketches.kllByGroup(li.filter(col("l_orderkey") % 4 === i),
          "l_returnflag", "l_extendedprice"))
        .reduce(_ unionByName _)
      val merged = Sketches.kllUnionQuantiles(store, ranks)
      val direct = Sketches.kllUnionQuantiles(
        Sketches.kllByGroup(li, "l_returnflag", "l_extendedprice"), ranks)
        .select(col("group"), col("q25").as("d25"), col("q50").as("d50"),
          col("q75").as("d75"), col("q95").as("d95"))
      val est = merged.join(direct, Seq("group"))
      val v = li.select(col("l_returnflag").as("group"),
          col("l_extendedprice").cast("double").as("v"))
        .join(broadcast(est), Seq("group"))
      def rankOf(q: String) =
        sum(when(col("v") <= col(q), 1L).otherwise(0L)).cast("double") / count(lit(1))
      def ok(q: String, r: Double) = (abs(rankOf(q) - lit(r)) <= 0.05)
      v.groupBy("group")
        .agg(count(lit(1)).as("n_rows"),
          ok("q25", 0.25).as("ok_q25"), ok("q50", 0.5).as("ok_q50"),
          ok("q75", 0.75).as("ok_q75"), ok("q95", 0.95).as("ok_q95"),
          (ok("d25", 0.25) && ok("d50", 0.5) && ok("d75", 0.75) &&
            ok("d95", 0.95)).as("ok_direct"))
        .select(col("group").as("l_returnflag"), col("n_rows"),
          col("ok_q25"), col("ok_q50"), col("ok_q75"), col("ok_q95"),
          col("ok_direct"))
        .orderBy("l_returnflag")
    }),

    // frequent-items sketch store property query: a 5-item hot set (~5%
    // of each group's rows each) rides over a thousands-wide partkey tail;
    // maxMapSize 32 << tail cardinality forces real purging, and the
    // verdicts assert the sketch GUARANTEES — every exact-2% heavy hitter
    // present in the NO_FALSE_NEGATIVES table with its true count inside
    // [lb, ub] — never the order-dependent estimates themselves
    "agg_freq_mergeable" -> ((s, d) => {
      val li = t(s, d, "lineitem").df
      val item = when(col("l_orderkey") % 4 === 0, col("l_suppkey") % 5)
        .otherwise(col("l_partkey") + 1000000L)
      val items = li.select(col("l_returnflag").as("group"), item.as("item"),
        col("l_orderkey"))
      val store = (0 until 2)
        .map(i => Sketches.freqByGroup(items.filter(col("l_orderkey") % 2 === i),
          "group", "item", maxMapSize = 32))
        .reduce(_ unionByName _)
      val sk = Sketches.freqUnionItems(store, maxMapSize = 32)
        .select(col("group"), col("item"), col("est"), col("lb"), col("ub"))
      val exact = items.groupBy("group", "item").agg(count(lit(1)).as("cnt"))
        .withColumn("n", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("group"))))
      val heavy = exact.filter(col("cnt") * 50 >= col("n"))
      heavy.join(sk, Seq("group", "item"), "left")
        .groupBy("group")
        .agg(max(col("n")).as("n_rows"), count(lit(1)).as("n_heavy"),
          (sum(when(col("est").isNull, 1L).otherwise(0L)) === 0L)
            .as("all_heavy_found"),
          (sum(when(col("est").isNotNull &&
              (col("cnt") < col("lb") || col("cnt") > col("ub")), 1L)
            .otherwise(0L)) === 0L).as("bounds_ok"))
        .select(col("group").as("l_returnflag"), col("n_rows"),
          col("n_heavy"), col("all_heavy_found"), col("bounds_ok"))
        .orderBy("l_returnflag")
    }),

    // STRING-domain frequent-items store property query (the freqStrByGroup
    // twin): per language, a 3-item hot set (~1/6 of rows each — above the
    // ~3.5·n/maxMapSize no-false-negatives error bound at ANY scale) rides
    // over a ~n/2-unique string tail; maxMapSize 32 << tail cardinality
    // forces real purging through the ItemsSketch[String] serde round-trip
    "agg_freq_mergeable_str" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val item = when(col("doc_id") % 2 === 0,
          concat(lit("hot-"), (col("doc_id") % 3).cast("string")))
        .otherwise(concat(lit("tail-"), col("doc_id").cast("string")))
      val items = docs.select(col("lang").as("group"), item.as("item"),
        col("doc_id"))
      val store = (0 until 2)
        .map(i => Sketches.freqStrByGroup(items.filter(col("doc_id") % 4 < 2 * (i + 1)
            && col("doc_id") % 4 >= 2 * i),
          "group", "item", maxMapSize = 32))
        .reduce(_ unionByName _)
      val sk = Sketches.freqStrUnionItems(store, maxMapSize = 32)
        .select(col("group"), col("item"), col("est"), col("lb"), col("ub"))
      val exact = items.groupBy("group", "item").agg(count(lit(1)).as("cnt"))
        .withColumn("n", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("group"))))
      val heavy = exact.filter(col("cnt") * 50 >= col("n"))
      heavy.join(sk, Seq("group", "item"), "left")
        .groupBy("group")
        .agg(max(col("n")).as("n_rows"), count(lit(1)).as("n_heavy"),
          (sum(when(col("est").isNull, 1L).otherwise(0L)) === 0L)
            .as("all_heavy_found"),
          (sum(when(col("est").isNotNull &&
              (col("cnt") < col("lb") || col("cnt") > col("ub")), 1L)
            .otherwise(0L)) === 0L).as("bounds_ok"))
        .select(col("group").as("lang"), col("n_rows"),
          col("n_heavy"), col("all_heavy_found"), col("bounds_ok"))
        .orderBy("lang")
    }),

    // THETA segment algebra: per day-bucket cohort, the "users who VIEWED
    // vs users who PURCHASED" overlap report, with the view side built as
    // a 2-batch sketch STORE re-merged through the union member (serde
    // round-trip + merge exercised). All groups stay far below 2^12
    // distinct users, so every theta estimate is in EXACT mode and the
    // oracle asserts the full set algebra as exact integers
    "agg_theta_segments" -> ((s, d) => {
      val ev = t(s, d, "events").df
        .select((dayofmonth(col("ts")) % 3).cast("long").as("g"),
          col("user_id"), col("event_type"))
      val a = ev.filter(col("event_type") === "view")
        .select(col("g").as("group"), col("user_id"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("g").as("group"), col("user_id"))
      val aStore = Seq(0, 1)
        .map(i => Sketches.thetaByGroup(a.filter(col("user_id") % 2 === i),
          "group", "user_id"))
        .reduce(_ unionByName _)
      val aMerged = Sketches.thetaUnionSketches(aStore)
      val bSk = Sketches.thetaByGroup(b, "group", "user_id")
      Sketches.thetaOverlap(
          aMerged.select(col("group"), col("sketch")),
          bSk.select(col("group"), col("sketch")))
        .select(col("group").as("grp"),
          round(col("a_est")).cast("long").as("a_users"),
          round(col("b_est")).cast("long").as("b_users"),
          round(col("union_est")).cast("long").as("union_users"),
          round(col("intersect_est")).cast("long").as("intersect_users"),
          round(col("a_not_b_est")).cast("long").as("a_not_b_users"),
          round(col("b_not_a_est")).cast("long").as("b_not_a_users"),
          col("jaccard_micro"))
        .orderBy("grp")
    }),

    // PassJoin edit-distance self-join (entity resolution) over each
    // document's first token: candidate recall is STRUCTURALLY exact
    // (pigeonhole over d+1 segments), confirmation is the codegen'd
    // levenshtein — so the oracle is DuckDB's own levenshtein over the
    // quadratic all-pairs scan, exact equality expected
    "join_fuzzy_edit" -> ((s, d) => {
      val words = t(s, d, "documents").df
        .select(col("doc_id"), split_part(col("text"), lit(" "), lit(1)).as("w"))
      FuzzyJoin.editDistancePairs(words, "doc_id", "w", maxDist = 2)
        .orderBy("id_a", "id_b")
    }),

    // two-table record linkage: even-id docs against odd-id docs at d=1 —
    // pins the editDistanceJoin variant (no id_a < id_b dedup, ids from
    // distinct tables) against the same quadratic oracle
    "join_fuzzy_edit_2way" -> ((s, d) => {
      val words = t(s, d, "documents").df
        .select(col("doc_id"), split_part(col("text"), lit(" "), lit(1)).as("w"))
      FuzzyJoin.editDistanceJoin(
          words.filter(col("doc_id") % 2 === 0), "doc_id", "w",
          words.filter(col("doc_id") % 2 === 1), "doc_id", "w", maxDist = 1)
        .orderBy("id_a", "id_b")
    }),

    // one-call entity resolution over the fuzzy pair graph: components
    // via checkpointed pointer jumping, min-id canonical election (no
    // score column → deterministic id-asc tiebreak); the oracle re-derives
    // pairs (quadratic levenshtein), components (recursive CTE), and the
    // election — every row of the corpus appears exactly once
    "join_fuzzy_entity_resolve" -> ((s, d) => {
      val words = t(s, d, "documents").df
        .select(col("doc_id"), split_part(col("text"), lit(" "), lit(1)).as("w"))
      FuzzyJoin.entityResolve(words, "doc_id", "w", maxDist = 2)
        .orderBy("doc_id")
    }),

    // item co-occurrence over order baskets: parts bought together, with
    // the whole-basket size cap exercised (TPC-H orders reach 13 distinct
    // parts; cap 5 drops real baskets) — counts exact, lift/Jaccard
    // micro-quantized with one fixed parenthesization (the PMI convention)
    "graph_copurchase" -> ((s, d) =>
      Graph.coOccurrence(t(s, d, "lineitem").df, "l_orderkey", "l_partkey",
          minPairCount = 2, maxBasketSize = 5)
        .orderBy("item_a", "item_b")),

    // per-node triangles + clustering over the co-purchase graph
    // (minPairCount=1 keeps the graph dense enough to be interesting:
    // ~51k edges, ~60k triangles at sf0.01); compact-forward degree
    // orientation, exact counts, micro-quantized clustering
    "graph_triangles" -> ((s, d) => {
      val pairs = Graph.coOccurrence(t(s, d, "lineitem").df,
          "l_orderkey", "l_partkey", minPairCount = 1, maxBasketSize = 5)
        .select(col("item_a"), col("item_b"))
      // coOccurrence output is already normalized (unique, a<b, non-null)
      Graph.triangles(pairs, "item_a", "item_b", inputNormalized = true)
        .orderBy("id")
    }),

    // 2-core by iterative peeling over the same co-occurrence graph, a
    // FIXED 4-round dial: the engine may fixpoint-exit early (no-op
    // rounds), the oracle unrolls exactly 4 — equal either way
    "graph_kcore" -> ((s, d) => {
      val pairs = Graph.coOccurrence(t(s, d, "lineitem").df,
          "l_orderkey", "l_partkey", minPairCount = 1, maxBasketSize = 5)
        .select(col("item_a"), col("item_b"))
      Graph.kCore(pairs, "item_a", "item_b", k = 2, maxRounds = 4,
        inputNormalized = true).orderBy("id")
    }),

    // incremental co-occurrence: two basket-disjoint batch stores merged
    // and served — the equivalence contract (== the one-shot operator on
    // the union) IS the oracle, which re-derives the direct form; the
    // minPairCount floor applies over MERGED counts only
    "graph_copurchase_incremental" -> ((s, d) => {
      val li = t(s, d, "lineitem").df
      val store = Graph.coOccurrenceStore(
          li.filter(col("l_orderkey") % 2 === 0), "l_orderkey", "l_partkey",
          maxBasketSize = 5)
        .unionByName(Graph.coOccurrenceStore(
          li.filter(col("l_orderkey") % 2 === 1), "l_orderkey", "l_partkey",
          maxBasketSize = 5))
      Graph.coOccurrenceFromStore(store, minPairCount = 2)
        .orderBy("item_a", "item_b")
    }),

    // referential integrity: lineitem→part fk check with planted orphans
    // (÷1000 orders point past the part table) and planted NULL fks
    // (÷997) — orphan keys named with exact child-row counts + totals
    "dq_ref_integrity" -> ((s, d) => {
      val child = t(s, d, "lineitem").df.select(
        when(col("l_orderkey") % 997 === 0, lit(null).cast("long"))
          .when(col("l_orderkey") % 1000 === 0, col("l_partkey") + 900000L)
          .otherwise(col("l_partkey")).as("fk"))
      Checks.referentialIntegrity(child, "fk", t(s, d, "part").df,
          "p_partkey", sampleK = 10)
        .orderBy(col("key").asc_nulls_last)
    }),

    // calibration report (ECE): deterministic synthetic scores/labels so
    // the bin algebra is fully oracle-checkable (the classifier's own
    // scores are pinned elsewhere; this pins the CALIBRATION operator)
    "dq_calibration" -> ((s, d) => {
      val scored = t(s, d, "documents").df.select(col("doc_id"),
        (col("doc_id") * 2003 % 1000000).as("score_micro"),
        (col("doc_id") % 3 === 0).cast("long").as("label"))
      Classifier.calibrationReport(scored, "label", "score_micro", bins = 10)
        .orderBy("bin")
    }),

    // join pre-flight: the every-event × purchase-event self-join on
    // user_id — exact output cardinality, matched keys, amplification,
    // and the top-10 contributing keys, all from the two key histograms
    "dq_join_preflight" -> ((s, d) => {
      val ev = t(s, d, "events").df
      Checks.joinPreflight(ev, "user_id",
          ev.filter(col("event_type") === "purchase"), "user_id", topK = 10)
        .orderBy(desc("contribution"), col("key"))
    }),

    // functional-dependency check: a holding FD (orderkey→custkey, the pk
    // law), a broken one (custkey→priority), and a broken categorical one
    // (priority→status) — exact group/violation counts and the g3 repair
    // cost per candidate, micro-quantized confidence
    "dq_fd_check" -> ((s, d) =>
      Checks.fdCheck(t(s, d, "orders").df, Seq(
          ("o_orderkey", "o_custkey"),
          ("o_custkey", "o_orderpriority"),
          ("o_orderpriority", "o_orderstatus")))
        .orderBy("lhs", "rhs")),

    // cross-family composition: sessionize → co-occurrence — which ACTIONS
    // co-occur within a session (the "viewed AND purchased together"
    // report); baskets are (user, session) composites, so the oracle
    // re-derives the session labeling AND the pair algebra
    "events_session_copurchase" -> ((s, d) => {
      val ev = t(s, d, "events").df
      val sess = Events.sessionize(ev, "user_id", "ts", "event_id",
        gapSeconds = GapSeconds)
      val baskets = sess
        .join(ev.select(col("event_id"), col("event_type")), Seq("event_id"))
        .select(concat(col("user_id").cast("string"), lit(":"),
          col("session_idx").cast("string")).as("basket"), col("event_type"))
      Graph.coOccurrence(baskets, "basket", "event_type",
          minPairCount = 2, maxBasketSize = 100)
        .orderBy("item_a", "item_b")
    }),

    // incremental leakage-safe split: odd docs are the new batch, even
    // docs the frozen corpus (plain id-hash splits); a batch component
    // with ANY fuzzy match into the corpus inherits the min matched
    // corpus doc's split, the rest hash on their component — oracle
    // re-derives pairs, components, inheritance, and both split wheels
    "corpus_leakage_split_incremental" -> ((s, d) => {
      val words = t(s, d, "documents").df
        .select(col("doc_id"), split_part(col("text"), lit(" "), lit(1)).as("w"))
      val odds = words.filter(col("doc_id") % 2 === 1)
      val evens = words.filter(col("doc_id") % 2 === 0)
      val corpusSplits = Corpus.hashSplit(evens, "doc_id", salt = "graft")
        .select(col("doc_id"), col("split"))
      val batchPairs = FuzzyJoin.editDistancePairs(odds, "doc_id", "w", maxDist = 2)
      val crossPairs = FuzzyJoin.editDistanceJoin(
        odds, "doc_id", "w", evens, "doc_id", "w", maxDist = 2)
      Corpus.leakageSafeSplitIncremental(
          odds, "doc_id", batchPairs, "id_a", "id_b",
          corpusSplits, "doc_id", "split", crossPairs, "id_a", "id_b",
          salt = "graft")
        .select("doc_id", "component", "inherited_from", "bucket", "split")
        .orderBy("doc_id")
    }),

    // related-items index: top-5 neighbors per item from the copurchase
    // pair table, both directions, (lift desc, count desc, id asc) —
    // the index-once/serve-many shape; per-item rank is WindowGroupLimit
    "graph_related_items" -> ((s, d) => {
      val pairs = Graph.coOccurrence(t(s, d, "lineitem").df,
        "l_orderkey", "l_partkey", minPairCount = 2, maxBasketSize = 5)
      Graph.relatedItemsIndex(pairs, k = 5).orderBy("item", "rank")
    }),

    // leakage-safe split: the hash split keyed on the near-dup COMPONENT
    // (here the exact fuzzy-edit pair graph) so near-duplicates can never
    // straddle a train/eval boundary; oracle re-derives pairs, components,
    // and the same md5-prefix bucket arithmetic as split_hash
    "corpus_leakage_split" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val words = docs.select(col("doc_id"),
        split_part(col("text"), lit(" "), lit(1)).as("w"))
      val pairs = FuzzyJoin.editDistancePairs(words, "doc_id", "w", maxDist = 2)
      Corpus.leakageSafeSplit(docs.select("doc_id"), "doc_id",
          pairs, "id_a", "id_b", salt = "graft")
        .select("doc_id", "component", "bucket", "split")
        .orderBy("doc_id")
    }),

    // Z-order layout: the Morton z-value over (l_partkey, l_suppkey) —
    // integer-exact value-range buckets interleaved bit by bit, so the
    // oracle re-derives the identical longs with DuckDB's own `//` and
    // bit operators. The cluster() placement itself (range partition +
    // in-partition sort) is pinned in LayoutSpec via measured per-file
    // span tightening — partition assignment isn't oracle territory
    "layout_zorder" -> ((s, d) =>
      Layout.withZValue(
          t(s, d, "lineitem").df.select(col("l_orderkey"),
            col("l_linenumber").cast("long").as("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          Seq("l_partkey", "l_suppkey"), bitsPerCol = 8)
        .select("l_orderkey", "l_linenumber", "zval")
        .orderBy("l_orderkey", "l_linenumber")),

    // integer PageRank over the customer↔supplier interaction graph
    // (both directions of every orders⋈lineitem pair, suppliers offset
    // into their own id space) — 3 iterations, exactly the unrolled-CTE
    // oracle recurrence
    "graph_pagerank" -> ((s, d) => {
      val ol = t(s, d, "orders").df
        .join(t(s, d, "lineitem").df, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      val edges = ol.select(col("c").as("src"), col("p").as("dst"))
        .union(ol.select(col("p").as("src"), col("c").as("dst")))
      Graph.pageRankInt(edges, "src", "dst", iterations = 3).orderBy("id")
    }),

    // fastText-style quality classifier: 4 full-batch integer-quantized
    // logistic steps over md5-hashed bag-of-words, then every doc scored
    // under the final model — training INCLUDED in the oracle (unrolled
    // CTEs, the BPE-trainer convention). The synthetic corpus shares one
    // vocabulary across all langs/sources (measured: no natural label is
    // set-of-words-separable), so the query PLANTS the reference-class
    // marker token in the positive class (the canary-plant pattern) —
    // the trained model provably separates it (98.8% at sf0.01)
    "text_quality_classifier" -> ((s, d) => {
      val planted = t(s, d, "documents").df.select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
            concat(coalesce(col("text"), lit("")), lit(" q_ref_marker")))
          .otherwise(coalesce(col("text"), lit(""))).as("text"),
        (col("doc_id") % 3 === 0).cast("long").as("label"))
      val model = Classifier.trainLogistic(planted, "doc_id", "text", "label",
        dim = 256, iters = 4)
      Classifier.scoreLogistic(planted, "doc_id", "text", model, dim = 256)
        .join(planted.select(col("doc_id").as("id"), col("label")), Seq("id"))
        .select(col("id").as("doc_id"), col("label"), col("margin_micro"),
          col("score_micro"), col("pred"))
        .orderBy("doc_id")
    }),

    // BM25 retrieval: every ÷100≡3 document's first 5 tokens as a query
    // over the full documents corpus — each query's own source doc ranks
    // (the retrieval sanity property), near-dup plants rank beside it
    "search_bm25" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val qs = docs.filter(col("doc_id") % 100 === 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), "\\s+"), 1, 5), " ").as("qtext"))
      Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 5)
        .orderBy("query_id", "rank")
    }),

    // incremental index refresh: two DOC-DISJOINT batch indexes (even/odd
    // halves) merged — postings compose by union, df/idf/avgdl recompute
    // from the merged stats — then served through the indexed scorer; the
    // oracle is the one-shot search_bm25 SQL VERBATIM (same k, same query
    // set), which is the whole claim: merge-then-serve ranks bit-equal to
    // build-once-over-everything
    "search_bm25_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val qs = docs.filter(col("doc_id") % 100 === 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), "\\s+"), 1, 5), " ").as("qtext"))
      val merged = Retrieval.bm25MergeIndexes(Seq(
        Retrieval.bm25IndexFrame(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text"),
        Retrieval.bm25IndexFrame(docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")))
      Retrieval.bm25TopKFromIndex(merged, qs, "qid", "qtext", k = 5)
        .orderBy("query_id", "rank")
    }),

    // Dirichlet query-likelihood (Zhai & Lafferty 2001) over the same
    // query set: the LM-retrieval counterpart of BM25 — matched-terms
    // decomposition + per-doc length norm, micro-nat integer scores;
    // DuckDB re-derives collection stats, both quantizations, and the rank
    "search_ql_dirichlet" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val qs = docs.filter(col("doc_id") % 100 === 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), "\\s+"), 1, 5), " ").as("qtext"))
      Retrieval.qlDirichletTopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 5)
        .orderBy("query_id", "rank")
    }),

    // pseudo-relevance feedback: top-3 feedback docs contribute their top-5
    // tf·idf terms to the query bag, round 2 scores the expanded set
    "search_bm25_expanded" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val qs = docs.filter(col("doc_id") % 100 === 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), "\\s+"), 1, 5), " ").as("qtext"))
      Retrieval.bm25ExpandedTopK(docs, "doc_id", "text", qs, "qid", "qtext",
          k = 10, fbDocs = 3, fbTerms = 5)
        .orderBy("query_id", "rank")
    }),

    // ranking evaluation: brute-cosine top-10 scored against same-label
    // qrels (label clusters = the ground truth the synthetic embeddings
    // encode) — recall@10 / nDCG@10 per query, micro-quantized
    "search_eval_ndcg" -> ((s, d) => {
      val emb = t(s, d, "embeddings").df
      val dq = emb.filter(col("vec_id") % 100 === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"),
          col("label").as("qlabel"))
      val ranked = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          dq.select("query_id", "query_vec"), "query_id", "query_vec", k = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      val qrels = dq.select("query_id", "qlabel")
        .join(emb.select(col("vec_id").as("doc_id"), col("label")),
          col("label") === col("qlabel") && col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"), lit(1L).as("rel"))
      Retrieval.evalRanking(ranked, qrels, k = 10).orderBy("query_id")
    }),

    // hybrid retrieval: the same ÷100≡3 query docs drive BOTH retrievers —
    // first 5 tokens against the BM25 postings, the doc's own embedding
    // (vec_id aligns with doc_id) against the dense corpus — and the two
    // top-10 lists fuse by reciprocal rank. Docs found by both channels
    // (n_lists = 2) outrank single-channel hits, the hybrid premise
    "search_hybrid_rrf" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val emb = t(s, d, "embeddings").df
      val qs = docs.filter(col("doc_id") % 100 === 3)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), "\\s+"), 1, 5), " ").as("qtext"))
      val dq = emb.filter(col("vec_id") % 100 === 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val sparse = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 10)
        .select("query_id", "rank", "doc_id")
      val dense = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
          dq, "query_id", "query_vec", k = 10)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
        .orderBy("query_id", "rank")
    }),

    // hybrid retrieval, INDEXED dense side (r16 — the 100 TB shape): the
    // same RRF fusion tail, but the dense channel is the IVF×PQ chain
    // (the coarse probe bounds WHICH rows are scanned, the PQ codes bound
    // WHAT the scan reads, the exact rerank runs over the 50 ADC nominees
    // alone) instead of the labeled brute-force demo. The query set is
    // FIXED (source-replica ids < 2000 at every sf), so the declared
    // workload measures corpus growth at constant queries — the serving
    // scenario whose audit row replaces the demo's quadratic growth story
    "search_hybrid_rrf_ann" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val emb = t(s, d, "embeddings").df
      val qs = docs.filter(col("doc_id") % 100 === 3 && col("doc_id") < 2000)
        .select(col("doc_id").as("qid"),
          array_join(slice(split(col("text"), "\\s+"), 1, 5), " ").as("qtext"))
      val dq = emb.filter(col("vec_id") % 100 === 3 && col("vec_id") < 2000)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val centroids = emb.filter(col("vec_id") % 64 === 0 && col("vec_id") < 3200)
        .select((col("vec_id") / 64).cast("int").as("cell_id"),
          col("embedding").as("centroid_vec"))
      val cb = Similarity.trainPqCodebooks(emb, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 8, iters = 2)
      val sparse = Retrieval.bm25TopK(docs, "doc_id", "text", qs, "qid", "qtext", k = 10)
        .select("query_id", "rank", "doc_id")
      val dense = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
          centroids, "cell_id", "centroid_vec", cb, dim = 64, m = 8, ksub = 8,
          dq, "query_id", "query_vec", k = 10, nprobe = 2, shortlist = 50)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      Retrieval.rrfFuse(Seq(sparse, dense), k = 10)
        .orderBy("query_id", "rank")
    }),

    // ---- round-15 second wave ----

    // KS two-sample drift: even-key prices inflated 10% (a PARTIAL shift —
    // half the mass moves, so D lands strictly inside (0, 1) and both the
    // max-gap search and the smallest-attaining-value tiebreak do real
    // work); ONE summary row, exact integer gap numerator
    "dq_drift_ks" -> ((s, d) => {
      val li = t(s, d, "lineitem").df
      val cur = li.select((col("l_extendedprice") *
          when(col("l_orderkey") % 2 === 0, lit(1.1)).otherwise(lit(1.0)))
        .as("l_extendedprice"))
      Checks.driftKs(li, cur, "l_extendedprice", buckets = 10)
    }),

    // per-label embedding outliers at the p90 distance fence — planted
    // positives are unnecessary (a 10% tail exists by construction), the
    // oracle re-derives centroids, distances, and the per-label threshold
    "dq_embedding_outliers" -> ((s, d) =>
      Similarity.embeddingOutliers(t(s, d, "embeddings").df,
          "vec_id", "label", "embedding", dim = 64, quantile = 0.9)
        .orderBy("id")),

    // RFM over purchase events: recency anchored to the log's own max
    // timestamp, monetary through DECIMAL(18,6), quintile scores against
    // the population's own quantile edges (reverse-scored recency)
    "events_rfm" -> ((s, d) =>
      Events.rfm(t(s, d, "events").df.filter(col("event_type") === "purchase"),
          "user_id", "ts", "value", buckets = 5)
        .orderBy("user_id")),

    // two-proportion z-test: users hash to control/treat_a/treat_b by
    // id mod 3, conversion = any purchase event; 'control' is the
    // lexicographic minimum, so the control election is deterministic
    "events_ab_test" -> ((s, d) => {
      val units = t(s, d, "events").df
        .groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("converted"))
        .withColumn("variant",
          when(col("user_id") % 3 === 0, lit("control"))
            .when(col("user_id") % 3 === 1, lit("treat_a"))
            .otherwise(lit("treat_b")))
      Events.abTest(units, "variant", "converted").orderBy("variant")
    }),

    // Benford first-digit audit over order totals (r16): the
    // fabricated-data / synthetic-flood detector — observed micro share
    // per digit 1-9 against the log10(1+1/d) expectation; the synthetic
    // totals' near-uniform head (digits 1-4 at ~22% each) shows up as
    // large positive dev_micro exactly as designed
    "dq_benford" -> ((s, d) =>
      Checks.benfordCheck(t(s, d, "orders").df, "o_totalprice")),

    // chi-square homogeneity over the same crawl_v2 canary as psi_cat —
    // the same domain machinery, Pearson terms instead of the divergence
    "dq_drift_chi2" -> ((s, d) => {
      val docs = t(s, d, "documents").df
      val cur = docs.select(when(col("doc_id") % 5 === 0, lit("crawl_v2"))
        .otherwise(col("source")).as("source"))
      Checks.driftChi2Categorical(docs, cur, "source", maxCategories = 5)
        .orderBy("category")
    }),

    // rolling 7-day active users: contribute-then-fold exact distinct —
    // O(activity·7) rows, never a day×user window join
    "events_rolling_wau" -> ((s, d) =>
      Events.rollingActiveUsers(t(s, d, "events").df, "user_id", "ts",
          windowDays = 7)
        .orderBy("day")),

    // CUSUM change point over a PLANTED level shift (views relabel to
    // clicks from Jan 20): click volume steps up, view steps down, so
    // both groups peak at the shift; untouched groups keep small peaks
    "events_changepoint_cusum" -> ((s, d) => {
      val shifted = t(s, d, "events").df
        .withColumn("event_type",
          when(unix_micros(col("ts").cast("timestamp")) >= lit(1705708800000000L) &&
            col("event_type") === "view", lit("click"))
            .otherwise(col("event_type")))
      Events.cusumChangepoint(shifted, "event_type", "ts").orderBy("group")
    }),

    // per-event-type daily volume trend: the synthetic log is uniform, so
    // slopes near zero with exact integer sums either side — the operator
    // contract (dense zero-filled day axis) is what the oracle re-derives
    "events_trend_slope" -> ((s, d) =>
      Events.trendSlope(t(s, d, "events").df, "event_type", "ts")
        .orderBy("group")),

    // personalized PageRank: restart mass on the ÷97 customer seeds over
    // the same customer↔supplier graph as graph_pagerank — rank decays
    // with distance from the seed set; 3 unrolled integer rounds
    "graph_ppr" -> ((s, d) => {
      val ol = t(s, d, "orders").df
        .join(t(s, d, "lineitem").df, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000L).as("p"))
      val edges = ol.select(col("c").as("src"), col("p").as("dst"))
        .union(ol.select(col("p").as("src"), col("c").as("dst")))
      val seeds = ol.select(col("c").as("seed_id"))
        .filter(col("seed_id") % 97 === 0).distinct()
      Graph.personalizedPageRankInt(edges, "src", "dst", seeds, "seed_id",
          iterations = 3)
        .orderBy("id")
    }),

    // synchronous label propagation (3 unrolled rounds, min-label
    // tie-break) over the same capped co-purchase pair graph as kcore —
    // communities split where connected components would merge
    "graph_lpa" -> ((s, d) => {
      val pairs = Graph.coOccurrence(t(s, d, "lineitem").df,
          "l_orderkey", "l_partkey", minPairCount = 1, maxBasketSize = 5)
        .select(col("item_a"), col("item_b"))
      Graph.labelPropagation(pairs, "item_a", "item_b", rounds = 3,
        inputNormalized = true)
        .orderBy("id")
    }))

  /** DuckDB twin of [[Checks.suggest]] over a known schema: per column,
    * the same profile rules as conditional selects over scalar
    * subqueries; numeric bounds stay typed doubles, value sets join the
    * DISTINCT values in binary order. */
  private def suggestOracle(
      table: String,
      numericCols: Seq[String],
      stringCols: Seq[String],
      otherCols: Seq[String],
      maxSet: Int): String = {
    def nn(c: String) = s"(SELECT count(*) - count($c) FROM $table)"
    def nd(c: String) = s"(SELECT count(DISTINCT $c) FROM $table)"
    val n = s"(SELECT count(*) FROM $table)"
    val all = numericCols.map(_ -> "num") ++ stringCols.map(_ -> "str") ++
      otherCols.map(_ -> "oth")
    val rows = all.flatMap { case (c, t) =>
      val base = s"$n AS n_rows, ${nn(c)} AS n_nulls, ${nd(c)} AS n_distinct"
      val notNull = s"SELECT '$c' AS col_name, 'not_null' AS kind, " +
        s"CAST(NULL AS DOUBLE) AS lo, CAST(NULL AS DOUBLE) AS hi, " +
        s"CAST(NULL AS VARCHAR) AS allowed, $base WHERE ${nn(c)} = 0"
      val uniq = s"SELECT '$c', 'unique', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
        s"CAST(NULL AS VARCHAR), $base WHERE ${nn(c)} = 0 AND ${nd(c)} = $n"
      val rng = if (t == "num")
        Seq(s"SELECT '$c', 'in_range', (SELECT CAST(min($c) AS DOUBLE) FROM $table), " +
          s"(SELECT CAST(max($c) AS DOUBLE) FROM $table), CAST(NULL AS VARCHAR), " +
          s"$base WHERE $n - ${nn(c)} >= 1")
      else Nil
      // ORDER BY must live INSIDE string_agg: an ordered subquery feeding
      // an aggregate carries no ordering guarantee (observed: 1-in-3 runs
      // aggregated DuckDB's hash-distinct order instead)
      val inSet = if (t == "str")
        Seq(s"SELECT '$c', 'in_set', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
          s"(SELECT string_agg(v, ',' ORDER BY v) FROM " +
          s"(SELECT DISTINCT $c AS v FROM $table WHERE $c IS NOT NULL)), $base " +
          s"WHERE ${nd(c)} BETWEEN 1 AND $maxSet")
      else Nil
      Seq(notNull, uniq) ++ rng ++ inSet
    }
    rows.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name, kind")
  }

  /** Unrolled-CTE DuckDB twin of [[Classifier.trainLogistic]] +
    * [[Classifier.scoreLogistic]] on lang='en' labels: the same md5-mod
    * feature hashing, the same once-per-doc micro-quantized sigmoid, and
    * the same floor-safe shifted-division weight update — `//` on the
    * provably non-negative numerators equals Spark's truncating `div`. */
  private def classifierOracle(dim: Int, iters: Int, lrMicro: Long): String = {
    val sig = (m: String) =>
      s"CAST(round(1e6 / (1.0 + exp(-(CAST($m AS DOUBLE)) / 1e6))) AS BIGINT)"
    val upd = (g: String) =>
      s"((($lrMicro * (($g + n.n * 1000000) // n.n)) // 1000000) - $lrMicro)"
    val head =
      "WITH base AS (SELECT doc_id AS id, " +
      "CASE WHEN doc_id % 3 = 0 THEN coalesce(text, '') || ' q_ref_marker' " +
      "ELSE coalesce(text, '') END AS t, " +
      "CAST(doc_id % 3 = 0 AS BIGINT) AS y FROM documents), " +
      "feats AS (SELECT DISTINCT id, " +
      s"CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % $dim AS f " +
      "FROM (SELECT id, unnest(regexp_split_to_array(t, '\\s+')) AS term FROM base) " +
      "WHERE term <> ''), " +
      "n AS (SELECT count(*) AS n FROM base), " +
      "m0 AS (SELECT id, y, CAST(0 AS BIGINT) AS margin FROM base)"
    val steps = (0 until iters).map { i =>
      val prevB = if (i == 0) "0" else s"(SELECT b FROM b$i)"
      val marginCte = if (i == 0) "" else
        s", m$i AS (SELECT base.id, base.y, coalesce(s.mw, 0) + $prevB AS margin " +
        s"FROM base LEFT JOIN (SELECT id, SUM(w) AS mw FROM feats " +
        s"JOIN w$i USING (f) GROUP BY id) s ON s.id = base.id)"
      val wNext = if (i == 0)
        s", w1 AS (SELECT f, -${upd("g")} AS w FROM gf0 CROSS JOIN n)"
      else
        s", w${i + 1} AS (SELECT w$i.f, w$i.w - ${upd(s"gf$i.g")} AS w " +
        s"FROM w$i JOIN gf$i USING (f) CROSS JOIN n)"
      val bNext = if (i == 0)
        s", b1 AS (SELECT -${upd("sg")} AS b FROM (SELECT SUM(err) AS sg FROM e0) CROSS JOIN n)"
      else
        s", b${i + 1} AS (SELECT $prevB - ${upd("sg")} AS b " +
        s"FROM (SELECT SUM(err) AS sg FROM e$i) CROSS JOIN n)"
      marginCte +
        s", e$i AS (SELECT id, y, ${sig("margin")} - y * 1000000 AS err FROM m$i)" +
        s", gf$i AS (SELECT f, SUM(err) AS g FROM feats JOIN e$i USING (id) GROUP BY f)" +
        wNext + bNext
    }.mkString
    val fin =
      s", mf AS (SELECT base.id, base.y, CAST(coalesce(s.mw, 0) + " +
      s"(SELECT b FROM b$iters) AS BIGINT) AS margin FROM base LEFT JOIN " +
      s"(SELECT id, SUM(w) AS mw FROM feats JOIN w$iters USING (f) GROUP BY id) s " +
      "ON s.id = base.id) " +
      s"SELECT id AS doc_id, y AS label, margin AS margin_micro, " +
      s"${sig("margin")} AS score_micro, " +
      s"CAST(${sig("margin")} > 500000 AS BIGINT) AS pred FROM mf ORDER BY doc_id"
    head + steps + fin
  }

  /** Unrolled-CTE DuckDB twin of [[Graph.labelPropagation]] over the
    * capped co-purchase pair graph (the kcore edge derivation): per round,
    * neighbor-label counts then the (count desc, label asc) argmax per
    * node. MATERIALIZED per the unigram-DP lesson — each round's label
    * table is referenced twice. */
  private def LpaOracle(rounds: Int): String = {
    val head =
      "WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem " +
      "WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL), " +
      "sz AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 5), " +
      "kept AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)), " +
      "e0 AS MATERIALIZED (SELECT a.i AS u, c.i AS v FROM kept a JOIN kept c " +
      "ON a.b = c.b AND a.i < c.i GROUP BY 1, 2), " +
      "und AS MATERIALIZED (SELECT u, v FROM e0 UNION SELECT v, u FROM e0), " +
      "l0 AS MATERIALIZED (SELECT id, id AS label FROM " +
      "(SELECT DISTINCT u AS id FROM und))"
    val steps = (1 to rounds).map { r =>
      s", msg$r AS (SELECT und.v AS id, l.label, count(*) AS n " +
      s"FROM und JOIN l${r - 1} l ON und.u = l.id GROUP BY 1, 2), " +
      s"pick$r AS (SELECT id, label FROM (SELECT id, label, row_number() OVER " +
      "(PARTITION BY id ORDER BY n DESC, label ASC) AS rk " +
      s"FROM msg$r) WHERE rk = 1), " +
      s"l$r AS MATERIALIZED (SELECT l.id, coalesce(p.label, l.label) AS label " +
      s"FROM l${r - 1} l LEFT JOIN pick$r p ON l.id = p.id)"
    }.mkString
    head + steps +
      s" SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS label " +
      s"FROM l$rounds ORDER BY id"
  }

  /** Unrolled-CTE DuckDB twin of [[Graph.personalizedPageRankInt]] —
    * [[pageRankOracle]] with the base term gated on the ÷97 customer
    * seed flag instead of uniform. */
  private def pprOracle(iters: Int): String = {
    val head =
      "WITH ol AS (SELECT o_custkey AS c, 1000000 + l_suppkey AS p FROM orders " +
      "JOIN lineitem ON o_orderkey = l_orderkey), " +
      "e AS (SELECT DISTINCT src, dst FROM " +
      "(SELECT c AS src, p AS dst FROM ol UNION ALL SELECT p, c FROM ol)), " +
      "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), " +
      "sd AS (SELECT DISTINCT c AS id FROM ol WHERE c % 97 = 0), " +
      "nodes AS (SELECT node, CASE WHEN node IN (SELECT id FROM sd) " +
      "THEN 1 ELSE 0 END AS seed FROM " +
      "(SELECT src AS node FROM e UNION SELECT dst FROM e)), " +
      "r0 AS (SELECT node, CAST(seed * 1000000 AS BIGINT) AS r FROM nodes)"
    val steps = (1 to iters).map { i =>
      s", c$i AS (SELECT e.dst AS node, " +
      "SUM((850000 * (r.r // d.deg)) // 1000000) AS s " +
      s"FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON r.node = e.src " +
      "GROUP BY e.dst), " +
      s"r$i AS (SELECT n.node, n.seed * 150000 + coalesce(c$i.s, 0) AS r " +
      s"FROM nodes n LEFT JOIN c$i ON c$i.node = n.node)"
    }.mkString
    head + steps +
      s" SELECT node AS id, CAST(r AS BIGINT) AS rank_micro FROM r$iters ORDER BY id"
  }

  /** Unrolled-CTE DuckDB twin of [[Graph.pageRankInt]] over the
    * customer↔supplier graph: same distinct edges, same integer damping
    * recurrence (`//` is BIGINT floor division, matching Spark's `div` on
    * the all-positive operands), same left-join base for nodes with no
    * inbound mass. */
  private def pageRankOracle(iters: Int): String = {
    val head =
      "WITH ol AS (SELECT o_custkey AS c, 1000000 + l_suppkey AS p FROM orders " +
      "JOIN lineitem ON o_orderkey = l_orderkey), " +
      "e AS (SELECT DISTINCT src, dst FROM " +
      "(SELECT c AS src, p AS dst FROM ol UNION ALL SELECT p, c FROM ol)), " +
      "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), " +
      "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
      "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"
    val steps = (1 to iters).map { i =>
      s", c$i AS (SELECT e.dst AS node, " +
      "SUM((850000 * (r.r // d.deg)) // 1000000) AS s " +
      s"FROM e JOIN deg d USING (src) JOIN r${i - 1} r ON r.node = e.src " +
      "GROUP BY e.dst), " +
      s"r$i AS (SELECT n.node, 150000 + coalesce(c$i.s, 0) AS r " +
      s"FROM nodes n LEFT JOIN c$i ON c$i.node = n.node)"
    }.mkString
    head + steps +
      s" SELECT node AS id, CAST(r AS BIGINT) AS rank_micro FROM r$iters ORDER BY id"
  }

  val oracleSql: Map[String, String] = Map(
    "events_sessionize" ->
      ("WITH s AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, " +
       "CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_us FROM events) " +
       "SELECT event_id, user_id, ts_us, gap_us, " +
       "CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 14400000000 THEN 1 ELSE 0 END) " +
       "OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx " +
       "FROM s ORDER BY event_id"),

    "events_sessionize_incremental" ->
      ("WITH s AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, " +
       "CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_us FROM events), " +
       "s2 AS (SELECT event_id, user_id, ts_us, gap_us, " +
       "CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 14400000000 THEN 1 ELSE 0 END) " +
       "OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx " +
       "FROM s) " +
       "SELECT event_id, user_id, ts_us, gap_us, session_idx FROM s2 " +
       "WHERE ts_us >= 1705363200000000 ORDER BY event_id"),

    "events_session_stats" ->
      ("WITH s AS (SELECT event_id, user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS ts_us, " +
       "CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL " +
       "OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 14400000000 THEN 1 ELSE 0 END AS nw " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), " +
       "s2 AS (SELECT user_id, event_type, ts_us, " +
       "SUM(nw) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM s) " +
       "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, count(*) AS n_events, " +
       "min(ts_us) AS start_us, max(ts_us) AS end_us, " +
       "max(ts_us) - min(ts_us) AS duration_us, " +
       "count(DISTINCT event_type) AS n_event_types " +
       "FROM s2 GROUP BY user_id, session_idx ORDER BY user_id, session_idx"),

    "events_funnel" ->
      ("WITH ev AS (SELECT * FROM events WHERE epoch(ts) < 1704153600), " +
       "t0 AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM ev " +
       "WHERE event_type = 'view' GROUP BY user_id), " +
       "t1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t1 FROM ev e " +
       "JOIN t0 USING (user_id) WHERE e.event_type = 'click' " +
       "AND epoch_us(e.ts) > t0.t0 GROUP BY e.user_id), " +
       "t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM ev e " +
       "JOIN t1 USING (user_id) WHERE e.event_type = 'purchase' " +
       "AND epoch_us(e.ts) > t1.t1 GROUP BY e.user_id) " +
       "SELECT u.user_id, CAST(CASE WHEN t2 IS NOT NULL THEN 3 " +
       "WHEN t1 IS NOT NULL THEN 2 WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) " +
       "AS steps_completed, CAST(t0 AS BIGINT) AS t_first_us, " +
       "CAST(coalesce(t2, t1, t0) AS BIGINT) AS t_last_us " +
       "FROM (SELECT DISTINCT user_id FROM ev) u LEFT JOIN t0 USING (user_id) " +
       "LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id) ORDER BY user_id"),

    // latency rollup over the SAME per-user funnel chain
    "events_funnel_latency" ->
      ("WITH ev AS (SELECT * FROM events WHERE epoch(ts) < 1704153600), " +
       "t0 AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM ev " +
       "WHERE event_type = 'view' GROUP BY user_id), " +
       "t1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t1 FROM ev e " +
       "JOIN t0 USING (user_id) WHERE e.event_type = 'click' " +
       "AND epoch_us(e.ts) > t0.t0 GROUP BY e.user_id), " +
       "t2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM ev e " +
       "JOIN t1 USING (user_id) WHERE e.event_type = 'purchase' " +
       "AND epoch_us(e.ts) > t1.t1 GROUP BY e.user_id), " +
       "fu AS (SELECT u.user_id, CASE WHEN t2 IS NOT NULL THEN 3 " +
       "WHEN t1 IS NOT NULL THEN 2 WHEN t0 IS NOT NULL THEN 1 ELSE 0 END " +
       "AS steps_completed, coalesce(t2, t1, t0) - t0 AS lat " +
       "FROM (SELECT DISTINCT user_id FROM ev) u LEFT JOIN t0 USING (user_id) " +
       "LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)) " +
       "SELECT CAST(steps_completed AS BIGINT) AS steps_completed, " +
       "CAST(count(*) AS BIGINT) AS n_users, " +
       "round(quantile_cont(lat, 0.5), 4) AS p50_us, " +
       "round(quantile_cont(lat, 0.9), 4) AS p90_us " +
       "FROM fu WHERE steps_completed >= 1 GROUP BY steps_completed " +
       "ORDER BY steps_completed"),

    "events_retention" ->
      ("WITH act AS (SELECT DISTINCT user_id AS u, " +
       "CAST(date_trunc('week', ts) AS DATE) AS wk FROM events), " +
       "fs AS (SELECT u, wk, min(wk) OVER (PARTITION BY u) AS cw FROM act), " +
       "agg AS (SELECT cw AS cohort_week, " +
       "CAST(date_diff('day', cw, wk) // 7 AS BIGINT) AS week_offset, " +
       "count(*) AS n_users FROM fs GROUP BY 1, 2) " +
       "SELECT cohort_week, week_offset, n_users, " +
       "round(CAST(n_users AS DOUBLE) / max(CASE WHEN week_offset = 0 " +
       "THEN n_users END) OVER (PARTITION BY cohort_week), 6) AS retained_frac " +
       "FROM agg ORDER BY cohort_week, week_offset"),

    "events_top_paths" ->
      ("WITH r AS (SELECT user_id, event_type, row_number() OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events), " +
       "p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path " +
       "FROM r WHERE rn <= 4 GROUP BY user_id), " +
       "c AS (SELECT path, count(*) AS n_users FROM p GROUP BY path), " +
       "rk AS (SELECT path, n_users, row_number() OVER " +
       "(ORDER BY n_users DESC, path ASC) AS rank FROM c) " +
       "SELECT CAST(rank AS BIGINT) AS rank, path, CAST(n_users AS BIGINT) AS n_users " +
       "FROM rk WHERE rank <= 20 ORDER BY rank"),

    "events_session_paths" ->
      ("WITH s AS (SELECT event_id, user_id, event_type, " +
       "CAST(epoch_us(ts) AS BIGINT) AS ts_us, " +
       "CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_us FROM events), " +
       "x AS (SELECT *, SUM(CASE WHEN gap_us IS NULL OR gap_us > 14400000000 " +
       "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx FROM s), " +
       "r AS (SELECT user_id, session_idx, event_type, row_number() OVER " +
       "(PARTITION BY user_id, session_idx ORDER BY ts_us, event_id) AS rn FROM x), " +
       "p AS (SELECT user_id, session_idx, string_agg(event_type, '>' ORDER BY rn) " +
       "AS path FROM r WHERE rn <= 3 GROUP BY user_id, session_idx), " +
       "c AS (SELECT path, count(*) AS n_sessions FROM p GROUP BY path), " +
       "rk AS (SELECT path, n_sessions, row_number() OVER " +
       "(ORDER BY n_sessions DESC, path ASC) AS rank FROM c) " +
       "SELECT CAST(rank AS BIGINT) AS rank, path, " +
       "CAST(n_sessions AS BIGINT) AS n_sessions FROM rk WHERE rank <= 15 " +
       "ORDER BY rank"),

    "events_transitions" ->
      ("WITH nx AS (SELECT event_type AS src_type, lead(event_type) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id) AS dst_type FROM events), " +
       "c AS (SELECT src_type, dst_type, count(*) AS n FROM nx " +
       "WHERE dst_type IS NOT NULL GROUP BY src_type, dst_type) " +
       "SELECT src_type, dst_type, CAST(n AS BIGINT) AS n, " +
       "CAST(round((n * 1000000.0) / (sum(n) OVER (PARTITION BY src_type))) AS BIGINT) " +
       "AS p_micro FROM c ORDER BY src_type, dst_type"),

    "text_pmi_bigrams" ->
      ("WITH toks AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'), " +
       "t -> t <> '') AS ts FROM documents), " +
       "uc AS (SELECT term, count(*) AS c FROM " +
       "(SELECT unnest(ts) AS term FROM toks) GROUP BY term), " +
       "tot AS (SELECT CAST(sum(len(ts)) AS BIGINT) AS n_tok, " +
       "CAST(sum(greatest(len(ts) - 1, 0)) AS BIGINT) AS n_bg FROM toks), " +
       // tokens are whitespace-free by construction, so ' ' is a safe
       // pair separator for the oracle's flat bigram string
       "bg AS (SELECT unnest(list_transform(range(1, len(ts)), " +
       "i -> ts[i] || ' ' || ts[i+1])) AS g FROM toks WHERE len(ts) >= 2), " +
       "bc AS (SELECT split_part(g, ' ', 1) AS a, split_part(g, ' ', 2) AS b, " +
       "count(*) AS c_ab FROM bg GROUP BY 1, 2 HAVING count(*) >= 5), " +
       "j AS (SELECT bc.a, bc.b, bc.c_ab, ua.c AS c_a, ub.c AS c_b, " +
       "tot.n_tok, tot.n_bg FROM bc JOIN uc ua ON ua.term = bc.a " +
       "JOIN uc ub ON ub.term = bc.b CROSS JOIN tot), " +
       "sc AS (SELECT a, b, c_ab, CAST(round(ln(((CAST(c_ab AS DOUBLE) * n_tok) " +
       "* n_tok) / ((CAST(n_bg AS DOUBLE) * c_a) * c_b)) * 1000000.0) AS BIGINT) " +
       "AS pmi_micro FROM j), " +
       "r AS (SELECT a, b, c_ab, pmi_micro, row_number() OVER " +
       "(ORDER BY pmi_micro DESC, a ASC, b ASC) AS rank FROM sc) " +
       "SELECT CAST(rank AS BIGINT) AS rank, a, b, CAST(c_ab AS BIGINT) AS c_ab, " +
       "pmi_micro FROM r WHERE rank <= 50 ORDER BY rank"),

    "corpus_weighted_sample" ->
      ("WITH u AS (SELECT doc_id, n_chars, " +
       "CAST(('0x' || substr(md5(doc_id || ':wsamp'), 1, 13)) AS BIGINT) AS h " +
       "FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0), " +
       "kx AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight, " +
       "CAST(round((ln((h + 1) / 4503599627370496.0) / CAST(n_chars AS DOUBLE)) " +
       "* 1000000.0) AS BIGINT) AS key_micro FROM u), " +
       "r AS (SELECT doc_id, weight, key_micro, row_number() OVER " +
       "(ORDER BY key_micro DESC, doc_id ASC) AS rank FROM kx) " +
       "SELECT CAST(rank AS BIGINT) AS rank, doc_id, weight, key_micro " +
       "FROM r WHERE rank <= 50 ORDER BY rank"),

    "corpus_weighted_sample_by" ->
      ("WITH u AS (SELECT lang, doc_id, n_chars, " +
       "CAST(('0x' || substr(md5(doc_id || ':wsamp'), 1, 13)) AS BIGINT) AS h " +
       "FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0), " +
       "kx AS (SELECT lang, doc_id, CAST(n_chars AS DOUBLE) AS weight, " +
       "CAST(round((ln((h + 1) / 4503599627370496.0) / CAST(n_chars AS DOUBLE)) " +
       "* 1000000.0) AS BIGINT) AS key_micro FROM u), " +
       "r AS (SELECT lang, doc_id, weight, key_micro, row_number() OVER " +
       "(PARTITION BY lang ORDER BY key_micro DESC, doc_id ASC) AS rank FROM kx) " +
       "SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, weight, key_micro " +
       "FROM r WHERE rank <= 10 ORDER BY lang, rank"),

    "agg_freq_mergeable" ->
      ("WITH it AS (SELECT l_returnflag AS grp, " +
       "CASE WHEN l_orderkey % 4 = 0 THEN l_suppkey % 5 " +
       "ELSE l_partkey + 1000000 END AS item FROM lineitem), " +
       "e AS (SELECT grp, item, count(*) AS cnt FROM it GROUP BY grp, item), " +
       "tt AS (SELECT grp, sum(cnt) AS n FROM e GROUP BY grp), " +
       "h AS (SELECT e.grp, count(*) AS n_heavy FROM e JOIN tt USING (grp) " +
       "WHERE e.cnt * 50 >= tt.n GROUP BY e.grp) " +
       "SELECT tt.grp AS l_returnflag, CAST(tt.n AS BIGINT) AS n_rows, " +
       "CAST(coalesce(h.n_heavy, 0) AS BIGINT) AS n_heavy, " +
       "TRUE AS all_heavy_found, TRUE AS bounds_ok " +
       "FROM tt LEFT JOIN h USING (grp) ORDER BY l_returnflag"),

    "agg_freq_mergeable_str" ->
      ("WITH it AS (SELECT lang AS grp, " +
       "CASE WHEN doc_id % 2 = 0 THEN 'hot-' || CAST(doc_id % 3 AS VARCHAR) " +
       "ELSE 'tail-' || CAST(doc_id AS VARCHAR) END AS item FROM documents), " +
       "e AS (SELECT grp, item, count(*) AS cnt FROM it GROUP BY grp, item), " +
       "tt AS (SELECT grp, sum(cnt) AS n FROM e GROUP BY grp), " +
       "h AS (SELECT e.grp, count(*) AS n_heavy FROM e JOIN tt USING (grp) " +
       "WHERE e.cnt * 50 >= tt.n GROUP BY e.grp) " +
       "SELECT tt.grp AS lang, CAST(tt.n AS BIGINT) AS n_rows, " +
       "CAST(coalesce(h.n_heavy, 0) AS BIGINT) AS n_heavy, " +
       "TRUE AS all_heavy_found, TRUE AS bounds_ok " +
       "FROM tt LEFT JOIN h USING (grp) ORDER BY lang"),

    "join_fuzzy_edit" ->
      ("WITH w AS (SELECT doc_id, split_part(text, ' ', 1) AS w FROM documents) " +
       "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
       "CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist " +
       "FROM w a JOIN w b ON a.doc_id < b.doc_id AND levenshtein(a.w, b.w) <= 2 " +
       "ORDER BY id_a, id_b"),

    "join_fuzzy_edit_2way" ->
      ("WITH w AS (SELECT doc_id, split_part(text, ' ', 1) AS w FROM documents) " +
       "SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
       "CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist " +
       "FROM w a JOIN w b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1 " +
       "AND levenshtein(a.w, b.w) <= 1 ORDER BY id_a, id_b"),

    "join_fuzzy_entity_resolve" ->
      ("WITH RECURSIVE w AS (SELECT doc_id, split_part(text, ' ', 1) AS w FROM documents), " +
       "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM w a JOIN w b " +
       "ON a.doc_id < b.doc_id AND levenshtein(a.w, b.w) <= 2), " +
       "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
       "UNION SELECT id_b AS src, id_a AS dst FROM pairs), " +
       "reach(src, dst) AS (SELECT src, dst FROM edges " +
       "UNION SELECT r.src, ed.dst FROM reach r JOIN edges ed ON r.dst = ed.src), " +
       "comp0 AS (SELECT src AS id, least(src, min(dst)) AS component FROM reach " +
       "GROUP BY src), " +
       "comp AS (SELECT w.doc_id, coalesce(c.component, w.doc_id) AS component " +
       "FROM w LEFT JOIN comp0 c ON w.doc_id = c.id), " +
       "agg AS (SELECT component, min(doc_id) AS canonical_id, " +
       "count(*) AS n_members FROM comp GROUP BY component) " +
       "SELECT doc_id, component, canonical_id, " +
       "doc_id = canonical_id AS is_canonical, CAST(n_members AS BIGINT) AS n_members " +
       "FROM comp JOIN agg USING (component) ORDER BY doc_id"),

    "graph_copurchase" -> CopurchaseSql,

    // the incremental serve's contract: == the one-shot operator on the
    // union of the basket-disjoint batches — the SAME oracle verbatim
    "graph_copurchase_incremental" -> CopurchaseSql,

    "events_session_copurchase" ->
      ("WITH s AS (SELECT event_id, user_id, event_type, " +
       "CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER " +
       "(PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS gap_us, " +
       "epoch_us(ts) AS ts_us FROM events), " +
       "s2 AS (SELECT event_type, CAST(user_id AS VARCHAR) || ':' || " +
       "CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 14400000000 THEN 1 ELSE 0 END) " +
       "OVER (PARTITION BY user_id ORDER BY ts_us, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS b " +
       "FROM s), " +
       "bi AS (SELECT DISTINCT b, event_type AS i FROM s2), " +
       "sz AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 100), " +
       "kept AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)), " +
       "nb AS (SELECT count(DISTINCT b) AS n_baskets FROM kept), " +
       "ic AS (SELECT i, count(*) AS ci FROM kept GROUP BY i), " +
       "pc AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS pair_baskets " +
       "FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i " +
       "GROUP BY 1, 2 HAVING count(*) >= 2) " +
       "SELECT item_a, item_b, pair_baskets, " +
       "ia.ci AS item_a_baskets, ib.ci AS item_b_baskets, nb.n_baskets, " +
       "CAST(round((pair_baskets * nb.n_baskets * 1000000.0) / (ia.ci * ib.ci)) " +
       "AS BIGINT) AS lift_micro, " +
       "CAST(round((pair_baskets * 1000000.0) / (ia.ci + ib.ci - pair_baskets)) " +
       "AS BIGINT) AS jaccard_micro " +
       "FROM pc JOIN ic ia ON pc.item_a = ia.i JOIN ic ib ON pc.item_b = ib.i " +
       "CROSS JOIN nb ORDER BY item_a, item_b"),

    "corpus_leakage_split_incremental" ->
      ("WITH RECURSIVE w AS (SELECT doc_id, split_part(text, ' ', 1) AS w FROM documents), " +
       "odds AS (SELECT * FROM w WHERE doc_id % 2 = 1), " +
       "evens AS (SELECT * FROM w WHERE doc_id % 2 = 0), " +
       "cs AS (SELECT doc_id, CASE WHEN CAST(('0x' || substr(md5(doc_id || ':graft'), 1, 8)) " +
       "AS BIGINT) % 100 < 80 THEN 'train' " +
       "WHEN CAST(('0x' || substr(md5(doc_id || ':graft'), 1, 8)) AS BIGINT) % 100 < 90 " +
       "THEN 'val' ELSE 'test' END AS split FROM evens), " +
       "bp AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM odds a JOIN odds b " +
       "ON a.doc_id < b.doc_id AND levenshtein(a.w, b.w) <= 2), " +
       "edges AS (SELECT id_a AS src, id_b AS dst FROM bp " +
       "UNION SELECT id_b AS src, id_a AS dst FROM bp), " +
       "reach(src, dst) AS (SELECT src, dst FROM edges " +
       "UNION SELECT r.src, ed.dst FROM reach r JOIN edges ed ON r.dst = ed.src), " +
       "comp0 AS (SELECT src AS id, least(src, min(dst)) AS component FROM reach " +
       "GROUP BY src), " +
       "comp AS (SELECT odds.doc_id, coalesce(c.component, odds.doc_id) AS component " +
       "FROM odds LEFT JOIN comp0 c ON odds.doc_id = c.id), " +
       "cp AS (SELECT a.doc_id AS bid, b.doc_id AS cid FROM odds a JOIN evens b " +
       "ON levenshtein(a.w, b.w) <= 2), " +
       // min restricted to matched ids PRESENT in the splits table (the
       // operator joins cp⋈cs before the min — see the drift note there)
       "inh AS (SELECT comp.component, min(cp.cid) AS inherited_from " +
       "FROM comp JOIN cp ON comp.doc_id = cp.bid " +
       "JOIN cs ON cp.cid = cs.doc_id GROUP BY comp.component), " +
       "bk AS (SELECT comp.doc_id, comp.component, inh.inherited_from, " +
       "CAST(('0x' || substr(md5(comp.component || ':graft'), 1, 8)) AS BIGINT) % 100 " +
       "AS hbucket FROM comp LEFT JOIN inh ON comp.component = inh.component) " +
       "SELECT bk.doc_id, bk.component, bk.inherited_from, " +
       "CASE WHEN bk.inherited_from IS NOT NULL THEN NULL ELSE bk.hbucket END AS bucket, " +
       "CASE WHEN bk.inherited_from IS NOT NULL THEN cs.split " +
       "WHEN bk.hbucket < 80 THEN 'train' WHEN bk.hbucket < 90 THEN 'val' " +
       "ELSE 'test' END AS split " +
       "FROM bk LEFT JOIN cs ON bk.inherited_from = cs.doc_id ORDER BY bk.doc_id"),

    "graph_related_items" ->
      (CopurchaseCtes + ", " +
       "sym AS (SELECT item_a AS item, item_b AS related_id, pair_baskets, " +
       "lift_micro FROM p UNION ALL SELECT item_b AS item, item_a AS related_id, " +
       "pair_baskets, lift_micro FROM p), " +
       "r AS (SELECT item, related_id, pair_baskets, lift_micro, " +
       "row_number() OVER (PARTITION BY item ORDER BY lift_micro DESC, " +
       "pair_baskets DESC, related_id ASC) AS rank FROM sym) " +
       "SELECT item, CAST(rank AS BIGINT) AS rank, related_id, pair_baskets, " +
       "lift_micro FROM r WHERE rank <= 5 ORDER BY item, rank"),

    "graph_kcore" -> {
      // unrolled peel: EXACTLY maxRounds rounds — the engine's fixpoint
      // early-exit is pure optimization (post-fixpoint rounds are no-ops),
      // so the equality holds whether or not the peel converged in 4.
      // MATERIALIZED: each round references the previous edge set ~5x and
      // DuckDB inlines CTEs per reference (the unigram-DP lesson).
      val rounds = (1 to 4).map { r =>
        s"d$r AS MATERIALIZED (SELECT id, count(*) AS degree FROM " +
        s"(SELECT u AS id FROM e${r - 1} UNION ALL SELECT v AS id FROM e${r - 1}) GROUP BY id), " +
        s"k$r AS MATERIALIZED (SELECT id FROM d$r WHERE degree >= 2), " +
        s"e$r AS MATERIALIZED (SELECT e.u, e.v FROM e${r - 1} e " +
        s"JOIN k$r a ON e.u = a.id JOIN k$r b ON e.v = b.id)"
      }.mkString(", ")
      "WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem " +
      "WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL), " +
      "sz AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 5), " +
      "kept AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)), " +
      "e0 AS MATERIALIZED (SELECT a.i AS u, c.i AS v FROM kept a JOIN kept c " +
      "ON a.b = c.b AND a.i < c.i GROUP BY 1, 2), " +
      rounds + " " +
      "SELECT id, CAST(count(*) AS BIGINT) AS core_degree FROM " +
      "(SELECT u AS id FROM e4 UNION ALL SELECT v AS id FROM e4) " +
      "GROUP BY id ORDER BY id"
    },

    "graph_triangles" ->
      ("WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem " +
       "WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL), " +
       "sz AS (SELECT b FROM bi GROUP BY b HAVING count(*) <= 5), " +
       "kept AS (SELECT bi.b, bi.i FROM bi JOIN sz USING (b)), " +
       "e0 AS (SELECT a.i AS u, c.i AS v FROM kept a JOIN kept c " +
       "ON a.b = c.b AND a.i < c.i GROUP BY 1, 2), " +
       "deg AS (SELECT id, count(*) AS degree FROM " +
       "(SELECT u AS id FROM e0 UNION ALL SELECT v AS id FROM e0) GROUP BY id), " +
       "o AS (SELECT CASE WHEN du.degree < dv.degree OR " +
       "(du.degree = dv.degree AND e0.u < e0.v) THEN e0.u ELSE e0.v END AS a, " +
       "CASE WHEN du.degree < dv.degree OR " +
       "(du.degree = dv.degree AND e0.u < e0.v) THEN e0.v ELSE e0.u END AS b " +
       "FROM e0 JOIN deg du ON e0.u = du.id JOIN deg dv ON e0.v = dv.id), " +
       "tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c FROM o e1 " +
       "JOIN o e2 ON e1.b = e2.a JOIN o e3 ON e3.a = e1.a AND e3.b = e2.b), " +
       "pn AS (SELECT id, count(*) AS n FROM (SELECT a AS id FROM tri " +
       "UNION ALL SELECT b AS id FROM tri UNION ALL SELECT c AS id FROM tri) " +
       "GROUP BY id) " +
       "SELECT deg.id, deg.degree, CAST(coalesce(pn.n, 0) AS BIGINT) AS n_triangles, " +
       "CASE WHEN deg.degree < 2 THEN 0 " +
       "ELSE CAST(round((coalesce(pn.n, 0) * 2 * 1000000.0) / " +
       "(deg.degree * (deg.degree - 1))) AS BIGINT) END AS clustering_micro " +
       "FROM deg LEFT JOIN pn USING (id) ORDER BY id"),

    "dq_ref_integrity" ->
      ("WITH ch AS (SELECT CASE WHEN l_orderkey % 997 = 0 THEN NULL " +
       "WHEN l_orderkey % 1000 = 0 THEN l_partkey + 900000 " +
       "ELSE l_partkey END AS fk FROM lineitem), " +
       "counts AS (SELECT fk AS key, count(*) AS n_child_rows FROM ch " +
       "WHERE fk IS NOT NULL GROUP BY fk), " +
       "orph AS (SELECT * FROM counts c WHERE NOT EXISTS " +
       "(SELECT 1 FROM part WHERE p_partkey = c.key)), " +
       "t AS (SELECT count(*) AS n_orphan_keys, " +
       "coalesce(sum(n_child_rows), 0) AS n_orphan_rows FROM orph), " +
       "t2 AS (SELECT count(*) AS n_child_total, " +
       "coalesce(sum(CASE WHEN fk IS NULL THEN 1 ELSE 0 END), 0) AS n_null_fk_rows " +
       "FROM ch), " +
       "top AS (SELECT * FROM orph ORDER BY n_child_rows DESC, key LIMIT 10) " +
       "SELECT top.key, top.n_child_rows, CAST(t.n_orphan_keys AS BIGINT) AS n_orphan_keys, " +
       "CAST(t.n_orphan_rows AS BIGINT) AS n_orphan_rows, " +
       "CAST(t2.n_null_fk_rows AS BIGINT) AS n_null_fk_rows, " +
       "CAST(t2.n_child_total AS BIGINT) AS n_child_total, " +
       "t.n_orphan_keys = 0 AS ok FROM top, t, t2 ORDER BY key"),

    "dq_calibration" ->
      ("WITH r AS (SELECT least(9, ((doc_id * 2003 % 1000000) * 10) // 1000000) AS bin, " +
       "doc_id * 2003 % 1000000 AS s, CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y " +
       "FROM documents), " +
       "pb AS (SELECT bin, count(*) AS n, sum(s) AS ssum, sum(y) AS pos " +
       "FROM r GROUP BY bin), " +
       "g AS (SELECT bin, n, ssum // n AS mean_score_micro, " +
       "(pos * 1000000) // n AS pos_rate_micro, " +
       "abs(ssum // n - (pos * 1000000) // n) AS gap_micro FROM pb), " +
       "e AS (SELECT coalesce(sum(gap_micro * n), 0) // greatest(sum(n), 1) " +
       "AS ece_micro FROM g) " +
       "SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n, " +
       "CAST(mean_score_micro AS BIGINT) AS mean_score_micro, " +
       "CAST(pos_rate_micro AS BIGINT) AS pos_rate_micro, " +
       "CAST(gap_micro AS BIGINT) AS gap_micro, " +
       "CAST(e.ece_micro AS BIGINT) AS ece_micro FROM g, e ORDER BY bin"),

    "dq_join_preflight" ->
      ("WITH ca AS (SELECT user_id AS key, count(*) AS n_left FROM events " +
       "WHERE user_id IS NOT NULL GROUP BY 1), " +
       "cb AS (SELECT user_id AS key, count(*) AS n_right FROM events " +
       "WHERE user_id IS NOT NULL AND event_type = 'purchase' GROUP BY 1), " +
       "c AS (SELECT key, n_left, n_right, n_left * n_right AS contribution " +
       "FROM ca JOIN cb USING (key)), " +
       "t AS (SELECT coalesce(sum(contribution), 0) AS est_output_rows, " +
       "count(*) AS n_matched_keys FROM c), " +
       "tl AS (SELECT coalesce(sum(n_left), 0) AS n_left_rows FROM ca), " +
       "tr AS (SELECT coalesce(sum(n_right), 0) AS n_right_rows FROM cb) " +
       "SELECT key, n_left, n_right, contribution, " +
       "CAST(CASE WHEN est_output_rows = 0 THEN 0 ELSE " +
       "round((contribution * 1000000.0) / est_output_rows) END AS BIGINT) AS share_micro, " +
       "CAST(est_output_rows AS BIGINT) AS est_output_rows, " +
       "CAST(n_matched_keys AS BIGINT) AS n_matched_keys, " +
       "CAST(n_left_rows AS BIGINT) AS n_left_rows, " +
       "CAST(n_right_rows AS BIGINT) AS n_right_rows, " +
       "CAST(CASE WHEN n_left_rows + n_right_rows = 0 THEN 0 ELSE " +
       "round((est_output_rows * 1000000.0) / (n_left_rows + n_right_rows)) END " +
       "AS BIGINT) AS amplification_micro " +
       "FROM c, t, tl, tr ORDER BY contribution DESC, key LIMIT 10"),

    "dq_fd_check" -> {
      def block(lhs: String, rhs: String): String =
        s"(WITH counts AS (SELECT $lhs AS l, $rhs AS r, count(*) AS n FROM orders " +
        s"WHERE $lhs IS NOT NULL GROUP BY 1, 2), " +
        "pg AS (SELECT l, sum(n) AS rws, max(n) AS keep, count(*) AS var " +
        "FROM counts GROUP BY l) " +
        s"SELECT '$lhs' AS lhs, '$rhs' AS rhs, " +
        "CAST(coalesce(sum(rws), 0) AS BIGINT) AS n_rows, " +
        "CAST(count(*) AS BIGINT) AS n_groups, " +
        "CAST(coalesce(sum(CASE WHEN var > 1 THEN 1 ELSE 0 END), 0) AS BIGINT) " +
        "AS n_violating_groups, " +
        "CAST(coalesce(sum(rws) - sum(keep), 0) AS BIGINT) AS g3_remove_rows, " +
        "coalesce(sum(CASE WHEN var > 1 THEN 1 ELSE 0 END), 0) = 0 AS holds, " +
        "CASE WHEN coalesce(sum(rws), 0) = 0 THEN 1000000 " +
        "ELSE CAST(round(((sum(rws) - (sum(rws) - sum(keep))) * 1000000.0) / " +
        "sum(rws)) AS BIGINT) END AS confidence_micro FROM pg)"
      Seq(("o_orderkey", "o_custkey"), ("o_custkey", "o_orderpriority"),
          ("o_orderpriority", "o_orderstatus"))
        .map { case (l, r) => block(l, r) }
        .mkString("", " UNION ALL ", " ORDER BY lhs, rhs")
    },

    "corpus_leakage_split" ->
      ("WITH RECURSIVE w AS (SELECT doc_id, split_part(text, ' ', 1) AS w FROM documents), " +
       "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM w a JOIN w b " +
       "ON a.doc_id < b.doc_id AND levenshtein(a.w, b.w) <= 2), " +
       "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs " +
       "UNION SELECT id_b AS src, id_a AS dst FROM pairs), " +
       "reach(src, dst) AS (SELECT src, dst FROM edges " +
       "UNION SELECT r.src, ed.dst FROM reach r JOIN edges ed ON r.dst = ed.src), " +
       "comp0 AS (SELECT src AS id, least(src, min(dst)) AS component FROM reach " +
       "GROUP BY src), " +
       "comp AS (SELECT w.doc_id, coalesce(c.component, w.doc_id) AS component " +
       "FROM w LEFT JOIN comp0 c ON w.doc_id = c.id), " +
       "bk AS (SELECT doc_id, component, " +
       "CAST(('0x' || substr(md5(component || ':graft'), 1, 8)) AS BIGINT) % 100 AS bucket " +
       "FROM comp) " +
       "SELECT doc_id, component, bucket, " +
       "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' " +
       "ELSE 'test' END AS split FROM bk ORDER BY doc_id"),

    "layout_zorder" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"(((bp >> $i) & 1) << ${2 * i})",
        s"(((bs >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      "WITH b AS (SELECT min(l_partkey) AS minp, max(l_partkey) AS maxp, " +
      "min(l_suppkey) AS mins, max(l_suppkey) AS maxs FROM lineitem), " +
      "k AS (SELECT l_orderkey, l_linenumber, " +
      "((l_partkey - minp) * 256) // (maxp - minp + 1) AS bp, " +
      "((l_suppkey - mins) * 256) // (maxs - mins + 1) AS bs " +
      "FROM lineitem, b) " +
      "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, " +
      s"CAST($terms AS BIGINT) AS zval FROM k ORDER BY l_orderkey, l_linenumber"
    },

    "agg_theta_segments" ->
      ("WITH ev AS (SELECT CAST(day(ts) % 3 AS BIGINT) AS grp, user_id, event_type " +
       "FROM events), " +
       "a AS (SELECT DISTINCT grp, user_id FROM ev WHERE event_type = 'view'), " +
       "b AS (SELECT DISTINCT grp, user_id FROM ev WHERE event_type = 'purchase'), " +
       "ga AS (SELECT grp, count(*) AS a_users FROM a GROUP BY grp), " +
       "gb AS (SELECT grp, count(*) AS b_users FROM b GROUP BY grp), " +
       "gi AS (SELECT grp, count(*) AS i_users FROM " +
       "(SELECT * FROM a INTERSECT SELECT * FROM b) GROUP BY grp), " +
       "gu AS (SELECT grp, count(*) AS u_users FROM " +
       "(SELECT * FROM a UNION SELECT * FROM b) GROUP BY grp) " +
       "SELECT gu.grp, CAST(coalesce(ga.a_users, 0) AS BIGINT) AS a_users, " +
       "CAST(coalesce(gb.b_users, 0) AS BIGINT) AS b_users, " +
       "CAST(gu.u_users AS BIGINT) AS union_users, " +
       "CAST(coalesce(gi.i_users, 0) AS BIGINT) AS intersect_users, " +
       "CAST(coalesce(ga.a_users, 0) - coalesce(gi.i_users, 0) AS BIGINT) AS a_not_b_users, " +
       "CAST(coalesce(gb.b_users, 0) - coalesce(gi.i_users, 0) AS BIGINT) AS b_not_a_users, " +
       "CASE WHEN gu.u_users > 0 THEN CAST(round(coalesce(gi.i_users, 0) * 1000000.0 " +
       "/ gu.u_users) AS BIGINT) ELSE 0 END AS jaccard_micro " +
       "FROM gu LEFT JOIN ga USING (grp) LEFT JOIN gb USING (grp) " +
       "LEFT JOIN gi USING (grp) ORDER BY grp"),

    "agg_kll_mergeable" ->
      ("SELECT l_returnflag, count(*) AS n_rows, TRUE AS ok_q25, TRUE AS ok_q50, " +
       "TRUE AS ok_q75, TRUE AS ok_q95, TRUE AS ok_direct " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "events_attribution" ->
      ("WITH te AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us, " +
       "event_type, event_type = 'purchase' AS is_conv FROM events " +
       "WHERE event_type IN ('purchase', 'view', 'click')), " +
       "j AS (SELECT *, coalesce(sum(CASE WHEN is_conv THEN 1 ELSE 0 END) OVER " +
       "(PARTITION BY user_id ORDER BY us, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey FROM te), " +
       "g AS (SELECT user_id, journey, " +
       "max(CASE WHEN is_conv THEN event_id END) AS conversion_id, " +
       "max(CASE WHEN is_conv THEN us END) AS conv_ts_us, " +
       "min(CASE WHEN NOT is_conv THEN {'us': us, 'id': event_id, 't': event_type} END) AS ft, " +
       "max(CASE WHEN NOT is_conv THEN {'us': us, 'id': event_id, 't': event_type} END) AS lt, " +
       "sum(CASE WHEN NOT is_conv THEN 1 ELSE 0 END) AS n_touches " +
       "FROM j GROUP BY user_id, journey) " +
       "SELECT user_id, conversion_id, conv_ts_us, " +
       "(ft).id AS first_touch_id, (ft).t AS first_touch_type, " +
       "(lt).id AS last_touch_id, (lt).t AS last_touch_type, " +
       "CAST(n_touches AS BIGINT) AS n_touches " +
       "FROM g WHERE conversion_id IS NOT NULL ORDER BY conversion_id"),

    // the equivalence contract: the incremental output IS the full-history
    // attribution restricted to conversions at/after the batch cutoff
    "events_attribution_incremental" ->
      ("WITH te AS (SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS us, " +
       "event_type, event_type = 'purchase' AS is_conv FROM events " +
       "WHERE event_type IN ('purchase', 'view', 'click')), " +
       "j AS (SELECT *, coalesce(sum(CASE WHEN is_conv THEN 1 ELSE 0 END) OVER " +
       "(PARTITION BY user_id ORDER BY us, event_id " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS journey FROM te), " +
       "g AS (SELECT user_id, journey, " +
       "max(CASE WHEN is_conv THEN event_id END) AS conversion_id, " +
       "max(CASE WHEN is_conv THEN us END) AS conv_ts_us, " +
       "min(CASE WHEN NOT is_conv THEN {'us': us, 'id': event_id, 't': event_type} END) AS ft, " +
       "max(CASE WHEN NOT is_conv THEN {'us': us, 'id': event_id, 't': event_type} END) AS lt, " +
       "sum(CASE WHEN NOT is_conv THEN 1 ELSE 0 END) AS n_touches " +
       "FROM j GROUP BY user_id, journey) " +
       "SELECT user_id, conversion_id, conv_ts_us, " +
       "(ft).id AS first_touch_id, (ft).t AS first_touch_type, " +
       "(lt).id AS last_touch_id, (lt).t AS last_touch_type, " +
       "CAST(n_touches AS BIGINT) AS n_touches " +
       "FROM g WHERE conversion_id IS NOT NULL " +
       "AND conv_ts_us >= 1705363200000000 ORDER BY conversion_id"),

    "events_anomaly_daily" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
       "FROM events GROUP BY event_type, CAST(ts AS DATE)), " +
       "w AS (SELECT event_type, day, n, count(n) OVER win AS cnt, " +
       "CAST(sum(n) OVER win AS DOUBLE) AS s, " +
       "CAST(sum(n*n) OVER win AS DOUBLE) AS ss FROM daily " +
       "WINDOW win AS (PARTITION BY event_type ORDER BY day " +
       "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)), " +
       "z AS (SELECT event_type, day, n, cnt, " +
       "CASE WHEN cnt >= 3 AND sqrt((ss - (s*s)/cnt)/cnt) > 0.0 " +
       "THEN CAST(round(((n - (s/cnt)) * 1000000.0) / sqrt((ss - (s*s)/cnt)/cnt)) AS BIGINT) " +
       "END AS z_micro FROM w) " +
       "SELECT event_type, day, CAST(n AS BIGINT) AS n, CAST(cnt AS BIGINT) AS n_prior, " +
       "z_micro, (z_micro IS NOT NULL AND abs(z_micro) >= 2000000) AS is_anomaly " +
       "FROM z ORDER BY event_type, day"),

    "events_resample_daily" ->
      ("WITH daily AS (SELECT user_id AS key, CAST(ts AS DATE) AS day, count(*) AS n " +
       "FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL " +
       "GROUP BY 1, 2), " +
       "rng AS (SELECT key, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY key), " +
       "grid AS (SELECT key, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) " +
       "AS DATE) AS day FROM rng) " +
       "SELECT grid.key, grid.day, CAST(coalesce(daily.n, 0) AS BIGINT) AS n, " +
       "daily.n IS NULL AS filled " +
       "FROM grid LEFT JOIN daily ON grid.key = daily.key AND grid.day = daily.day " +
       "ORDER BY grid.key, grid.day"),

    "events_anomaly_seasonal" ->
      ("WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n " +
       "FROM events GROUP BY event_type, CAST(ts AS DATE)), " +
       "dd AS (SELECT event_type, day, n, " +
       "CAST(((CAST(day - DATE '2024-01-05' AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS dow " +
       "FROM daily), " +
       "w AS (SELECT event_type, day, dow, n, count(n) OVER win AS cnt, " +
       "CAST(sum(n) OVER win AS DOUBLE) AS s, " +
       "CAST(sum(n*n) OVER win AS DOUBLE) AS ss FROM dd " +
       "WINDOW win AS (PARTITION BY event_type, dow ORDER BY day " +
       "ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)), " +
       "z AS (SELECT event_type, day, dow, n, cnt, " +
       "CASE WHEN cnt >= 2 AND sqrt((ss - (s*s)/cnt)/cnt) > 0.0 " +
       "THEN CAST(round(((n - (s/cnt)) * 1000000.0) / sqrt((ss - (s*s)/cnt)/cnt)) AS BIGINT) " +
       "END AS z_micro FROM w) " +
       "SELECT event_type, day, dow, CAST(n AS BIGINT) AS n, " +
       "CAST(cnt AS BIGINT) AS n_prior, z_micro, " +
       "(z_micro IS NOT NULL AND abs(z_micro) >= 2000000) AS is_anomaly " +
       "FROM z ORDER BY event_type, day"),

    "dq_constraints" ->
      ("WITH n AS (SELECT count(*) AS n FROM lineitem), v AS (" +
       "SELECT 'not_null(l_orderkey)' AS check_name, 'not_null' AS kind, " +
       "'l_orderkey' AS target, " +
       "(SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) AS violations " +
       "UNION ALL SELECT 'in_range(l_quantity)', 'in_range', 'l_quantity in [1.0, 45.0]', " +
       "(SELECT count(*) FROM lineitem WHERE l_quantity IS NOT NULL " +
       "AND (l_quantity < 1.0 OR l_quantity > 45.0)) " +
       "UNION ALL SELECT 'in_set(l_returnflag)', 'in_set', 'l_returnflag in {A,N,R}', " +
       "(SELECT count(*) FROM lineitem WHERE l_returnflag IS NOT NULL " +
       "AND l_returnflag NOT IN ('A','N','R')) " +
       "UNION ALL SELECT 'regex(l_linestatus)', 'regex', 'l_linestatus ~ ^[FO]$', " +
       "(SELECT count(*) FROM lineitem WHERE l_linestatus IS NOT NULL " +
       "AND NOT regexp_matches(l_linestatus, '^[FO]$')) " +
       "UNION ALL SELECT 'unique(l_orderkey,l_linenumber)', 'unique', " +
       "'l_orderkey,l_linenumber', " +
       "(SELECT coalesce(sum(c), 0) FROM (SELECT count(*) AS c FROM lineitem " +
       "GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)) " +
       "UNION ALL SELECT 'row_count', 'row_count', 'rows in [1000, 100000000]', " +
       "CASE WHEN (SELECT n FROM n) BETWEEN 1000 AND 100000000 THEN 0 ELSE 1 END) " +
       "SELECT check_name, kind, target, CAST(violations AS BIGINT) AS violations, " +
       "CAST((SELECT n FROM n) AS BIGINT) AS n_rows, violations = 0 AS pass " +
       "FROM v ORDER BY check_name"),

    "dq_drift_psi" ->
      ("WITH ed AS (SELECT list_transform(quantile_cont(l_extendedprice, " +
       "[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]), e -> round(e, 4)) " +
       "AS edges FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
       "rc AS (SELECT len(list_filter(ed.edges, e -> l_extendedprice > e)) AS bucket, " +
       "count(*) AS ref_cnt FROM lineitem, ed WHERE l_extendedprice IS NOT NULL " +
       "GROUP BY 1), " +
       "cc AS (SELECT len(list_filter(ed.edges, e -> v > e)) AS bucket, " +
       "count(*) AS cur_cnt FROM (SELECT l_extendedprice * 1.3 AS v " +
       "FROM lineitem WHERE l_extendedprice IS NOT NULL), ed GROUP BY 1), " +
       "rn AS (SELECT count(*) AS rn FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
       "cn AS (SELECT count(*) AS cn FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
       "g AS (SELECT unnest(range(0, 10)) AS bucket), " +
       "j AS (SELECT g.bucket, coalesce(rc.ref_cnt, 0) AS ref_cnt, " +
       "coalesce(cc.cur_cnt, 0) AS cur_cnt, ed.edges, rn.rn, cn.cn " +
       "FROM g LEFT JOIN rc USING (bucket) LEFT JOIN cc USING (bucket), ed, rn, cn) " +
       "SELECT CAST(bucket AS BIGINT) AS bucket, " +
       "CASE WHEN bucket > 0 THEN edges[CAST(bucket AS INT)] END AS lo, " +
       "CASE WHEN bucket < 9 THEN edges[CAST(bucket + 1 AS INT)] END AS hi, " +
       "CAST(ref_cnt AS BIGINT) AS ref_cnt, CAST(cur_cnt AS BIGINT) AS cur_cnt, " +
       "CAST(round((((CAST(cur_cnt + 1 AS DOUBLE) / (cn + 10)) - " +
       "(CAST(ref_cnt + 1 AS DOUBLE) / (rn + 10))) * " +
       "ln((CAST(cur_cnt + 1 AS DOUBLE) / (cn + 10)) / " +
       "(CAST(ref_cnt + 1 AS DOUBLE) / (rn + 10)))) * 1000000.0) AS BIGINT) " +
       "AS psi_micro FROM j ORDER BY bucket"),

    "dq_drift_embedding" ->
      ("WITH q AS (SELECT label, list_transform(embedding, " +
       "v -> CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS qe " +
       "FROM embeddings WHERE embedding IS NOT NULL), " +
       "cq AS (SELECT label, list_transform(" +
       "CASE WHEN label % 2 = 0 THEN list_transform(embedding, v -> -v) " +
       "ELSE embedding END, " +
       "v -> CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS qe " +
       "FROM embeddings WHERE embedding IS NOT NULL), " +
       "rn AS (SELECT label, count(*) AS n FROM q GROUP BY label), " +
       "re AS (SELECT label, i, sum(qe[CAST(i AS INT)]) AS s FROM q, " +
       "unnest(range(1, 65)) t(i) GROUP BY label, i), " +
       "rm AS (SELECT re.label, i, CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS m " +
       "FROM re JOIN rn USING (label)), " +
       "rcn AS (SELECT label, array_agg(m ORDER BY i) AS c FROM rm GROUP BY label), " +
       "cn2 AS (SELECT label, count(*) AS n FROM cq GROUP BY label), " +
       "ce AS (SELECT label, i, sum(qe[CAST(i AS INT)]) AS s FROM cq, " +
       "unnest(range(1, 65)) t(i) GROUP BY label, i), " +
       "cm AS (SELECT ce.label, i, CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS m " +
       "FROM ce JOIN cn2 USING (label)), " +
       "ccn AS (SELECT label, array_agg(m ORDER BY i) AS c FROM cm GROUP BY label), " +
       "j AS (SELECT rcn.label, rn.n AS n_ref, cn2.n AS n_cur, " +
       "list_sum(list_transform(list_zip(rcn.c, ccn.c), x -> x[1] * x[2])) AS d, " +
       "list_sum(list_transform(rcn.c, v -> v * v)) AS nr, " +
       "list_sum(list_transform(ccn.c, v -> v * v)) AS nc " +
       "FROM rcn JOIN rn USING (label) JOIN ccn USING (label) JOIN cn2 USING (label)) " +
       "SELECT label, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur, " +
       "CAST(round((CAST(d AS DOUBLE) / (sqrt(CAST(nr AS DOUBLE)) * " +
       "sqrt(CAST(nc AS DOUBLE)))) * 1000000.0) AS BIGINT) AS cos_micro, " +
       "1000000 - CAST(round((CAST(d AS DOUBLE) / (sqrt(CAST(nr AS DOUBLE)) * " +
       "sqrt(CAST(nc AS DOUBLE)))) * 1000000.0) AS BIGINT) AS drift_micro " +
       "FROM j ORDER BY label"),

    "dq_drift_psi_cat" ->
      ("WITH rc AS (SELECT source AS category, count(*) AS cnt FROM documents " +
       "WHERE source IS NOT NULL GROUP BY 1), " +
       "top AS (SELECT category FROM (SELECT category, row_number() OVER " +
       "(ORDER BY cnt DESC, category ASC) AS rn FROM rc) WHERE rn <= 5), " +
       "cur AS (SELECT CASE WHEN doc_id % 5 = 0 THEN 'crawl_v2' ELSE source END " +
       "AS source FROM documents), " +
       "labr AS (SELECT CASE WHEN source IS NULL THEN '__null__' " +
       "WHEN source IN (SELECT category FROM top) THEN source " +
       "ELSE '__other__' END AS category FROM documents), " +
       "labc AS (SELECT CASE WHEN source IS NULL THEN '__null__' " +
       "WHEN source IN (SELECT category FROM top) THEN source " +
       "ELSE '__other__' END AS category FROM cur), " +
       "grid AS (SELECT category FROM top UNION ALL SELECT '__other__' " +
       "UNION ALL SELECT '__null__'), " +
       "r2 AS (SELECT category, count(*) AS ref_cnt FROM labr GROUP BY 1), " +
       "c2 AS (SELECT category, count(*) AS cur_cnt FROM labc GROUP BY 1), " +
       "tot AS (SELECT (SELECT count(*) FROM documents) AS rn, " +
       "(SELECT count(*) FROM cur) AS cn, (SELECT count(*) FROM grid) AS nl), " +
       "j AS (SELECT g.category, coalesce(r2.ref_cnt, 0) AS ref_cnt, " +
       "coalesce(c2.cur_cnt, 0) AS cur_cnt, tot.rn, tot.cn, tot.nl " +
       "FROM grid g LEFT JOIN r2 USING (category) LEFT JOIN c2 USING (category), tot) " +
       "SELECT category, CAST(ref_cnt AS BIGINT) AS ref_cnt, " +
       "CAST(cur_cnt AS BIGINT) AS cur_cnt, " +
       "CAST(round((((CAST(cur_cnt + 1 AS DOUBLE) / (cn + nl)) - " +
       "(CAST(ref_cnt + 1 AS DOUBLE) / (rn + nl))) * " +
       "ln((CAST(cur_cnt + 1 AS DOUBLE) / (cn + nl)) / " +
       "(CAST(ref_cnt + 1 AS DOUBLE) / (rn + nl)))) * 1000000.0) AS BIGINT) " +
       "AS psi_micro FROM j ORDER BY category"),

    "dq_outliers_mad" ->
      ("WITH m AS (SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) " +
       "AS med FROM lineitem GROUP BY l_returnflag), " +
       "d AS (SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber, " +
       "l.l_extendedprice, m.med FROM lineitem l JOIN m USING (l_returnflag)), " +
       "a AS (SELECT l_returnflag, round(quantile_cont(abs(l_extendedprice - med), 0.5), 4) " +
       "AS mad FROM d GROUP BY l_returnflag) " +
       "SELECT d.l_returnflag, d.l_orderkey, d.l_linenumber, d.l_extendedprice, " +
       "d.med, a.mad, coalesce(a.mad > 0.0 AND " +
       "abs(d.l_extendedprice - d.med) > 1.5 * a.mad, FALSE) AS is_outlier " +
       "FROM d JOIN a USING (l_returnflag) " +
       "ORDER BY l_orderkey, l_linenumber, l_returnflag, l_extendedprice"),

    "dq_skew_report" ->
      ("WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang), " +
       "nn AS (SELECT count(*) AS n FROM documents), " +
       "r AS (SELECT lang, cnt, row_number() OVER (ORDER BY cnt DESC, lang ASC) " +
       "AS rank FROM c) " +
       "SELECT CAST(rank AS BIGINT) AS rank, lang, CAST(cnt AS BIGINT) AS cnt, " +
       "CAST(round((cnt * 1000000.0) / n) AS BIGINT) AS share_micro, " +
       "CAST(greatest(1, (cnt * 32 + n - 1) // n) AS BIGINT) AS salt_factor " +
       "FROM r, nn WHERE rank <= 5 ORDER BY rank"),

    "dq_suggest" -> suggestOracle("lineitem",
      numericCols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      stringCols = Seq("l_returnflag", "l_linestatus"),
      otherCols = Seq("l_shipdate"),
      maxSet = 10),

    // the v1 time-travel read IS the original table — the strongest
    // possible oracle for the reconstruction contract
    "corpus_scd2_asof" ->
      "SELECT doc_id AS id, text, lang, source FROM documents ORDER BY id",

    "corpus_scd2" ->
      (s"WITH $NewtSql, " +
       "o AS (SELECT doc_id, text, lang, source, 1 AS p FROM documents), " +
       "nn AS (SELECT doc_id, text, lang, source, 1 AS p FROM newt), " +
       "j AS (SELECT coalesce(o.doc_id, nn.doc_id) AS id, o.p AS po, nn.p AS pn, " +
       "o.text AS ot, o.lang AS ol, o.source AS os, " +
       "nn.text AS nt, nn.lang AS nl, nn.source AS ns, " +
       "(o.text IS NOT DISTINCT FROM nn.text AND o.lang IS NOT DISTINCT FROM nn.lang " +
       "AND o.source IS NOT DISTINCT FROM nn.source) AS same " +
       "FROM o FULL OUTER JOIN nn ON o.doc_id = nn.doc_id) " +
       "SELECT * FROM (" +
       "SELECT id, ot AS text, ol AS lang, os AS source, " +
       "CAST(1 AS BIGINT) AS valid_from, " +
       "CASE WHEN pn IS NOT NULL AND same THEN CAST(NULL AS BIGINT) " +
       "ELSE CAST(2 AS BIGINT) END AS valid_to FROM j WHERE po IS NOT NULL " +
       "UNION ALL " +
       "SELECT id, nt, nl, ns, CAST(2 AS BIGINT), CAST(NULL AS BIGINT) FROM j " +
       "WHERE pn IS NOT NULL AND NOT (po IS NOT NULL AND same)" +
       ") ORDER BY id, valid_from"),

    "corpus_snapshot_diff" ->
      (s"WITH $NewtSql, " +
       "o AS (SELECT doc_id, text, lang, source, 1 AS p FROM documents), " +
       "nn AS (SELECT doc_id, text, lang, source, 1 AS p FROM newt) " +
       "SELECT coalesce(o.doc_id, nn.doc_id) AS id, " +
       "CASE WHEN o.p IS NULL THEN 'added' WHEN nn.p IS NULL THEN 'removed' " +
       "WHEN o.text IS NOT DISTINCT FROM nn.text AND o.lang IS NOT DISTINCT FROM nn.lang " +
       "AND o.source IS NOT DISTINCT FROM nn.source THEN 'unchanged' " +
       "ELSE 'changed' END AS status, " +
       "CASE WHEN o.p IS NOT NULL AND nn.p IS NOT NULL THEN " +
       "CAST((o.text IS DISTINCT FROM nn.text) AS BIGINT) + " +
       "CAST((o.lang IS DISTINCT FROM nn.lang) AS BIGINT) + " +
       "CAST((o.source IS DISTINCT FROM nn.source) AS BIGINT) END AS n_changed_cols " +
       "FROM o FULL OUTER JOIN nn ON o.doc_id = nn.doc_id ORDER BY id"),

    "text_canary_scan" ->
      ("WITH planted AS (SELECT doc_id, " +
       "(CASE WHEN doc_id % 62 = 0 THEN text || ' CANARY-A1 CANARY-A1' " +
       "WHEN doc_id % 31 = 0 THEN text || ' CANARY-A1' ELSE text END) AS t0 " +
       "FROM documents), " +
       "planted2 AS (SELECT doc_id, " +
       "CASE WHEN doc_id % 37 = 0 THEN t0 || ' SECRET-B2' ELSE t0 END AS t FROM planted), " +
       "pairs AS (SELECT doc_id, unnest(['CANARY-A1', 'SECRET-B2']) AS canary, t " +
       "FROM planted2), " +
       "counted AS (SELECT doc_id AS id, canary, " +
       "CAST((length(t) - length(replace(t, canary, ''))) / length(canary) AS BIGINT) " +
       "AS hits FROM pairs) " +
       "SELECT id, canary, hits FROM counted WHERE hits >= 1 ORDER BY id, canary"),

    "graph_pagerank" -> pageRankOracle(3),

    "text_quality_classifier" -> classifierOracle(dim = 256, iters = 4, lrMicro = 500000L),

    "agg_hll_mergeable" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_distinct, " +
       "count(*) AS n_events, TRUE AS rows_consistent, TRUE AS merge_consistent, " +
       "TRUE AS est_ok FROM events GROUP BY event_type ORDER BY event_type"),

    "search_bm25" ->
      (s"WITH $Bm25Ctes " +
       "SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_micro " +
       "FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"),

    // the one-shot oracle VERBATIM: the merged even/odd indexes must rank
    // exactly as an index built once over the whole corpus
    "search_bm25_incremental" ->
      (s"WITH $Bm25Ctes " +
       "SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_micro " +
       "FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"),

    // Dirichlet QL over the shared tok/tf/dl/qterms chain: collection
    // unigram model, matched-term micro-nat sums, per-doc length norm
    "search_ql_dirichlet" ->
      (s"WITH $Bm25Ctes, " +
       "totcf AS (SELECT CAST(sum(tf) AS BIGINT) AS total_cf FROM tf), " +
       "pbg AS (SELECT term, CAST(sum(tf) AS DOUBLE) / t.total_cf AS p_bg " +
       "FROM tf, totcf t GROUP BY term, t.total_cf), " +
       "qn AS (SELECT query_id, count(*) AS qn FROM qterms GROUP BY query_id), " +
       "qlqs AS (SELECT q.query_id, q.term, p.p_bg FROM qterms q JOIN pbg p USING (term)), " +
       "qlm AS (SELECT s.query_id, t.doc_id, d.dl, CAST(sum(CAST(round(ln(1.0 + " +
       "CAST(t.tf AS DOUBLE) / (2000.0 * s.p_bg)) * 1e6) AS BIGINT)) AS BIGINT) AS m " +
       "FROM tf t JOIN qlqs s USING (term) JOIN dl d ON d.doc_id = t.doc_id " +
       "GROUP BY s.query_id, t.doc_id, d.dl), " +
       "qlsc AS (SELECT a.query_id, a.doc_id, a.m + CAST(round(ln(2000.0 / " +
       "(a.dl + 2000.0)) * n.qn * 1e6) AS BIGINT) AS score_micro " +
       "FROM qlm a JOIN qn n USING (query_id)), " +
       "qlranked AS (SELECT query_id, doc_id, score_micro, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rank FROM qlsc) " +
       "SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_micro " +
       "FROM qlranked WHERE rank <= 5 ORDER BY query_id, rank"),

    // pseudo-relevance feedback over the SAME shared chain: feedback docs
    // from `ranked`, integer tf·idf term scores, expanded bag re-scored
    // through the identical formula
    "search_bm25_expanded" ->
      (s"WITH $Bm25Ctes, " +
       "fb AS (SELECT query_id, doc_id FROM ranked WHERE rank <= 3), " +
       "fscore AS (SELECT f.query_id, t.term, sum(t.tf * i.idf_micro) AS s " +
       "FROM fb f JOIN tf t ON t.doc_id = f.doc_id JOIN idf i ON i.term = t.term " +
       "GROUP BY f.query_id, t.term), " +
       "ftop AS (SELECT query_id, term FROM (SELECT query_id, term, " +
       "row_number() OVER (PARTITION BY query_id ORDER BY s DESC, term ASC) AS rn " +
       "FROM fscore) WHERE rn <= 5), " +
       "eterms AS (SELECT DISTINCT query_id, term FROM " +
       "(SELECT query_id, term FROM qterms UNION ALL SELECT query_id, term FROM ftop)), " +
       "eqstats AS (SELECT e.query_id, e.term, i.idf_micro, i.avgdl FROM eterms e " +
       "JOIN idf i USING (term)), " +
       "escored AS (SELECT s.query_id, t.doc_id, " +
       "CAST(round(CAST(s.idf_micro AS DOUBLE) * ((t.tf * 2.2) / " +
       "(t.tf + 1.2 * (0.25 + 0.75 * (d.dl / s.avgdl))))) AS BIGINT) AS tsm " +
       "FROM tf t JOIN eqstats s USING (term) JOIN dl d ON d.doc_id = t.doc_id), " +
       "eagg AS (SELECT query_id, doc_id, CAST(sum(tsm) AS BIGINT) AS score_micro " +
       "FROM escored GROUP BY query_id, doc_id), " +
       "eranked AS (SELECT query_id, doc_id, score_micro, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rank FROM eagg) " +
       "SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_micro " +
       "FROM eranked WHERE rank <= 10 ORDER BY query_id, rank"),

    "search_eval_ndcg" ->
      ("WITH dq AS (SELECT vec_id AS query_id, embedding AS query_vec, " +
       "label AS qlabel FROM embeddings WHERE vec_id % 100 = 3), " +
       "dscored AS (SELECT dq.query_id, e.vec_id AS neighbor_id, " +
       "list_sum(list_transform(list_zip(e.embedding, dq.query_vec), " +
       "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
       "(sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * " +
       "sqrt(list_sum(list_transform(dq.query_vec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos " +
       "FROM embeddings e, dq WHERE e.vec_id <> dq.query_id), " +
       "dranked AS (SELECT query_id, neighbor_id, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM dscored), " +
       "rk AS (SELECT query_id, neighbor_id AS doc_id, rank FROM dranked WHERE rank <= 10), " +
       "qr AS (SELECT dq.query_id, e.vec_id AS doc_id, 1 AS rel FROM embeddings e, dq " +
       "WHERE e.label = dq.qlabel AND e.vec_id <> dq.query_id), " +
       "j AS (SELECT rk.query_id, rk.rank, coalesce(qr.rel, 0) AS rel FROM rk " +
       "LEFT JOIN qr ON qr.query_id = rk.query_id AND qr.doc_id = rk.doc_id), " +
       "pq AS (SELECT query_id, count(*) AS n_retrieved, " +
       "sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS hits, " +
       "min(CASE WHEN rel > 0 THEN rank END) AS fr, " +
       "sum(CAST(round((rel * 1000000.0) / log2(rank + 1)) AS BIGINT)) AS dcg_micro " +
       "FROM j GROUP BY query_id), " +
       "ir AS (SELECT query_id, rel, doc_id, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS irank FROM qr), " +
       "idl AS (SELECT query_id, count(*) AS n_relevant, " +
       "sum(CASE WHEN irank <= 10 THEN CAST(round((rel * 1000000.0) / log2(irank + 1)) AS BIGINT) " +
       "ELSE 0 END) AS idcg_micro FROM ir GROUP BY query_id) " +
       "SELECT pq.query_id, CAST(n_retrieved AS BIGINT) AS n_retrieved, " +
       "CAST(coalesce(n_relevant, 0) AS BIGINT) AS n_relevant, CAST(hits AS BIGINT) AS hits, " +
       "CASE WHEN n_relevant > 0 THEN CAST(round((hits * 1000000.0) / n_relevant) AS BIGINT) END " +
       "AS recall_micro, " +
       "CASE WHEN fr IS NOT NULL THEN CAST(round(1000000.0 / fr) AS BIGINT) END " +
       "AS rr_micro, CAST(dcg_micro AS BIGINT) AS dcg_micro, " +
       "CAST(coalesce(idcg_micro, 0) AS BIGINT) AS idcg_micro, " +
       "CASE WHEN idcg_micro > 0 THEN CAST(round((dcg_micro * 1000000.0) / idcg_micro) AS BIGINT) END " +
       "AS ndcg_micro FROM pq LEFT JOIN idl USING (query_id) ORDER BY query_id"),

    // hybrid sparse+dense: the bm25 chain and the brute-cosine chain fuse
    // by RECIPROCAL RANK — each list contributes round(1e6/(60+rank)) as
    // a long, the union re-ranks by the long sum (ties → doc_id asc)
    "search_hybrid_rrf" ->
      (s"WITH $Bm25Ctes, " +
       "dq AS (SELECT vec_id AS query_id, embedding AS query_vec " +
       "FROM embeddings WHERE vec_id % 100 = 3), " +
       "dscored AS (SELECT dq.query_id, e.vec_id AS neighbor_id, " +
       "list_sum(list_transform(list_zip(e.embedding, dq.query_vec), " +
       "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) / " +
       "(sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))) * " +
       "sqrt(list_sum(list_transform(dq.query_vec, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos " +
       "FROM embeddings e, dq WHERE e.vec_id <> dq.query_id), " +
       "dranked AS (SELECT query_id, neighbor_id, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM dscored), " +
       "cand AS (SELECT query_id, doc_id, " +
       "CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c " +
       "FROM ranked WHERE rank <= 10 " +
       "UNION ALL SELECT query_id, neighbor_id, " +
       "CAST(round(1000000.0 / (60 + rank)) AS BIGINT) FROM dranked WHERE rank <= 10), " +
       "fused AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro, " +
       "CAST(count(*) AS BIGINT) AS n_lists FROM cand GROUP BY query_id, doc_id), " +
       "franked AS (SELECT *, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id ASC) AS rnk FROM fused) " +
       "SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, rrf_micro, n_lists " +
       "FROM franked WHERE rnk <= 10 ORDER BY query_id, rank"),

    // the indexed-dense hybrid: the bm25 chain fuses with the FULL IVF×PQ
    // re-derivation (seed codebooks, both Lloyd rounds, coarse assignment,
    // the 2-cell probe, the ADC scan over codes, the 50-nominee exact
    // rerank — the sim_topk_ivfpq oracle's chain with the ÷100≡3 <2000
    // query set), then the same reciprocal-rank fusion tail
    "search_hybrid_rrf_ann" ->
      (s"WITH $Bm25Ctes, " +
       PipelineQueries.PqSeedsSql + ", " +
       PipelineQueries.pqRoundSql(1, "seeds") + ", " +
       PipelineQueries.pqRoundSql(2, "c1") + ", " +
       PipelineQueries.pqRoundSql(3, "c2") + ", " +
       "enc AS (SELECT vec_id, list(code ORDER BY sub) AS codes FROM a3 GROUP BY vec_id), " +
       "cent AS (SELECT CAST(vec_id / 64 AS INTEGER) AS cell_id, embedding AS centroid_vec " +
       "FROM embeddings WHERE vec_id % 64 = 0 AND vec_id < 3200), " +
       "dq AS (SELECT vec_id AS query_id, embedding AS query_vec FROM embeddings " +
       "WHERE vec_id % 100 = 3 AND vec_id < 2000), " +
       "assign AS (SELECT vec_id, cell_id FROM (" +
       "SELECT e.vec_id, c.cell_id, row_number() OVER (PARTITION BY e.vec_id ORDER BY " +
       PipelineQueries.cosSql("e.embedding", "c.centroid_vec") + " DESC, c.cell_id) AS rn " +
       "FROM embeddings e CROSS JOIN cent c) WHERE rn = 1), " +
       "probe AS (SELECT query_id, cell_id FROM (" +
       "SELECT dq.query_id, c.cell_id, row_number() OVER (PARTITION BY dq.query_id ORDER BY " +
       PipelineQueries.cosSql("dq.query_vec", "c.centroid_vec") + " DESC, c.cell_id) AS rn " +
       "FROM dq CROSS JOIN cent c) WHERE rn <= 2), " +
       "lt AS (SELECT query_id, list(ip ORDER BY sub, code) AS lut FROM (" +
       "SELECT dq.query_id, p.sub, p.code, " +
       PipelineQueries.ipSql("dq.query_vec[p.sub*8+1 : p.sub*8+8]", "p.cvec") + " AS ip " +
       "FROM dq CROSS JOIN c2 p) z GROUP BY query_id), " +
       "adc AS (SELECT p.query_id, a.vec_id AS neighbor_id, " +
       "list_sum(list_transform(range(0, 8), s -> l.lut[s*8 + e.codes[s+1] + 1])) AS score " +
       "FROM probe p JOIN assign a ON a.cell_id = p.cell_id " +
       "JOIN enc e ON e.vec_id = a.vec_id " +
       "JOIN lt l ON l.query_id = p.query_id WHERE a.vec_id <> p.query_id), " +
       "dshort AS (SELECT query_id, neighbor_id FROM " +
       "(SELECT query_id, neighbor_id, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn " +
       "FROM adc) WHERE rn <= 50), " +
       "drr AS (SELECT s.query_id, s.neighbor_id, " +
       PipelineQueries.cosSql("e.embedding", "dq.query_vec") + " AS cos " +
       "FROM dshort s JOIN embeddings e ON e.vec_id = s.neighbor_id " +
       "JOIN dq ON dq.query_id = s.query_id), " +
       "dranked AS (SELECT query_id, neighbor_id, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM drr), " +
       "cand AS (SELECT query_id, doc_id, " +
       "CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c " +
       "FROM ranked WHERE rank <= 10 AND query_id < 2000 " +
       "UNION ALL SELECT query_id, neighbor_id, " +
       "CAST(round(1000000.0 / (60 + rank)) AS BIGINT) FROM dranked WHERE rank <= 10), " +
       "fused AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro, " +
       "CAST(count(*) AS BIGINT) AS n_lists FROM cand GROUP BY query_id, doc_id), " +
       "franked AS (SELECT *, row_number() OVER " +
       "(PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id ASC) AS rnk FROM fused) " +
       "SELECT query_id, CAST(rnk AS BIGINT) AS rank, doc_id, rrf_micro, n_lists " +
       "FROM franked WHERE rnk <= 10 ORDER BY query_id, rank"),

    // ---- round-15 second wave ----

    // exact-ECDF KS via one ordered cumulative over the distinct-value
    // table (the engine's two-level prefix sum is a pure parallelization
    // of the same sums); integer gap numerator, one final division
    "dq_drift_ks" ->
      ("WITH r AS (SELECT l_extendedprice AS v FROM lineitem " +
       "WHERE l_extendedprice IS NOT NULL), " +
       "c AS (SELECT l_extendedprice * " +
       "(CASE WHEN l_orderkey % 2 = 0 THEN 1.1 ELSE 1.0 END) AS v " +
       "FROM lineitem WHERE l_extendedprice IS NOT NULL), " +
       "rc AS (SELECT v, count(*) AS rn FROM r GROUP BY v), " +
       "cc AS (SELECT v, count(*) AS cn FROM c GROUP BY v), " +
       "m AS (SELECT coalesce(rc.v, cc.v) AS v, coalesce(rn, 0) AS rn, " +
       "coalesce(cn, 0) AS cn FROM rc FULL JOIN cc ON rc.v = cc.v), " +
       "cum AS (SELECT v, sum(rn) OVER (ORDER BY v) AS cr, " +
       "sum(cn) OVER (ORDER BY v) AS cm FROM m), " +
       "t AS (SELECT (SELECT count(*) FROM r) AS nr, " +
       "(SELECT count(*) FROM c) AS nc), " +
       "g AS (SELECT v, abs(cr * nc - cm * nr) AS gap FROM cum, t), " +
       "d AS (SELECT max(gap) AS d_num FROM g) " +
       "SELECT CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cur, " +
       "CAST(d_num AS BIGINT) AS d_num, " +
       "(SELECT min(v) FROM g, d WHERE gap = d_num) AS ks_at, " +
       "CAST(round(d_num * 1000000.0 / (nr * nc)) AS BIGINT) AS ks_micro " +
       "FROM t, d"),

    // centroids re-derived exactly as dq_drift_embedding's, then exact
    // long squared distances and the per-label p90 fence
    "dq_embedding_outliers" ->
      ("WITH q AS (SELECT vec_id, label, list_transform(embedding, " +
       "v -> CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS qe " +
       "FROM embeddings WHERE embedding IS NOT NULL), " +
       "n AS (SELECT label, count(*) AS n FROM q GROUP BY label), " +
       "e AS (SELECT label, i, sum(qe[CAST(i AS INT)]) AS s FROM q, " +
       "unnest(range(1, 65)) t(i) GROUP BY label, i), " +
       "m AS (SELECT e.label, i, CAST(round(CAST(s AS DOUBLE) / n) AS BIGINT) AS m " +
       "FROM e JOIN n USING (label)), " +
       "cent AS (SELECT label, array_agg(m ORDER BY i) AS c FROM m GROUP BY label), " +
       "sc AS (SELECT vec_id, q.label, " +
       "list_sum(list_transform(list_zip(qe, cent.c), " +
       "x -> (x[1] - x[2]) * (x[1] - x[2]))) AS dist2 " +
       "FROM q JOIN cent ON q.label = cent.label), " +
       "th AS (SELECT label, CAST(round(quantile_cont(dist2, 0.9)) AS BIGINT) " +
       "AS threshold FROM sc GROUP BY label) " +
       "SELECT vec_id AS id, sc.label, CAST(dist2 AS BIGINT) AS dist2, threshold, " +
       "dist2 > threshold AS is_outlier " +
       "FROM sc JOIN th ON sc.label = th.label ORDER BY id"),

    // per-user metrics → data-anchored recency → one quantile-edge row →
    // strict-greater bucket scores (recency reverse-scored)
    "events_rfm" ->
      ("WITH tx AS (SELECT user_id, epoch_us(ts) AS us, value FROM events " +
       "WHERE event_type = 'purchase'), " +
       "pu AS (SELECT user_id, max(us) AS last_us, count(*) AS frequency, " +
       "CAST(sum(CAST(value AS DECIMAL(18,6))) * 1000000 AS BIGINT) " +
       "AS monetary_micro FROM tx GROUP BY user_id), " +
       "ao AS (SELECT max(last_us) AS as_of FROM pu), " +
       "mt AS (SELECT user_id, (ao.as_of - last_us) // 86400000000 " +
       "AS recency_days, frequency, monetary_micro FROM pu, ao), " +
       "ed AS (SELECT " +
       "list_transform(quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]), " +
       "x -> round(x, 4)) AS re, " +
       "list_transform(quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]), " +
       "x -> round(x, 4)) AS fe, " +
       "list_transform(quantile_cont(monetary_micro, [0.2, 0.4, 0.6, 0.8]), " +
       "x -> round(x, 4)) AS me FROM mt), " +
       "sc AS (SELECT user_id, recency_days, frequency, " +
       "monetary_micro, " +
       "CAST(5 - len(list_filter(ed.re, x -> recency_days > x)) AS BIGINT) AS r_score, " +
       "CAST(1 + len(list_filter(ed.fe, x -> frequency > x)) AS BIGINT) AS f_score, " +
       "CAST(1 + len(list_filter(ed.me, x -> monetary_micro > x)) AS BIGINT) AS m_score " +
       "FROM mt, ed) " +
       "SELECT user_id, recency_days, frequency, monetary_micro, " +
       "r_score, f_score, m_score, " +
       "CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || " +
       "CAST(m_score AS VARCHAR) AS segment " +
       "FROM sc ORDER BY user_id"),

    // exact per-variant counts, then the pooled two-proportion z with the
    // engine's exact parenthesization (IEEE ops are correctly rounded, so
    // matching order = matching bits)
    "events_ab_test" ->
      ("WITH u AS (SELECT user_id, " +
       "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv, " +
       "CASE WHEN user_id % 3 = 0 THEN 'control' " +
       "WHEN user_id % 3 = 1 THEN 'treat_a' ELSE 'treat_b' END AS variant " +
       "FROM events GROUP BY user_id), " +
       "per AS (SELECT variant, count(*) AS n, CAST(sum(conv) AS BIGINT) AS conv " +
       "FROM u GROUP BY variant), " +
       "ctl AS (SELECT variant AS control, n AS n_ctrl, conv AS conv_ctrl " +
       "FROM per ORDER BY variant LIMIT 1), " +
       "j AS (SELECT per.variant, ctl.control, ctl.n_ctrl, ctl.conv_ctrl, " +
       "per.n AS n_var, per.conv AS conv_var, " +
       "CAST(conv_ctrl AS DOUBLE) / n_ctrl AS pc, " +
       "CAST(per.conv AS DOUBLE) / per.n AS pv, " +
       "CAST(ctl.conv_ctrl + per.conv AS DOUBLE) / (ctl.n_ctrl + per.n) AS pool " +
       "FROM per, ctl WHERE per.variant <> ctl.control), " +
       "z AS (SELECT *, sqrt(pool * (1.0 - pool) * " +
       "(1.0 / n_ctrl + 1.0 / n_var)) AS se FROM j) " +
       "SELECT variant, control, n_ctrl, conv_ctrl, n_var, conv_var, " +
       "CAST(round(pc * 1000000.0) AS BIGINT) AS rate_ctrl_micro, " +
       "CAST(round(pv * 1000000.0) AS BIGINT) AS rate_var_micro, " +
       "CAST(round((pv - pc) * 1000000.0) AS BIGINT) AS lift_micro, " +
       "CASE WHEN se > 0.0 THEN CAST(round(((pv - pc) / se) * 1000000.0) AS BIGINT) " +
       "END AS z_micro " +
       "FROM z ORDER BY variant"),

    "graph_lpa" -> LpaOracle(3),

    // first significant digit from the DECIMAL(38,2) rendering (exact,
    // engine-stable; widened from (18,2) so |v| >= 1e16 audits don't
    // overflow — the r16 ADVICE item), 9-row grid, expected micro table
    // interpolated from the engine's own BenfordExpectedMicro constant
    "dq_benford" ->
      ("WITH d AS (SELECT regexp_replace(CAST(CAST(o_totalprice AS DECIMAL(38,2)) " +
       "AS VARCHAR), '[^1-9]', '', 'g') AS sig FROM orders " +
       "WHERE o_totalprice IS NOT NULL), " +
       "c AS (SELECT CAST(substr(sig, 1, 1) AS INTEGER) AS digit, count(*) AS n " +
       "FROM d WHERE sig <> '' GROUP BY 1), " +
       "grid AS (SELECT * FROM (VALUES " +
       graft.operators.Checks.BenfordExpectedMicro
         .map { case (dg, e) => s"($dg, $e)" }.mkString(", ") +
       ") AS g(digit, exp_micro)), " +
       "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c), " +
       "j AS (SELECT g.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n, " +
       "CASE WHEN t.total > 0 THEN CAST(round(coalesce(c.n, 0) * 1000000.0 / t.total) " +
       "AS BIGINT) ELSE 0 END AS obs_micro, CAST(g.exp_micro AS BIGINT) AS exp_micro " +
       "FROM grid g LEFT JOIN c USING (digit), t) " +
       "SELECT digit, n, obs_micro, exp_micro, obs_micro - exp_micro AS dev_micro " +
       "FROM j ORDER BY digit"),

    // psi_cat's domain machinery, Pearson homogeneity terms — each term
    // quantized once so the statistic is the exact long sum of the rows
    "dq_drift_chi2" ->
      ("WITH rc AS (SELECT source AS category, count(*) AS cnt FROM documents " +
       "WHERE source IS NOT NULL GROUP BY 1), " +
       "top AS (SELECT category FROM (SELECT category, row_number() OVER " +
       "(ORDER BY cnt DESC, category ASC) AS rn FROM rc) WHERE rn <= 5), " +
       "cur AS (SELECT CASE WHEN doc_id % 5 = 0 THEN 'crawl_v2' ELSE source END " +
       "AS source FROM documents), " +
       "labr AS (SELECT CASE WHEN source IS NULL THEN '__null__' " +
       "WHEN source IN (SELECT category FROM top) THEN source " +
       "ELSE '__other__' END AS category FROM documents), " +
       "labc AS (SELECT CASE WHEN source IS NULL THEN '__null__' " +
       "WHEN source IN (SELECT category FROM top) THEN source " +
       "ELSE '__other__' END AS category FROM cur), " +
       "grid AS (SELECT category FROM top UNION ALL SELECT '__other__' " +
       "UNION ALL SELECT '__null__'), " +
       "r2 AS (SELECT category, count(*) AS ref_cnt FROM labr GROUP BY 1), " +
       "c2 AS (SELECT category, count(*) AS cur_cnt FROM labc GROUP BY 1), " +
       "tot AS (SELECT (SELECT count(*) FROM documents) AS rn, " +
       "(SELECT count(*) FROM cur) AS cn), " +
       "j AS (SELECT g.category, coalesce(r2.ref_cnt, 0) AS ref_cnt, " +
       "coalesce(c2.cur_cnt, 0) AS cur_cnt, tot.rn, tot.cn " +
       "FROM grid g LEFT JOIN r2 USING (category) LEFT JOIN c2 USING (category), tot), " +
       "j2 AS (SELECT category, ref_cnt, cur_cnt, " +
       "(CAST(ref_cnt + cur_cnt AS DOUBLE) * rn) / CAST(rn + cn AS DOUBLE) AS er, " +
       "(CAST(ref_cnt + cur_cnt AS DOUBLE) * cn) / CAST(rn + cn AS DOUBLE) AS ec " +
       "FROM j) " +
       "SELECT category, CAST(ref_cnt AS BIGINT) AS ref_cnt, " +
       "CAST(cur_cnt AS BIGINT) AS cur_cnt, " +
       "CASE WHEN ref_cnt + cur_cnt = 0 THEN 0 ELSE " +
       "CAST(round((((ref_cnt - er) * (ref_cnt - er)) / er + " +
       "((cur_cnt - ec) * (cur_cnt - ec)) / ec) * 1000000.0) AS BIGINT) END " +
       "AS chi2_term_micro FROM j2 ORDER BY category"),

    // distinct user-days → trailing-window contribution explode →
    // distinct fold → day count
    "events_rolling_wau" ->
      ("WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day " +
       "FROM events), " +
       "b AS (SELECT max(day) AS hi FROM a), " +
       "g AS (SELECT user_id, unnest(range(day, least(day + 7, hi + 1))) AS td " +
       "FROM a, b), " +
       "d2 AS (SELECT DISTINCT user_id, td FROM g) " +
       "SELECT td AS day, count(*) AS active_users FROM d2 GROUP BY td " +
       "ORDER BY day"),

    // planted shift, dense day axis, integer n-scaled CUSUM, argmax with
    // the smallest-day tiebreak, one normalized quantization
    "events_changepoint_cusum" ->
      ("WITH ev AS (SELECT CASE WHEN epoch_us(ts) >= 1705708800000000 " +
       "AND event_type = 'view' THEN 'click' ELSE event_type END AS grp, " +
       "epoch_us(ts) // 86400000000 AS day FROM events), " +
       "d AS (SELECT grp, day, count(*) AS y FROM ev GROUP BY 1, 2), " +
       "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), " +
       "g AS (SELECT grp, lo, hi FROM (SELECT DISTINCT grp FROM d), b), " +
       "grid AS (SELECT grp, lo, hi - lo + 1 AS n_days, " +
       "unnest(range(0, hi - lo + 1)) AS x FROM g), " +
       "j AS (SELECT grid.grp, grid.x, grid.n_days, grid.lo, coalesce(d.y, 0) AS y " +
       "FROM grid LEFT JOIN d ON d.grp = grid.grp AND d.day = grid.lo + grid.x), " +
       "c AS (SELECT grp, x, n_days, lo, " +
       "sum(y) OVER (PARTITION BY grp ORDER BY x) AS cum, " +
       "sum(y) OVER (PARTITION BY grp) AS total FROM j), " +
       "sx AS (SELECT grp, x, n_days, lo, total, " +
       "abs(n_days * cum - (x + 1) * total) AS s FROM c), " +
       "pick AS (SELECT grp, n_days, lo, total, s, x, row_number() OVER " +
       "(PARTITION BY grp ORDER BY s DESC, x ASC) AS rk FROM sx) " +
       "SELECT grp AS \"group\", CAST(n_days AS BIGINT) AS n_days, " +
       "CAST(total AS BIGINT) AS total, " +
       "CASE WHEN total > 0 THEN CAST(lo + x AS BIGINT) END AS change_day, " +
       "CAST(s AS BIGINT) AS cusum_peak, " +
       "CASE WHEN total > 0 THEN " +
       "CAST(round((s * 1000000.0) / (n_days * total)) AS BIGINT) END " +
       "AS peak_micro FROM pick WHERE rk = 1 ORDER BY \"group\""),

    // dense zero-filled day axis over the log's global span, then the
    // four integer OLS sums and one division per group
    "events_trend_slope" ->
      ("WITH d AS (SELECT event_type AS grp, epoch_us(ts) // 86400000000 AS day, " +
       "count(*) AS y FROM events GROUP BY 1, 2), " +
       "b AS (SELECT min(day) AS lo, max(day) AS hi FROM d), " +
       "g AS (SELECT grp, lo, hi FROM (SELECT DISTINCT grp FROM d), b), " +
       "grid AS (SELECT grp, lo, unnest(range(0, hi - lo + 1)) AS x FROM g), " +
       "j AS (SELECT grid.grp, grid.x, coalesce(d.y, 0) AS y FROM grid " +
       "LEFT JOIN d ON d.grp = grid.grp AND d.day = grid.lo + grid.x), " +
       "s AS (SELECT grp, count(*) AS n_days, sum(y) AS total, sum(x) AS sx, " +
       "sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx FROM j GROUP BY grp) " +
       "SELECT grp AS \"group\", CAST(n_days AS BIGINT) AS n_days, " +
       "CAST(total AS BIGINT) AS total, " +
       "CASE WHEN n_days * sxx - sx * sx <> 0 THEN " +
       "CAST(round((CAST(n_days * sxy - sx * sy AS DOUBLE) * 1000000.0) / " +
       "(n_days * sxx - sx * sx)) AS BIGINT) END AS slope_micro " +
       "FROM s ORDER BY \"group\""),

    "graph_ppr" -> pprOracle(3))

  /** The [[Retrieval.bm25TopK]] oracle chain (documents corpus, ÷100≡3
    * first-5-token queries), ending at `ranked` (all candidates with
    * per-query ranks) so both the standalone bm25 query and the hybrid
    * RRF fusion share ONE re-derivation — a k filter is all that
    * differs. (A `def`, not a `val`: the oracle map above initializes
    * first and would capture a null field.) */
  private def Bm25Ctes: String =
    "tok AS (SELECT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS term " +
    "FROM documents), " +
    "tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''), " +
    "tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term), " +
    "dl AS (SELECT doc_id, count(*) AS dl FROM tok2 GROUP BY doc_id), " +
    "consts AS (SELECT (SELECT count(*) FROM documents) AS n_docs, " +
    "(SELECT CAST(sum(dl) AS DOUBLE) FROM dl) / (SELECT count(*) FROM documents) " +
    "AS avgdl), " +
    "dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
    "idf AS (SELECT term, CAST(round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) " +
    "* 1e6) AS BIGINT) AS idf_micro, avgdl FROM dfc CROSS JOIN consts), " +
    "qdocs AS (SELECT doc_id AS query_id, regexp_split_to_array(text, '\\s+') AS ts " +
    "FROM documents WHERE doc_id % 100 = 3), " +
    "qterms AS (SELECT DISTINCT query_id, term FROM " +
    "(SELECT query_id, unnest(ts[1:5]) AS term FROM qdocs) WHERE term <> '' " +
    "AND term IS NOT NULL), " +
    "qstats AS (SELECT q.query_id, q.term, i.idf_micro, i.avgdl FROM qterms q " +
    "JOIN idf i USING (term)), " +
    "scored AS (SELECT s.query_id, t.doc_id, " +
    "CAST(round(CAST(s.idf_micro AS DOUBLE) * ((t.tf * 2.2) / " +
    "(t.tf + 1.2 * (0.25 + 0.75 * (d.dl / s.avgdl))))) AS BIGINT) AS tsm " +
    "FROM tf t JOIN qstats s USING (term) JOIN dl d ON d.doc_id = t.doc_id), " +
    "agg AS (SELECT query_id, doc_id, CAST(sum(tsm) AS BIGINT) AS score_micro " +
    "FROM scored GROUP BY query_id, doc_id), " +
    "ranked AS (SELECT query_id, doc_id, score_micro, row_number() OVER " +
    "(PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rank FROM agg)"
}
