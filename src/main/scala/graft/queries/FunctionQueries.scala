package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft._
import graft.sources.Tables

/** Window-function and scalar-function declared queries (SURVEY.md §2.2 e/h/j).
  * Same determinism rules as [[RelationalQueries]]; additionally every window
  * ORDER BY carries a unique tiebreaker so rank/lag/frames are reproducible,
  * and cross-engine-unstable functions (libm pow/log/exp, HLL) are either
  * avoided or rounded. */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, name: String): MetaFrame =
    Tables.loadMeta(s, dir, name)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------ e) window functions
    "win_rank_topk" -> ((s, d) => {
      // per-group top-5 by price; row_number tiebroken on the unique line key,
      // rank/dense_rank defined purely by the (tied) price value
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_returnflag", "rn").df
    }),

    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
      t(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .select("o_custkey", "o_orderkey", "o_totalprice", "prev_price", "next_price")
        .orderBy("o_custkey", "o_orderkey").df
    }),

    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .withColumn("running_total", sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey").df
    }),

    "win_moving_avg" -> ((s, d) => {
      // moving avg as exact-decimal windowed sum / windowed count: immune to
      // float re-association differences in either engine's window executor
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "orders")
        .withColumn("mov_avg",
          (sum(dec(col("o_totalprice"))).over(w).cast("double") / count(lit(1)).over(w)))
        .select("o_custkey", "o_orderkey", "mov_avg")
        .orderBy("o_custkey", "o_orderkey").df
    }),

    "win_rank_variants" -> ((s, d) => {
      // rank/dense_rank/percent_rank/cume_dist are functions of the order-by
      // VALUE only, so ties need no tiebreaker to be deterministic
      val w = Window.partitionBy(col("l_returnflag")).orderBy(asc("l_quantity"))
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
        .withColumn("rk", rank().over(w).cast("long"))
        .withColumn("drk", dense_rank().over(w).cast("long"))
        .withColumn("pr", round(percent_rank().over(w), 6))
        .select("l_returnflag", "l_quantity", "n", "rk", "drk", "pr")
        .orderBy("l_returnflag", "l_quantity").df
    }),

    "win_value_functions" -> ((s, d) => {
      // first/last/nth_value need the full-partition frame to be
      // order-insensitive (default frame stops at CURRENT ROW for last)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .withColumn("last_price", last(col("o_totalprice")).over(w))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .select("o_custkey", "o_orderkey", "first_price", "last_price", "second_price")
        .orderBy("o_custkey", "o_orderkey").df
    }),

    "win_range_frame" -> ((s, d) => {
      // RANGE frame over the numeric order value (not row offsets): counts
      // lines whose quantity lies within 5 units below the current one
      val w = Window.partitionBy(col("l_returnflag")).orderBy(asc("l_quantity"))
        .rangeBetween(-5, 0)
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("n"))
        .withColumn("n_within5", sum(col("n")).over(w).cast("long"))
        .select("l_returnflag", "l_quantity", "n", "n_within5")
        .orderBy("l_returnflag", "l_quantity").df
    }),

    // custom Aggregator UDAF (SURVEY §2.2k): weighted mean via typed
    // Aggregator with map-side partial aggregation; rounded because double
    // summation order differs across engines (ratio is stable to ~1e-11)
    "agg_weighted_udaf" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(graft.functions.Udafs.weightedMean(
          col("l_extendedprice"), col("l_quantity")), 4).as("w_avg_price"))
        .orderBy("l_returnflag").df),

    // grouped top-k via the bounded TypedImperativeAggregate (O(k) state,
    // map-side partials forward <= k candidates per group) — same result
    // contract as the window formulation, so it shares a row_number oracle;
    // ties break on the lowest doc_id, the repo-wide total order
    "agg_grouped_topk" -> ((s, d) => {
      import graft.expressions.TopKAgg.topKByScore
      t(s, d, "documents").df
        .groupBy("lang")
        .agg(topKByScore(struct(col("n_chars").cast("double"), col("doc_id")), 3).as("topk"))
        .select(col("lang"), posexplode(col("topk")))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("doc_id"), col("col.score").cast("long").as("n_chars"))
        .orderBy("lang", "rank")
    }),

    // ------------------------------------------------- h) scalar functions
    "fn_string" -> ((s, d) =>
      t(s, d, "part")
        .withColumn("up_name", upper(col("p_name")))
        .withColumn("name_len", length(col("p_name")).cast("long"))
        .withColumn("type5", substring(col("p_type"), 1, 5))
        .withColumn("brand_type", concat(col("p_brand"), lit("_"), col("p_type")))
        .withColumn("n_tokens", size(split(col("p_name"), " ")).cast("long"))
        .withColumn("brand_num", regexp_extract(col("p_brand"), "#(\\d+)", 1))
        .withColumn("padded", lpad(col("p_brand"), 12, "*"))
        .select("p_partkey", "up_name", "name_len", "type5", "brand_type",
                "n_tokens", "brand_num", "padded")
        .orderBy("p_partkey").df),

    "fn_date" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("o_date", to_date(col("o_orderdate")))
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .withColumn("dom", dayofmonth(col("o_orderdate")))
        .withColumn("month_start", to_date(date_trunc("month", col("o_orderdate"))))
        .withColumn("days_since", datediff(to_date(col("o_orderdate")), lit("2020-01-01")))
        .withColumn("plus30", date_add(to_date(col("o_orderdate")), 30))
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
        .select("o_orderkey", "o_date", "yr", "mo", "dom", "month_start",
                "days_since", "plus30", "epoch_s")
        .orderBy("o_orderkey").df),

    "fn_math" -> ((s, d) =>
      t(s, d, "lineitem")
        .withColumn("r1", round(col("l_extendedprice"), 1))
        .withColumn("absd", abs(col("l_discount") - 0.05))
        .withColumn("sq", sqrt(col("l_quantity")))
        .withColumn("fl", floor(col("l_extendedprice")).cast("double"))
        .withColumn("ce", ceil(col("l_extendedprice")).cast("double"))
        .withColumn("tax_sq", col("l_tax") * col("l_tax"))
        .withColumn("sgn", signum(col("l_discount") - 0.05))
        .select("l_orderkey", "l_linenumber", "r1", "absd", "sq", "fl", "ce", "tax_sq", "sgn")
        .orderBy("l_orderkey", "l_linenumber").df),

    "fn_conditional" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("seg",
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .withColumn("mkt_or_other", coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")))
        .withColumn("bal_floor0", greatest(col("c_acctbal"), lit(0.0)))
        .withColumn("bal_cap100", least(col("c_acctbal"), lit(100.0)))
        .select("c_custkey", "seg", "mkt_or_other", "bal_floor0", "bal_cap100")
        .orderBy("c_custkey").df),

    "fn_array" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("dim", size(col("embedding")))
        .withColumn("first_val", element_at(col("embedding"), 1).cast("double"))
        .withColumn("emb_sum",
          round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")), 4))
        .select("vec_id", "dim", "first_val", "emb_sum")
        .orderBy("vec_id").df),

    // higher-order functions over arrays (SURVEY §2.2h): transform / filter /
    // exists / zip_with — all row-local, no UDF, fully pushdown-friendly
    "fn_higher_order" -> ((s, d) =>
      t(s, d, "embeddings")
        .withColumn("n_pos", size(filter(col("embedding"), x => x > 0)).cast("long"))
        .withColumn("any_big", exists(col("embedding"), x => x > lit(2.0f)))
        .withColumn("l1", round(aggregate(transform(col("embedding"), x => abs(x.cast("double"))),
          lit(0.0), (acc, x) => acc + x), 4))
        .withColumn("self_dot", round(aggregate(
          zip_with(col("embedding"), col("embedding"), (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x), 4))
        .select("vec_id", "n_pos", "any_big", "l1", "self_dot")
        .orderBy("vec_id").df),

    // generator/UDTF family (SURVEY §2.2k): explode a split-token array into
    // rows, aggregate token frequencies
    "fn_explode_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(split(col("text"), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("token"))
        .limit(20).df),

    // map construction/access (SURVEY §2.2h map family): output scalars only
    // (map columns don't hash portably) — DuckDB oracle via equivalent scalars
    "fn_map" -> ((s, d) =>
      t(s, d, "customer")
        .withColumn("m", map(lit("bal"), col("c_acctbal"), lit("bal2"), col("c_acctbal") * 2))
        .select(
          col("c_custkey"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          element_at(col("m"), "bal").as("bal"),
          element_at(col("m"), "bal2").as("bal2"))
        .orderBy("c_custkey").df),

    // seeded Bernoulli sample: the kept-row SET is engine-specific (Spark
    // seeds per partition), but the statistical contract is checkable — the
    // property oracle pins the exact source count (DuckDB-computable) and a
    // 5-sigma binomial bound on the sample size that any correct Bernoulli
    // sampler passes regardless of seed or partitioning
    "misc_sample_seeded" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val nSamp = orders.sample(0.1, seed = 42L).df.agg(count(lit(1)).as("n_sampled"))
      orders.df.agg(count(lit(1)).as("n_source"))
        .crossJoin(nSamp)
        .select(
          col("n_source"),
          (abs(col("n_sampled").cast("double") - col("n_source").cast("double") * 0.1) <=
            lit(5.0) * sqrt(col("n_source").cast("double") * 0.09))
            .cast("long").as("size_ok"))
    }),

    "fn_json" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .select("event_id", "k")
        .orderBy("event_id").df),

    "fn_na_fill" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("v_null", when(col("value") >= 10, col("value")))
        .na.fill(0.0, Seq("v_null")) // metadata-preserving facade (SURVEY §7.3)
        .select("event_id", "v_null")
        .orderBy("event_id").df),

    // ------------------------------------------- j) streaming (batch mode)
    "stream_tumbling_window" -> ((s, d) =>
      // tumbling 1-hour window over event time; identical groupBy(window(...))
      // works unchanged on a readStream source (see graft.streaming)
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
             sum(dec(col("value"))).cast("double").as("sum_value"))
        // ntz keeps the parquet type naive-microsecond, matching DuckDB exactly
        .select(col("window.start").cast("timestamp_ntz").as("wstart"),
                col("n_events"), col("sum_value"))
        .orderBy("wstart").df),

    "stream_session_like" -> ((s, d) =>
      // per-user-per-day activity rollup (the batch shape of a session agg)
      t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
             min(col("event_id")).as("first_event"),
             max(col("event_id")).as("last_event"))
        .orderBy("user_id", "day").df),

    // Spark's native session_window (gap-merged [first_ts, last_ts+gap)
    // sessions) through the SAME operator the streaming path uses —
    // EliminateEventTimeWatermark strips the watermark in batch, so this
    // declared query runs graft.streaming.Streams.sessionWindowAgg
    // verbatim; DuckDB re-derives sessions by gap-based island labeling
    // (a strictly-overlapping window merges: a gap of EXACTLY 1h starts a
    // new session — half-open intervals)
    "stream_session_window" -> ((s, d) =>
      graft.streaming.Streams.sessionWindowAgg(
          t(s, d, "events").df, "ts", gap = "1 hour", watermark = "2 hours")
        .select(col("sstart").cast("timestamp_ntz").as("sstart"),
          col("send").cast("timestamp_ntz").as("send"),
          col("user_id"), col("n_events"))
        .orderBy("user_id", "sstart")),

    "stream_sliding_window" -> ((s, d) =>
      // 2-hour window sliding every hour: each event lands in exactly two
      // epoch-aligned windows; same groupBy(window(...)) runs on readStream
      t(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n_events"),
             sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(col("window.start").cast("timestamp_ntz").as("wstart"),
                col("window.end").cast("timestamp_ntz").as("wend"),
                col("n_events"), col("sum_value"))
        .orderBy("wstart").df),

    // sketch-based percentile (Greenwald-Khanna): the estimate itself is
    // engine-specific, so the property oracle pins the exact interpolated
    // percentiles (DuckDB quantile_cont, the agg_percentile_exact parity
    // rule) plus a 5% relative-error flag on the sketch — accuracy=1000
    // bounds rank error to N/1000, far inside 5% of value on this data.
    // Percentiles travel as scalar doubles: the harness canonicalizes by
    // sorting column values and cannot hash array cells.
    "agg_approx_percentile" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 1000)").as("p_approx"),
          expr("percentile(l_extendedprice, array(0.5, 0.9))").as("p_exact"))
        .select(
          col("l_returnflag"),
          round(element_at(col("p_exact"), 1), 4).as("p50_exact"),
          round(element_at(col("p_exact"), 2), 4).as("p90_exact"),
          (abs(element_at(col("p_approx"), 1) - element_at(col("p_exact"), 1)) <=
            element_at(col("p_exact"), 1) * 0.05).cast("long").as("p50_ok"),
          (abs(element_at(col("p_approx"), 2) - element_at(col("p_exact"), 2)) <=
            element_at(col("p_exact"), 2) * 0.05).cast("long").as("p90_ok"))
        .orderBy("l_returnflag").df),

    // exact interpolated percentiles (SURVEY §2.2d stats family) — rounded
    // because the two engines interpolate with differently-ordered float ops
    "agg_percentile_exact" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90"))
        .orderBy("l_returnflag").df),
  )

  val oracleSql: Map[String, String] = Map(
    "win_rank_topk" ->
      ("SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (" +
       "SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, " +
       "row_number() OVER (PARTITION BY l_returnflag " +
       "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn FROM lineitem) " +
       "WHERE rn <= 5 ORDER BY l_returnflag, rn"),

    "win_lag_lead" ->
      ("SELECT o_custkey, o_orderkey, o_totalprice, " +
       "lag(o_totalprice, 1) OVER w AS prev_price, " +
       "lead(o_totalprice, 1) OVER w AS next_price FROM orders " +
       "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) " +
       "ORDER BY o_custkey, o_orderkey"),

    "win_running_sum" ->
      ("SELECT o_custkey, o_orderkey, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER " +
       "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total " +
       "FROM orders ORDER BY o_custkey, o_orderkey"),

    "win_moving_avg" ->
      ("SELECT o_custkey, o_orderkey, " +
       "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / " +
       "COUNT(*) OVER w AS mov_avg FROM orders " +
       "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
       "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) " +
       "ORDER BY o_custkey, o_orderkey"),

    "win_rank_variants" ->
      ("SELECT l_returnflag, l_quantity, n, " +
       "rank() OVER w AS rk, dense_rank() OVER w AS drk, " +
       "round(percent_rank() OVER w, 6) AS pr FROM (" +
       "SELECT l_returnflag, l_quantity, count(*) AS n FROM lineitem " +
       "GROUP BY l_returnflag, l_quantity) " +
       "WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity) " +
       "ORDER BY l_returnflag, l_quantity"),

    "agg_weighted_udaf" ->
      ("SELECT l_returnflag, round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) " +
       "AS w_avg_price FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    // the bounded top-k aggregate shares the window formulation's oracle:
    // identical (score desc, id asc) total order
    "agg_grouped_topk" ->
      ("WITH r AS (SELECT lang, doc_id, n_chars, " +
       "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rank FROM documents) " +
       "SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_chars " +
       "FROM r WHERE rank <= 3 ORDER BY lang, rank"),

    "fn_string" ->
      ("SELECT p_partkey, upper(p_name) AS up_name, length(p_name) AS name_len, " +
       "substring(p_type, 1, 5) AS type5, concat(p_brand, '_', p_type) AS brand_type, " +
       "len(string_split(p_name, ' ')) AS n_tokens, " +
       "regexp_extract(p_brand, '#(\\d+)', 1) AS brand_num, " +
       "lpad(p_brand, 12, '*') AS padded " +
       "FROM part ORDER BY p_partkey"),

    "fn_date" ->
      ("SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date, " +
       "CAST(year(o_orderdate) AS INTEGER) AS yr, " +
       "CAST(month(o_orderdate) AS INTEGER) AS mo, " +
       "CAST(day(o_orderdate) AS INTEGER) AS dom, " +
       "CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start, " +
       "CAST(date_diff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since, " +
       "CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30, " +
       "CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s " +
       "FROM orders ORDER BY o_orderkey"),

    "fn_math" ->
      ("SELECT l_orderkey, l_linenumber, round(l_extendedprice, 1) AS r1, " +
       "abs(l_discount - 0.05) AS absd, sqrt(l_quantity) AS sq, " +
       "floor(l_extendedprice) AS fl, ceil(l_extendedprice) AS ce, " +
       "l_tax * l_tax AS tax_sq, CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn " +
       "FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    "fn_conditional" ->
      ("SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'neg' " +
       "WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS seg, " +
       "coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS mkt_or_other, " +
       "greatest(c_acctbal, 0.0) AS bal_floor0, least(c_acctbal, 100.0) AS bal_cap100 " +
       "FROM customer ORDER BY c_custkey"),

    "fn_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim, " +
       "CAST(embedding[1] AS DOUBLE) AS first_val, " +
       "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS emb_sum " +
       "FROM embeddings ORDER BY vec_id"),

    "fn_explode_tokens" ->
      ("SELECT token, count(*) AS n FROM (SELECT unnest(regexp_split_to_array(text, '\\s+')) " +
       "AS token FROM documents) GROUP BY token ORDER BY n DESC, token LIMIT 20"),

    "fn_higher_order" ->
      ("SELECT vec_id, CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos, " +
       "len(list_filter(embedding, x -> x > 2.0)) > 0 AS any_big, " +
       "round(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4) AS l1, " +
       "round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS self_dot " +
       "FROM embeddings ORDER BY vec_id"),

    "fn_map" ->
      ("SELECT c_custkey, CAST(2 AS BIGINT) AS n_keys, c_acctbal AS bal, " +
       "c_acctbal * 2 AS bal2 FROM customer ORDER BY c_custkey"),

    "fn_json" ->
      ("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k " +
       "FROM events ORDER BY event_id"),

    "misc_sample_seeded" ->
      "SELECT count(*) AS n_source, CAST(1 AS BIGINT) AS size_ok FROM orders",

    "fn_na_fill" ->
      ("SELECT event_id, coalesce(CASE WHEN value >= 10 THEN value END, 0.0) AS v_null " +
       "FROM events ORDER BY event_id"),

    "stream_tumbling_window" ->
      ("SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart, count(*) AS n_events, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
       "FROM events GROUP BY 1 ORDER BY 1"),

    "stream_session_like" ->
      ("SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n, " +
       "min(event_id) AS first_event, max(event_id) AS last_event " +
       "FROM events GROUP BY user_id, CAST(ts AS DATE) ORDER BY user_id, day"),

    "stream_session_window" ->
      ("WITH l AS (SELECT user_id, ts, CASE WHEN " +
       "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL OR " +
       "ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts) + INTERVAL 1 HOUR " +
       "THEN 1 ELSE 0 END AS brk FROM events), " +
       "g AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
       "ROWS UNBOUNDED PRECEDING) AS sid FROM l) " +
       "SELECT min(ts) AS sstart, max(ts) + INTERVAL 1 HOUR AS send, user_id, " +
       "count(*) AS n_events FROM g GROUP BY user_id, sid ORDER BY user_id, sstart"),

    "win_value_functions" ->
      ("SELECT o_custkey, o_orderkey, " +
       "first_value(o_totalprice) OVER w AS first_price, " +
       "last_value(o_totalprice) OVER w AS last_price, " +
       "nth_value(o_totalprice, 2) OVER w AS second_price FROM orders " +
       "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey " +
       "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) " +
       "ORDER BY o_custkey, o_orderkey"),

    "win_range_frame" ->
      ("SELECT l_returnflag, l_quantity, n, " +
       "CAST(SUM(n) OVER (PARTITION BY l_returnflag ORDER BY l_quantity " +
       "RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_within5 FROM (" +
       "SELECT l_returnflag, l_quantity, count(*) AS n FROM lineitem " +
       "GROUP BY l_returnflag, l_quantity) " +
       "ORDER BY l_returnflag, l_quantity"),

    "stream_sliding_window" ->
      ("SELECT CAST(wstart AS TIMESTAMP) AS wstart, " +
       "CAST(wstart + INTERVAL 2 HOUR AS TIMESTAMP) AS wend, " +
       "count(*) AS n_events, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value FROM (" +
       "SELECT unnest([date_trunc('hour', ts), date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS wstart, value " +
       "FROM events) GROUP BY wstart ORDER BY wstart"),

    "agg_percentile_exact" ->
      ("SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.25), 4) AS p25, " +
       "round(quantile_cont(l_extendedprice, 0.5), 4) AS p50, " +
       "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90 " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "agg_approx_percentile" ->
      ("SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact, " +
       "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_exact, " +
       "CAST(1 AS BIGINT) AS p50_ok, CAST(1 AS BIGINT) AS p90_ok " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
  )
}
