package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft._
import graft.sources.Tables

/** Declared relational queries (SURVEY.md §2.2 "DQ" column) with DuckDB oracle
  * SQL. Determinism rules (FIXTURES.md caveats):
  *   - every query has a total ORDER BY on a unique key combination;
  *   - double sums go through `DECIMAL(18,2)` (exact, order-independent) and
  *     back to double, identically on both engines;
  *   - averages are written as exact-decimal sum / count;
  *   - no nullable sort keys unless NULLS FIRST is explicit on both sides.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): MetaFrame =
    Tables.loadMeta(s, dir, name)

  /** Exact decimal sum of a double column, returned as double — matches
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)` in DuckDB bit-for-bit. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------ a) scans
    "scan_parquet" -> ((s, d) =>
      t(s, d, "region").orderBy("r_regionkey").df),

    // CSV/JSON scan parity: the table round-trips through the text format
    // (distributed write, explicit-schema FAILFAST scan back) and must
    // still match the DuckDB PARQUET truth bit-for-bit — doubles included
    // (shortest-roundtrip rendering, correctly-rounded parse). Malformed-
    // row modes are pinned in SourcesSpec on handwritten bad rows.
    "scan_csv" -> ((s, d) =>
      Tables.scanCsv(s, d).orderBy("s_suppkey")),

    "scan_json" -> ((s, d) =>
      Tables.scanJson(s, d).orderBy("doc_id")),

    // the INFERRED-schema scan path (r18): inference samples the files,
    // classifies every column to a parseable type (exact inferred dtypes
    // pinned in SourcesSpec), and the cast-back scan must still match the
    // parquet truth bit-for-bit — proving the inferred types' parse lost
    // nothing
    "scan_csv_inferred" -> ((s, d) =>
      Tables.scanCsvInferred(s, d).orderBy("s_suppkey")),

    "sql_via_view" -> ((s, d) => {
      // SQL entry point: MetaFrame registers a temp view, spark.sql queries it
      t(s, d, "lineitem").createOrReplaceTempView("li_view")
      s.sql("""SELECT l_linestatus,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
               FROM li_view GROUP BY l_linestatus ORDER BY l_linestatus""")
    }),

    // ---------------------------------------------------- b) projections
    "project_select" -> ((s, d) =>
      t(s, d, "customer").select("c_custkey", "c_name").orderBy("c_custkey").df),

    "project_selectexpr" -> ((s, d) =>
      t(s, d, "orders")
        .selectExpr("o_orderkey", "o_totalprice * 0.1 AS tax10")
        .orderBy("o_orderkey").df),

    "project_withcolumn" -> ((s, d) =>
      t(s, d, "lineitem")
        .withColumn("disc_price", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .select("l_orderkey", "l_linenumber", "disc_price")
        .orderBy("l_orderkey", "l_linenumber").df),

    "project_rename" -> ((s, d) =>
      t(s, d, "nation")
        .withColumnRenamed("n_name", "nation_name")
        .select("n_nationkey", "nation_name")
        .orderBy("n_nationkey").df),

    "project_drop" -> ((s, d) =>
      t(s, d, "part")
        .drop("p_retailprice", "p_type")
        .orderBy("p_partkey").df),

    // ------------------------------------------------------- b) filters
    "filter_predicate" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 25 && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber").df),

    // --------------------------------------------------------- c) joins
    "join_inner" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey").df),

    "join_left" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey").df),

    "join_semi" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey").df),

    "join_anti" -> ((s, d) => {
      // anti against a filtered subset so the result is non-empty at every sf
      val bigLines = t(s, d, "lineitem").filter(col("l_quantity") > 45)
      t(s, d, "orders")
        .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select("o_orderkey")
        .orderBy("o_orderkey").df
    }),

    "join_right" -> ((s, d) =>
      // right outer: every customer appears, orders without a match null out
      t(s, d, "orders").filter(col("o_totalprice") > 150000)
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"), "right")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_big_orders"))
        .orderBy("c_custkey").df),

    "join_full_outer" -> ((s, d) => {
      // both sides keep unmatched rows: even-key customers vs big orders
      val evenCust = t(s, d, "customer")
        .filter(col("c_custkey") % 2 === 0)
        .select("c_custkey", "c_name")
      val bigOrders = t(s, d, "orders")
        .filter(col("o_totalprice") > 150000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      evenCust.join(bigOrders, col("c_custkey") === col("o_custkey"), "full")
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .orderBy(asc_nulls_first("c_custkey"), asc_nulls_first("o_orderkey")).df
    }),

    "join_cross" -> ((s, d) => {
      val r1 = t(s, d, "region").select(col("r_regionkey").as("r1"))
      val r2 = t(s, d, "region").select(col("r_regionkey").as("r2"))
      r1.crossJoin(r2).orderBy("r1", "r2").df
    }),

    "join_theta_range" -> ((s, d) => {
      // equi + range predicate: Catalyst plans the equi part as a hash join
      // and evaluates the range residual post-join (no cartesian product).
      val sup = t(s, d, "supplier")
      val cust = t(s, d, "customer")
      sup.join(cust,
          col("s_nationkey") === col("c_nationkey") && col("s_acctbal") < col("c_acctbal"),
          "inner")
        .groupBy("s_nationkey").agg(count(lit(1)).as("n_pairs"))
        .orderBy("s_nationkey").df
    }),

    "join_nonequi" -> ((s, d) => {
      // pure theta join (no equi conjunct): planned as a nested-loop join,
      // valid only when one side is tiny — here 25x25 nations
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("k1"), col("n_regionkey").as("r1"))
      val n2 = t(s, d, "nation").select(col("n_nationkey").as("k2"), col("n_regionkey").as("r2"))
      n1.join(n2, col("k1") < col("k2") && col("r1") =!= col("r2"), "inner")
        .groupBy("r1").agg(count(lit(1)).as("n_pairs"))
        .orderBy("r1").df
    }),

    "join_skew_salted" -> ((s, d) => {
      // salting changes the shuffle layout only — the oracle is the PLAIN
      // inner join, proving result invariance of the skew mitigation
      val li = t(s, d, "lineitem").df.select("l_orderkey", "l_suppkey", "l_quantity")
      val sup = t(s, d, "supplier").df.select("s_suppkey", "s_nationkey")
      graft.operators.SkewJoin
        .saltedInnerJoin(li.withColumnRenamed("l_suppkey", "s_suppkey"), sup, "s_suppkey", saltFactor = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("s_nationkey")
    }),

    "join_range_binned" -> ((s, d) => {
      // interval join via bin equi-key (RangeJoin): suppliers whose balance
      // falls inside each nation's customer-balance band — shuffled hash
      // join on the bin instead of a nested-loop scan
      val bands = t(s, d, "customer").df.groupBy("c_nationkey")
        .agg(min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
      val sup = t(s, d, "supplier").df.select(col("s_suppkey"), col("s_acctbal"))
      graft.operators.RangeJoin.pointInInterval(sup, "s_acctbal", bands, "lo", "hi", binWidth = 1000.0)
        .groupBy("c_nationkey").agg(count(lit(1)).as("n_in_band"))
        .orderBy("c_nationkey")
    }),

    "join_interval_overlap" -> ((s, d) => {
      // interval×interval overlap via the once-per-pair bin equi-key
      // (RangeJoin.intervalOverlap): per-user-day activity spans against
      // per-type-day activity spans — which users were active while each
      // event type was live that day. Exact integer micros; 6h bins.
      val base = t(s, d, "events").df
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("day", expr("us div 86400000000"))
      val a = base.groupBy(col("user_id"), col("day").as("a_day"))
        .agg(min(col("us")).as("a_lo"), max(col("us")).as("a_hi"))
      val b = base.groupBy(col("event_type"), col("day").as("b_day"))
        .agg(min(col("us")).as("b_lo"), max(col("us")).as("b_hi"))
      graft.operators.RangeJoin
        .intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", 21600000000.0)
        .select("user_id", "a_day", "event_type", "b_day",
          "a_lo", "a_hi", "b_lo", "b_hi")
        .orderBy("user_id", "a_day", "event_type", "b_day")
    }),

    "join_asof_tolerance" -> ((s, d) => {
      // the bounded-lookback as-of: matches older than 2h are nulled —
      // the enrichment semantics when stale context is worse than none
      val events = t(s, d, "events").df
        .withColumn("ts", col("ts").cast("timestamp"))
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("value").as("pval"))
      graft.operators.AsOfJoin.backward(
          events.select("event_id", "user_id", "ts"), purchases,
          keyCol = "user_id", leftTsCol = "ts", rightTsCol = "pts",
          payloadCols = Seq("pval"), tolerance = Some(7200L))
        .select("event_id", "asof_pval")
        .orderBy("event_id")
    }),

    "join_asof" -> ((s, d) => {
      // as-of backward join (operator absent from the reference surface):
      // each event picks up the user's most recent purchase value at-or-before ts
      val events = t(s, d, "events").df
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("value").as("pval"))
      graft.operators.AsOfJoin.backward(
          events.select("event_id", "user_id", "ts"), purchases,
          keyCol = "user_id", leftTsCol = "ts", rightTsCol = "pts",
          payloadCols = Seq("pval"))
        .select("event_id", "asof_pval")
        .orderBy("event_id")
    }),

    // hot-key variant under the SAME DuckDB ASOF oracle: the (key, time
    // bucket) window + carry-in stitch must reproduce backward exactly
    // (equivalence also pinned across bucket widths in AdviceRegressionSpec)
    "join_asof_bucketed" -> ((s, d) => {
      val events = t(s, d, "events").df
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"), col("value").as("pval"))
      graft.operators.AsOfJoin.backwardBucketed(
          events.select("event_id", "user_id", "ts"), purchases,
          keyCol = "user_id", leftTsCol = "ts", rightTsCol = "pts",
          payloadCols = Seq("pval"), bucketWidth = 3600L)
        .select("event_id", "asof_pval")
        .orderBy("event_id")
    }),

    // --------------------------------------------------- d) aggregations
    "agg_groupby_sum" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag").df),

    "agg_multi" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus").df),

    "agg_shorthand_count" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy("o_orderpriority").count()
        .orderBy("o_orderpriority").df),

    "agg_global" -> ((s, d) =>
      t(s, d, "lineitem")
        .agg(
          count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice")).as("total_price"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty")).df),

    "agg_distinct_count" -> ((s, d) =>
      t(s, d, "lineitem")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part")).df),

    // HLL++ estimates are engine-specific, so the property oracle checks the
    // estimate against the exact NDV (DuckDB-computable) with a 3-sigma
    // relative-error bound (default rsd 0.05 → 0.15 flag floor;
    // deterministic for a fixed input).
    "agg_approx_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .agg(
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_orderkey")).as("approx_orders"))
        .select(
          col("exact_orders"),
          (abs(col("approx_orders") - col("exact_orders")).cast("double") /
            col("exact_orders") <= 0.15).cast("long").as("approx_within_rsd")).df),

    "agg_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")).df),

    "agg_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")).df),

    "agg_groupingsets" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")).df),

    "agg_pivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(dsum(col("l_quantity")))
        .orderBy("l_linestatus").df),

    "dedup_dropduplicates" -> ((s, d) =>
      t(s, d, "lineitem")
        .dropDuplicates(Seq("l_orderkey"))
        .select("l_orderkey")
        .orderBy("l_orderkey").df),

    "dedup_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus").df),

    "reshape_unpivot" -> ((s, d) =>
      // wide→long: one row per (supplier, measure)
      t(s, d, "supplier")
        .unpivot(
          Array(col("s_suppkey")),
          Array(col("s_acctbal").as("acctbal"), col("s_nationkey").cast("double").as("nationkey")),
          "measure", "value")
        .orderBy("s_suppkey", "measure").df),

    // describe() emits stats as STRINGS — parse them back to doubles and
    // round mean/stddev (order-dependent float accumulation) so DuckDB can
    // recompute every cell; count/min/max are exact
    "agg_describe" -> ((s, d) => {
      def stat(c: String) =
        when(col("summary").isin("mean", "stddev"), round(col(c).cast("double"), 2))
          .otherwise(col(c).cast("double"))
      t(s, d, "lineitem").describe("l_quantity", "l_extendedprice")
        .select(col("summary"), stat("l_quantity").as("q_qty"), stat("l_extendedprice").as("q_price"))
        .orderBy("summary").df
    }),

    "agg_corr" -> ((s, d) =>
      t(s, d, "lineitem")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price")).df),

    // ------------------------------------------------------- f) sort/limit
    "sort_orderby" -> ((s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey")).df),

    "sort_limit_topk" -> ((s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10).df),

    "sort_offset" -> ((s, d) =>
      // pagination: rows 11-20 of the price ranking
      t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .offset(10).limit(10).df),

    // --------------------------------------------------------- g) set ops
    "setop_union_all" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey").as("key"))
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("key"))
      c.union(sup).orderBy("key").df
    }),

    "setop_union_byname" -> ((s, d) => {
      val a = t(s, d, "customer").select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
      val b = t(s, d, "supplier").select(col("s_acctbal").as("bal"), col("s_suppkey").as("key"))
      a.unionByName(b).groupBy("key")
        .agg(dsum(col("bal")).as("sum_bal"))
        .orderBy("key").df
    }),

    "setop_intersect" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_suppkey").as("key"))
      val sup = t(s, d, "supplier").select(col("s_suppkey").as("key"))
      li.intersect(sup).orderBy("key").df
    }),

    "setop_intersect_all" -> ((s, d) => {
      // bag semantics: multiplicity = min of the two sides
      val a = t(s, d, "lineitem").select(col("l_suppkey").as("key"))
      val b = t(s, d, "lineitem").filter(col("l_quantity") > 25)
        .select(col("l_suppkey").as("key"))
      a.intersectAll(b).groupBy("key").agg(count(lit(1)).as("n"))
        .orderBy("key").df
    }),

    "setop_except_all" -> ((s, d) => {
      // bag difference: multiplicity = left count minus right count
      val a = t(s, d, "lineitem").select(col("l_suppkey").as("key"))
      val b = t(s, d, "lineitem").filter(col("l_quantity") > 25)
        .select(col("l_suppkey").as("key"))
      a.exceptAll(b).groupBy("key").agg(count(lit(1)).as("n"))
        .orderBy("key").df
    }),

    "setop_except" -> ((s, d) => {
      val p = t(s, d, "part").select(col("p_partkey").as("key"))
      val li = t(s, d, "lineitem").filter(col("l_quantity") > 40)
        .select(col("l_partkey").as("key"))
      p.except(li).orderBy("key").df
    }),
  )

  // ---------------------------------------- flagship composite workloads
  // TPC-H-shaped pricing/shipping analyses over the synthetic schema:
  // multi-join + filter + group + sort pipelines exercising join reordering,
  // broadcast selection and decimal-exact aggregate parity in one plan.

  /** Exact decimal sum of a product of 2-decimal doubles: the product has ≤4
    * (or ≤6) decimals, representable exactly in DECIMAL, and both engines
    * compute the identical IEEE double before the cast. */
  private def dsum4(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  private def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")
  private def revenueExpr: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  val flagshipQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q1_pricing_summary" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum4(revenueExpr).as("sum_disc_price"),
          dsum6(revenueExpr * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus").df),

    "tpch_q3_shipping_priority" -> ((s, d) => {
      val cutoff = lit("1998-03-15").cast("timestamp")
      t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        .join(t(s, d, "orders").filter(col("o_orderdate") < cutoff),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem").filter(col("l_shipdate") > cutoff),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("o_date"),
          col("o_orderpriority"))
        .agg(dsum4(revenueExpr).as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey"))
        .limit(10).df
    }),

    "tpch_q5_local_supplier_volume" -> ((s, d) =>
      t(s, d, "region").filter(col("r_name") === "ASIA")
        .join(t(s, d, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, d, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                    col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"))
        .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(dsum4(revenueExpr).as("revenue"))
        .orderBy(desc("revenue"), asc("n_name")).df),

    // q9 shape (the graft.Bench twin, here under the exact-oracle gate):
    // 5-table join into a (nation, year) profit aggregate — decimal-exact
    // sums so the doubles hash-match
    "tpch_q9_profit_shape" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .groupBy("n_name", "o_year")
        .agg(dsum4(revenueExpr).as("profit"))
        .orderBy("n_name", "o_year").df),

    // q18 shape: having-filtered per-order volume aggregate feeding a
    // two-table join and a deterministic ordered top-100 (unique
    // o_orderkey tiebreak, so the selected row SET is exact)
    "tpch_q18_volume_customer" -> ((s, d) => {
      val big = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
        .filter(col("sum_qty") > 300.0)
      big.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_totalprice"), col("sum_qty"))
        .orderBy(desc("sum_qty"), asc("o_orderkey"))
        .limit(100).df
    }),

    // q4 shape: EXISTS-semi-joined order-priority count — the orders scan
    // prunes on the date window BEFORE the semi join, and the probe side
    // carries the cross-table lateness predicate inside the join condition
    // (never materializing the match rows). Lateness adapted to this
    // schema: shipped more than 60 days after order date.
    "tpch_q4_order_priority" -> ((s, d) => {
      val o = t(s, d, "orders").df
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val li = t(s, d, "lineitem").df
        .select(col("l_orderkey").as("__lk"), col("l_shipdate"))
      o.join(li, col("o_orderkey") === col("__lk") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // q10 shape: the returned-items customer report — revenue lost to
    // returns per customer over one quarter, four-table join with the
    // deterministic ordered top-20 (unique custkey tiebreak)
    "tpch_q10_returned_items" -> ((s, d) =>
      t(s, d, "lineitem").df.filter(col("l_returnflag") === "R")
        .join(t(s, d, "orders").df
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").df, col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "nation").df, col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum4(revenueExpr).as("revenue"))
        .orderBy(desc("revenue"), asc("c_custkey"))
        .limit(20)),

    // q21 shape: the hardest TPC-H join topology — a fact self-join three
    // ways (base + EXISTS semi + NOT-EXISTS anti, each on the order key
    // with a supplier-inequality residual) under two dimension joins.
    // "Waiting" adapted to this schema: the supplier shipped >60 days
    // after order date on a FINISHED order where ANOTHER supplier was on
    // the order but NO other supplier was late. The lateness frame is
    // computed ONCE and reused by all three roles (one orders join, not
    // three).
    "tpch_q21_waiting_shape" -> ((s, d) => {
      val lo = t(s, d, "lineitem").df
        .join(t(s, d, "orders").df.filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
            .as("late"))
      val l1 = lo.filter(col("late"))
      l1.join(lo.select(col("ok").as("ok2"), col("sk").as("sk2")),
          col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
        .join(l1.select(col("ok").as("ok3"), col("sk").as("sk3")),
          col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
        .join(t(s, d, "supplier").df, col("sk") === col("s_suppkey"))
        .join(t(s, d, "nation").df, col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name") === "NATION_3")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), asc("s_name"))
        .limit(20)
    }),

    // q13 shape: the classic COUNT-bug topology — orders-per-customer
    // distribution where customers with ZERO matching orders must appear
    // as c_count = 0 (the row a naive decorrelation drops). The predicate
    // lives on the ORDER side of the left-outer join (pushed as a
    // pre-join filter — equivalent to the ON-clause placement and prunes
    // before the shuffle); count(o_orderkey) counts non-null matches only.
    "tpch_q13_customer_distribution" -> ((s, d) => {
      val o = t(s, d, "orders").df
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      t(s, d, "customer").df.select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // q17 shape: the correlated scalar-avg filter (quantity below 20% of
    // the part's own average), decorrelated Spark-first: the per-part
    // limit is ONE aggregate over the brand/type-filtered join (never a
    // per-row subquery), broadcast back onto the fact scan. Decimal-exact
    // sums with the 0.2·(S/C) parenthesization so the doubles hash-match.
    "tpch_q17_small_quantity" -> ((s, d) => {
      val pf = t(s, d, "part").df
        .filter(col("p_brand") === "Brand#12" && col("p_type") === "MEDIUM")
        .select("p_partkey")
      val li = t(s, d, "lineitem").df
      val lim = li.join(broadcast(pf), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey")
        .agg((lit(0.2) * (dsum(col("l_quantity")) / count(lit(1)))).as("qlim"))
        .select(col("l_partkey").as("lim_pk"), col("qlim"))
      li.join(broadcast(lim), col("l_partkey") === col("lim_pk"))
        .filter(col("l_quantity") < col("qlim"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_small"))
    }),

    // q22 shape: the NOT-EXISTS + global-scalar-avg correlated topology —
    // positive-balance customers in selected code classes (custkey mod 7
    // standing in for the phone country code), above the class-set's own
    // average balance, with NO order in the probe quarter (a date-sliced
    // anti join — the unsliced form matches nobody on this dense data).
    // Decorrelated Spark-first: the average is ONE 1-row aggregate
    // broadcast back; the NOT EXISTS is a left-anti hash join against
    // the date-pruned orders scan.
    "tpch_q22_sales_opportunity" -> ((s, d) => {
      val pos = t(s, d, "customer").df
        .filter(col("c_acctbal") > 0.0 && (col("c_custkey") % 7).isin(1L, 3L, 5L))
        .select(col("c_custkey"), col("c_acctbal"), (col("c_custkey") % 7).as("cc"))
      val avgbal = pos.agg((dsum(col("c_acctbal")) / count(lit(1))).as("ab"))
      val recent = t(s, d, "orders").df
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-03-01").cast("timestamp"))
        .select(col("o_custkey"))
      pos.crossJoin(broadcast(avgbal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("cc")
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cc")
    }),

    // q16 shape: parts-supplier relationship counting — NOT-IN supplier
    // exclusion (decorrelated to a left-anti join; the excl set is
    // non-null by construction, so anti ≡ NOT IN) over the DISTINCT
    // lineitem part↔supplier bridge, then a grouped COUNT DISTINCT.
    // Fully deterministic ordering: count desc, then the unique group
    // key ascending.
    "tpch_q16_supplier_cnt" -> ((s, d) => {
      val excl = t(s, d, "supplier").df
        .filter(col("s_suppkey") % 10 === 0).select(col("s_suppkey"))
      val ps = t(s, d, "lineitem").df
        .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .distinct()
      ps.join(t(s, d, "part").df, col("partkey") === col("p_partkey"))
        .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 2, 3, 4, 5))
        .join(broadcast(excl), col("suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(count_distinct(col("suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
    }),

    // q2 shape: the correlated-MIN topology — for each part in a
    // type/size slice, the EUROPE suppliers at that part's own minimum
    // cost (cost proxy: s_acctbal; this schema has no partsupp, so the
    // part↔supplier relation is the DISTINCT lineitem bridge, the q16
    // convention). Decorrelated Spark-first: the eligible set is built
    // ONCE, its per-part MIN is one grouped aggregate broadcast back —
    // never a per-row subquery. Ties at the min all survive (TPC-H
    // semantics); ordering is total via the unique (partkey, suppkey).
    "tpch_q2_min_cost_supplier" -> ((s, d) => {
      val ps = t(s, d, "lineitem").df
        .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .distinct()
      val slice = t(s, d, "part").df
        .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
        .select("p_partkey")
      val elig = ps
        .join(broadcast(slice), col("partkey") === col("p_partkey"))
        .join(t(s, d, "supplier").df, col("suppkey") === col("s_suppkey"))
        .join(t(s, d, "nation").df, col("s_nationkey") === col("n_nationkey"))
        .join(t(s, d, "region").df.filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"), col("n_name"))
      val minc = elig.groupBy(col("p_partkey").as("__mk"))
        .agg(min(col("s_acctbal")).as("__mc"))
      elig.join(broadcast(minc),
          col("p_partkey") === col("__mk") && col("s_acctbal") === col("__mc"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(desc("s_acctbal"), asc("n_name"), asc("s_name"), asc("p_partkey"))
        .limit(100)
    }),

    // q15 shape: the scalar-max-over-aggregated-view topology — the
    // quarter's revenue per supplier, then the supplier(s) AT the view's
    // own maximum (ties all survive). Decorrelated: the max is ONE 1-row
    // aggregate over the view riding a broadcast crossJoin; the view is
    // built once. Exact-decimal revenue so the max equality is bit-stable.
    "tpch_q15_top_supplier" -> ((s, d) => {
      val rev = t(s, d, "lineitem").df
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum4(revenueExpr).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("__mx"))
      t(s, d, "supplier").df
        .join(rev, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("__mx"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }),

    // q20 shape: the nested-semi-with-correlated-scalar-agg topology —
    // suppliers in one nation having a bridge pair (part slice by name)
    // whose IN-WINDOW quantity exceeds 35% of the pair's ALL-TIME
    // quantity ("hot" stock movement; availqty adapted to the all-time
    // total since this schema has no partsupp). Decorrelated Spark-first:
    // the correlated per-pair scalar agg folds into ONE grouped pass
    // computing both sums (map-side combine), the part slice broadcasts,
    // and the supplier membership is a semi join on the distinct hot set.
    "tpch_q20_hot_parts_supplier" -> ((s, d) => {
      val qdec = col("l_quantity").cast(DecimalType(18, 2))
      val inWin = col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp")
      val pairs = t(s, d, "lineitem").df
        .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .agg(sum(qdec).cast("double").as("total_qty"),
          sum(when(inWin, qdec).otherwise(lit(0).cast(DecimalType(18, 2))))
            .cast("double").as("window_qty"))
      val slice = t(s, d, "part").df
        .filter(col("p_name").like("red%")).select("p_partkey")
      val hot = pairs
        .join(broadcast(slice), col("partkey") === col("p_partkey"))
        .filter(col("window_qty") > lit(0.35) * col("total_qty"))
        .select("suppkey").distinct()
      // region-level dimension filter (a single nation holds no supplier
      // at sf0.001's 10-supplier table; every region does at every sf)
      t(s, d, "supplier").df
        .join(t(s, d, "nation").df, col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").df.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .join(hot, col("s_suppkey") === col("suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    }),

    // q6 shape: the pure scan-side predicate-pushdown aggregate — a
    // three-conjunct filter (date window, discount band, quantity cap)
    // into a 1-row revenue sum; every predicate reaches the parquet scan.
    "tpch_q6_forecast_revenue" -> ((s, d) =>
      t(s, d, "lineitem").df
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(dsum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n"))),

    // q7 shape: the two-geography volume-shipping topology — supplier
    // geography × customer geography in BOTH directions (the disjunctive
    // pair predicate), grouped by shipping year. The nation+region dims
    // join twice under different roles; all broadcast. Region-level pair
    // (ASIA↔EUROPE) rather than TPC-H's nation pair: a single nation
    // holds no supplier at sf0.001's 10-supplier table, every region does
    // at every sf — the topology (two-role dim joins + disjunctive pair
    // filter + year grouping) is unchanged.
    "tpch_q7_volume_shipping" -> ((s, d) => {
      val r1 = t(s, d, "nation").df
        .join(t(s, d, "region").df, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("n1k"), col("r_name").as("supp_region"))
      val r2 = t(s, d, "nation").df
        .join(t(s, d, "region").df, col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("n2k"), col("r_name").as("cust_region"))
      t(s, d, "supplier").df
        .join(t(s, d, "lineitem").df
            .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
          col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "orders").df, col("o_orderkey") === col("l_orderkey"))
        .join(t(s, d, "customer").df, col("c_custkey") === col("o_custkey"))
        .join(broadcast(r1), col("s_nationkey") === col("n1k"))
        .join(broadcast(r2), col("c_nationkey") === col("n2k"))
        .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
          (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum4(revenueExpr).as("revenue"))
        .orderBy("supp_region", "cust_region", "l_year")
    }),

    // q8 shape: the national-market-share topology — one nation's share
    // of a part type's volume inside one region, per order year: a
    // CASE-aggregate ratio over a seven-table join (nation joins twice —
    // once as the customer-region filter, once as the supplier label).
    // Both sums are exact-decimal; the ratio is one IEEE division.
    "tpch_q8_market_share" -> ((s, d) => {
      val n1 = t(s, d, "nation").df
        .select(col("n_nationkey").as("n1k"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").df
        .select(col("n_nationkey").as("n2k"), col("n_regionkey").as("n2r"))
      val volDec = revenueExpr.cast(DecimalType(18, 4))
      t(s, d, "part").df.filter(col("p_type") === "STANDARD").select("p_partkey")
        .join(t(s, d, "lineitem").df, col("p_partkey") === col("l_partkey"))
        .join(t(s, d, "supplier").df, col("s_suppkey") === col("l_suppkey"))
        .join(t(s, d, "orders").df, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer").df, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n2), col("c_nationkey") === col("n2k"))
        .join(broadcast(t(s, d, "region").df.filter(col("r_name") === "ASIA")),
          col("n2r") === col("r_regionkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1k"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((sum(when(col("supp_nation") === "NATION_3", volDec)
            .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double") /
          sum(volDec).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // q11 shape: the group-HAVING-vs-global-scalar topology — per-part
    // "stock value" (cost proxy s_acctbal × the pair's all-time quantity
    // over the distinct bridge) for one REGION's suppliers (a nation can
    // hold zero suppliers at sf0.001), keeping parts above 2× the MEAN
    // part value. The TPC-H fraction-of-total threshold is
    // scale-dependent (the official spec divides it by SF); the mean
    // multiple pins the same optimizer shape — a 1-row global aggregate
    // broadcast against the grouped view — and stays non-degenerate at
    // every sf (3/163/1147 rows at sf0.001/0.01/0.1). Decorrelated: view
    // built once, threshold rides a broadcast crossJoin.
    "tpch_q11_important_stock" -> ((s, d) => {
      val pairs = t(s, d, "lineitem").df
        .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("qty"))
      val pv = pairs
        .join(t(s, d, "supplier").df, col("suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation").df), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region").df.filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("partkey")
        .agg(sum((col("s_acctbal") * col("qty")).cast(DecimalType(28, 4)))
          .cast("double").as("value"))
      val thr = pv.agg((lit(2.0) * sum(col("value").cast(DecimalType(28, 4)))
        .cast("double") / count(lit(1))).as("__thr"))
      pv.crossJoin(broadcast(thr))
        .filter(col("value") > col("__thr"))
        .select("partkey", "value")
        .orderBy(desc("value"), asc("partkey"))
    }),

    // q12 shape: the late-shipment priority-class counter — an
    // orders⋈lineitem join whose aggregate splits each group into
    // CASE-counted priority classes (shipmode adapted to l_returnflag;
    // "late" = shipped >30 days after order date) within a year window.
    "tpch_q12_late_shipments" -> ((s, d) =>
      t(s, d, "orders").df
        .join(t(s, d, "lineitem").df
            .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp")),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
        .groupBy(col("l_returnflag").as("ship_class"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))
        .orderBy("ship_class")),

    // q14 shape: the promo-revenue ratio — one month of lineitem⋈part
    // where the numerator is the CASE-masked promo slice of the same
    // exact-decimal volume sum as the denominator; 100× the IEEE ratio.
    "tpch_q14_promo_effect" -> ((s, d) => {
      val volDec = revenueExpr.cast(DecimalType(18, 4))
      t(s, d, "lineitem").df
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(t(s, d, "part").df, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * sum(when(col("p_type") === "PROMO", volDec)
            .otherwise(lit(0).cast(DecimalType(18, 4)))).cast("double") /
          sum(volDec).cast("double")).as("promo_revenue"),
          count(lit(1)).as("n"))
    }),

    // q19 shape: the disjunctive multi-column predicate topology — three
    // OR'd (brand, size band, quantity band) branches across the join.
    // Catalyst extracts the branch-common conjuncts (brand IN (...),
    // p_size >= 1) onto the part scan as pushed filters and keeps the
    // equi join hash-planned with the OR as a post-join residual — the
    // optimizer path this query exists to pin.
    "tpch_q19_discount_revenue" -> ((s, d) =>
      t(s, d, "lineitem").df
        .join(t(s, d, "part").df, col("p_partkey") === col("l_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(dsum4(revenueExpr).as("revenue"), count(lit(1)).as("n"))),
  )

  val flagshipOracleSql: Map[String, String] = Map(
    "tpch_q1_pricing_summary" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
       "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
       "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price, " +
       "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty, " +
       "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price, " +
       "CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc, " +
       "count(*) AS count_order " +
       "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
       "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),

    "tpch_q3_shipping_priority" ->
      ("SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_date, o_orderpriority, " +
       "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
       "FROM customer JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON o_orderkey = l_orderkey " +
       "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' " +
       "AND l_shipdate > TIMESTAMP '1998-03-15' " +
       "GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority " +
       "ORDER BY revenue DESC, l_orderkey LIMIT 10"),

    "tpch_q5_local_supplier_volume" ->
      ("SELECT n_name, " +
       "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
       "FROM region JOIN nation ON r_regionkey = n_regionkey " +
       "JOIN customer ON n_nationkey = c_nationkey " +
       "JOIN orders ON c_custkey = o_custkey " +
       "JOIN lineitem ON o_orderkey = l_orderkey " +
       "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey " +
       "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
       "AND o_orderdate < TIMESTAMP '1997-01-01' " +
       "GROUP BY n_name ORDER BY revenue DESC, n_name"),

    "tpch_q9_profit_shape" ->
      ("SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
       "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS profit " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "JOIN supplier ON l_suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN orders ON l_orderkey = o_orderkey " +
       "GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT) " +
       "ORDER BY n_name, o_year"),

    "tpch_q18_volume_customer" ->
      ("WITH big AS (SELECT l_orderkey, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
       "FROM lineitem GROUP BY l_orderkey " +
       "HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 300.0) " +
       "SELECT c_name, o_orderkey, o_totalprice, sum_qty FROM big " +
       "JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "ORDER BY sum_qty DESC, o_orderkey LIMIT 100"),

    "tpch_q4_order_priority" ->
      ("SELECT o_orderpriority, count(*) AS order_count FROM orders " +
       "WHERE o_orderdate >= TIMESTAMP '1996-01-01' " +
       "AND o_orderdate < TIMESTAMP '1996-04-01' " +
       "AND EXISTS (SELECT 1 FROM lineitem " +
       "WHERE l_orderkey = o_orderkey " +
       "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) " +
       "GROUP BY o_orderpriority ORDER BY o_orderpriority"),

    "tpch_q10_returned_items" ->
      ("SELECT c_custkey, c_name, c_acctbal, n_name, " +
       "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN nation ON c_nationkey = n_nationkey " +
       "WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
       "AND o_orderdate < TIMESTAMP '1996-04-01' " +
       "GROUP BY c_custkey, c_name, c_acctbal, n_name " +
       "ORDER BY revenue DESC, c_custkey LIMIT 20"),

    "tpch_q21_waiting_shape" ->
      ("WITH lo AS (SELECT l_orderkey AS ok, l_suppkey AS sk, " +
       "(l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late " +
       "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
       "WHERE o_orderstatus = 'F'), " +
       "l1 AS (SELECT * FROM lo WHERE late) " +
       "SELECT s_name, count(*) AS numwait FROM l1 " +
       "JOIN supplier ON l1.sk = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "WHERE n_name = 'NATION_3' " +
       "AND EXISTS (SELECT 1 FROM lo l2 WHERE l2.ok = l1.ok AND l2.sk <> l1.sk) " +
       "AND NOT EXISTS (SELECT 1 FROM l1 l3 WHERE l3.ok = l1.ok AND l3.sk <> l1.sk) " +
       "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"),

    "tpch_q13_customer_distribution" ->
      ("WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count " +
       "FROM customer LEFT OUTER JOIN orders " +
       "ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' " +
       "GROUP BY c_custkey) " +
       "SELECT c_count, count(*) AS custdist FROM co " +
       "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),

    "tpch_q17_small_quantity" ->
      ("WITH pf AS (SELECT p_partkey FROM part " +
       "WHERE p_brand = 'Brand#12' AND p_type = 'MEDIUM'), " +
       "lim AS (SELECT l_partkey, " +
       "0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS qlim " +
       "FROM lineitem JOIN pf ON l_partkey = p_partkey GROUP BY l_partkey) " +
       "SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly, " +
       "count(*) AS n_small " +
       "FROM lineitem JOIN lim ON lineitem.l_partkey = lim.l_partkey " +
       "WHERE l_quantity < qlim"),

    "tpch_q22_sales_opportunity" ->
      ("WITH pos AS (SELECT c_custkey, c_acctbal, c_custkey % 7 AS cc " +
       "FROM customer WHERE c_acctbal > 0.0 AND c_custkey % 7 IN (1, 3, 5)), " +
       "avgbal AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) " +
       "/ count(*) AS ab FROM pos), " +
       "sel AS (SELECT pos.* FROM pos, avgbal WHERE c_acctbal > ab " +
       "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
       "AND o_orderdate >= TIMESTAMP '1996-01-01' " +
       "AND o_orderdate < TIMESTAMP '1996-03-01')) " +
       "SELECT cc, count(*) AS numcust, " +
       "CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal " +
       "FROM sel GROUP BY cc ORDER BY cc"),

    "tpch_q16_supplier_cnt" ->
      ("WITH excl AS (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 0), " +
       "ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem), " +
       "j AS (SELECT p_brand, p_type, p_size, suppkey FROM ps " +
       "JOIN part ON partkey = p_partkey " +
       "WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO' AND p_size IN (1,2,3,4,5) " +
       "AND suppkey NOT IN (SELECT s_suppkey FROM excl)) " +
       "SELECT p_brand, p_type, p_size, " +
       "CAST(count(DISTINCT suppkey) AS BIGINT) AS supplier_cnt " +
       "FROM j GROUP BY 1, 2, 3 " +
       "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),

    // the oracle keeps the CORRELATED form (min per part as a correlated
    // scalar subquery) — DuckDB decorrelates it independently, so the
    // engines cross-check two different plans of the same semantics
    "tpch_q2_min_cost_supplier" ->
      ("WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem), " +
       "elig AS (SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name " +
       "FROM ps JOIN part ON partkey = p_partkey " +
       "JOIN supplier ON suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "WHERE r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 10) " +
       "SELECT s_acctbal, s_name, n_name, p_partkey FROM elig e " +
       "WHERE s_acctbal = (SELECT min(s_acctbal) FROM elig e2 WHERE e2.p_partkey = e.p_partkey) " +
       "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"),

    "tpch_q15_top_supplier" ->
      ("WITH rev AS (SELECT l_suppkey AS supplier_no, " +
       "CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue " +
       "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
       "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) " +
       "SELECT s_suppkey, s_name, total_revenue FROM supplier " +
       "JOIN rev ON s_suppkey = supplier_no " +
       "WHERE total_revenue = (SELECT max(total_revenue) FROM rev) " +
       "ORDER BY s_suppkey"),

    "tpch_q20_hot_parts_supplier" ->
      ("WITH pairs AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty, " +
       "CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' " +
       "AND l_shipdate < TIMESTAMP '1997-01-01' " +
       "THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS window_qty " +
       "FROM lineitem GROUP BY 1, 2), " +
       "hot AS (SELECT DISTINCT suppkey FROM pairs JOIN part ON partkey = p_partkey " +
       "WHERE p_name LIKE 'red%' AND window_qty > 0.35 * total_qty) " +
       "SELECT s_suppkey, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "WHERE r_name = 'EUROPE' AND s_suppkey IN (SELECT suppkey FROM hot) " +
       "ORDER BY s_suppkey"),

    "tpch_q6_forecast_revenue" ->
      ("SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue, " +
       "count(*) AS n FROM lineitem " +
       "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
       "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),

    "tpch_q7_volume_shipping" ->
      ("SELECT supp_region, cust_region, l_year, " +
       "CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue FROM " +
       "(SELECT r1.r_name AS supp_region, r2.r_name AS cust_region, " +
       "CAST(year(l_shipdate) AS BIGINT) AS l_year, " +
       "l_extendedprice * (1.0 - l_discount) AS volume " +
       "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
       "JOIN orders ON o_orderkey = l_orderkey " +
       "JOIN customer ON c_custkey = o_custkey " +
       "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
       "JOIN region r1 ON n1.n_regionkey = r1.r_regionkey " +
       "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
       "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey " +
       "WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE') " +
       "OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')) " +
       "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01') " +
       "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),

    "tpch_q8_market_share" ->
      ("SELECT o_year, " +
       "CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN CAST(volume AS DECIMAL(18,4)) " +
       "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) " +
       "/ CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share FROM " +
       "(SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, " +
       "l_extendedprice * (1.0 - l_discount) AS volume, n1.n_name AS supp_nation " +
       "FROM part JOIN lineitem ON p_partkey = l_partkey " +
       "JOIN supplier ON s_suppkey = l_suppkey " +
       "JOIN orders ON l_orderkey = o_orderkey " +
       "JOIN customer ON o_custkey = c_custkey " +
       "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
       "JOIN region ON n2.n_regionkey = r_regionkey " +
       "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
       "WHERE r_name = 'ASIA' AND p_type = 'STANDARD') " +
       "GROUP BY 1 ORDER BY 1"),

    "tpch_q11_important_stock" ->
      ("WITH pairs AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty " +
       "FROM lineitem GROUP BY 1, 2), " +
       "pv AS (SELECT partkey, " +
       "CAST(SUM(CAST(s_acctbal * qty AS DECIMAL(28,4))) AS DOUBLE) AS value " +
       "FROM pairs JOIN supplier ON suppkey = s_suppkey " +
       "JOIN nation ON s_nationkey = n_nationkey " +
       "JOIN region ON n_regionkey = r_regionkey " +
       "WHERE r_name = 'EUROPE' GROUP BY 1) " +
       "SELECT partkey, value FROM pv " +
       "WHERE value > (SELECT 2.0 * CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) " +
       "/ count(*) FROM pv) " +
       "ORDER BY value DESC, partkey"),

    "tpch_q12_late_shipments" ->
      ("SELECT l_returnflag AS ship_class, " +
       "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
       "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
       "FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
       "WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY " +
       "AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
       "GROUP BY 1 ORDER BY 1"),

    "tpch_q14_promo_effect" ->
      ("SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' " +
       "THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) " +
       "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) " +
       "/ CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS promo_revenue, " +
       "count(*) AS n " +
       "FROM lineitem JOIN part ON l_partkey = p_partkey " +
       "WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'"),

    "tpch_q19_discount_revenue" ->
      ("SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue, " +
       "count(*) AS n FROM lineitem JOIN part ON p_partkey = l_partkey " +
       "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11) " +
       "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) " +
       "OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"),
  )

  val oracleSql: Map[String, String] = Map(
    "scan_parquet" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",

    // the oracle is the PARQUET truth: equality proves the CSV/JSON scan
    // parsed every value (incl. doubles) back to the identical bits
    "scan_csv" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",

    "scan_json" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "scan_csv_inferred" ->
      "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier ORDER BY s_suppkey",

    "project_select" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",

    "sql_via_view" ->
      ("SELECT l_linestatus, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
       "FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"),

    "project_selectexpr" ->
      "SELECT o_orderkey, o_totalprice * 0.1 AS tax10 FROM orders ORDER BY o_orderkey",

    "project_withcolumn" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS disc_price " +
       "FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    "project_rename" ->
      "SELECT n_nationkey, n_name AS nation_name FROM nation ORDER BY n_nationkey",

    "project_drop" ->
      "SELECT p_partkey, p_name, p_brand, p_size FROM part ORDER BY p_partkey",

    "filter_predicate" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
       "WHERE l_quantity > 25 AND l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber"),

    "join_inner" ->
      ("SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey " +
       "ORDER BY o_orderkey"),

    "join_left" ->
      ("SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer " +
       "LEFT JOIN orders ON o_custkey = c_custkey GROUP BY c_custkey ORDER BY c_custkey"),

    "join_semi" ->
      ("SELECT c_custkey FROM customer WHERE EXISTS " +
       "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"),

    "join_anti" ->
      ("SELECT o_orderkey FROM orders WHERE NOT EXISTS " +
       "(SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45) " +
       "ORDER BY o_orderkey"),

    "join_cross" ->
      ("SELECT a.r_regionkey AS r1, b.r_regionkey AS r2 FROM region a CROSS JOIN region b " +
       "ORDER BY r1, r2"),

    "join_right" ->
      ("SELECT c_custkey, count(o_orderkey) AS n_big_orders FROM " +
       "(SELECT * FROM orders WHERE o_totalprice > 150000) o " +
       "RIGHT JOIN customer ON o_custkey = c_custkey " +
       "GROUP BY c_custkey ORDER BY c_custkey"),

    "join_full_outer" ->
      ("SELECT c_custkey, o_orderkey, o_totalprice FROM " +
       "(SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c " +
       "FULL JOIN (SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
       "WHERE o_totalprice > 150000) o ON c_custkey = o_custkey " +
       "ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST"),

    "join_theta_range" ->
      ("SELECT s_nationkey, count(*) AS n_pairs FROM supplier s JOIN customer c " +
       "ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal " +
       "GROUP BY s_nationkey ORDER BY s_nationkey"),

    "agg_groupby_sum" ->
      ("SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
       "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),

    "join_nonequi" ->
      ("SELECT a.n_regionkey AS r1, count(*) AS n_pairs FROM nation a JOIN nation b " +
       "ON a.n_nationkey < b.n_nationkey AND a.n_regionkey <> b.n_regionkey " +
       "GROUP BY a.n_regionkey ORDER BY r1"),

    "join_skew_salted" ->
      ("SELECT s_nationkey, count(*) AS n_lines, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
       "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
       "GROUP BY s_nationkey ORDER BY s_nationkey"),

    "join_range_binned" ->
      ("SELECT c_nationkey, count(*) AS n_in_band FROM supplier s JOIN " +
       "(SELECT c_nationkey, min(c_acctbal) AS lo, max(c_acctbal) AS hi " +
       "FROM customer GROUP BY c_nationkey) b " +
       "ON s.s_acctbal >= b.lo AND s.s_acctbal <= b.hi " +
       "GROUP BY c_nationkey ORDER BY c_nationkey"),

    "join_interval_overlap" ->
      ("WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us, " +
       "epoch_us(ts) // 86400000000 AS day FROM events), " +
       "a AS (SELECT user_id, day AS a_day, min(us) AS a_lo, max(us) AS a_hi " +
       "FROM base GROUP BY 1, 2), " +
       "b AS (SELECT event_type, day AS b_day, min(us) AS b_lo, max(us) AS b_hi " +
       "FROM base GROUP BY 1, 2) " +
       "SELECT user_id, a_day, event_type, b_day, a_lo, a_hi, b_lo, b_hi " +
       "FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi " +
       "ORDER BY user_id, a_day, event_type, b_day"),

    "join_asof" ->
      ("SELECT e.event_id AS event_id, p.value AS asof_pval FROM events e " +
       "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p " +
       "ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id"),

    // the engine compares match age in floored epoch SECONDS
    // (unix_timestamp semantics) — epoch_us // 1e6 is that floor
    "join_asof_tolerance" ->
      ("SELECT e.event_id AS event_id, " +
       "CASE WHEN epoch_us(e.ts) // 1000000 - epoch_us(p.ts) // 1000000 <= 7200 " +
       "THEN p.value END AS asof_pval FROM events e " +
       "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p " +
       "ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id"),

    "join_asof_bucketed" ->
      ("SELECT e.event_id AS event_id, p.value AS asof_pval FROM events e " +
       "ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p " +
       "ON e.user_id = p.user_id AND e.ts >= p.ts ORDER BY e.event_id"),

    "agg_groupingsets" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
       "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ()) " +
       "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),

    "sort_offset" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10"),

    "agg_multi" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
       "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty, " +
       "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, count(*) AS n " +
       "FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),

    "agg_shorthand_count" ->
      "SELECT o_orderpriority, count(*) AS count FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority",

    "agg_global" ->
      ("SELECT count(*) AS n_rows, " +
       "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price, " +
       "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty FROM lineitem"),

    "agg_distinct_count" ->
      ("SELECT count(DISTINCT l_suppkey) AS n_supp, count(DISTINCT l_partkey) AS n_part " +
       "FROM lineitem"),

    "agg_approx_distinct" ->
      ("SELECT count(DISTINCT l_orderkey) AS exact_orders, " +
       "CAST(1 AS BIGINT) AS approx_within_rsd FROM lineitem"),

    "agg_describe" ->
      ("SELECT 'count' AS summary, CAST(count(l_quantity) AS DOUBLE) AS q_qty, " +
       "CAST(count(l_extendedprice) AS DOUBLE) AS q_price FROM lineitem " +
       "UNION ALL SELECT 'max', CAST(max(l_quantity) AS DOUBLE), CAST(max(l_extendedprice) AS DOUBLE) FROM lineitem " +
       "UNION ALL SELECT 'mean', round(avg(l_quantity), 2), round(avg(l_extendedprice), 2) FROM lineitem " +
       "UNION ALL SELECT 'min', CAST(min(l_quantity) AS DOUBLE), CAST(min(l_extendedprice) AS DOUBLE) FROM lineitem " +
       "UNION ALL SELECT 'stddev', round(stddev_samp(l_quantity), 2), round(stddev_samp(l_extendedprice), 2) FROM lineitem " +
       "ORDER BY summary"),

    "agg_rollup" ->
      ("SELECT l_returnflag, l_linestatus, " +
       "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
       "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus) " +
       "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),

    "agg_cube" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n " +
       "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus) " +
       "ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"),

    "agg_pivot" ->
      ("SELECT l_linestatus, " +
       "CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS A, " +
       "CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS N, " +
       "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS R " +
       "FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"),

    "dedup_dropduplicates" ->
      "SELECT DISTINCT l_orderkey FROM lineitem ORDER BY l_orderkey",

    "dedup_distinct" ->
      ("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem " +
       "ORDER BY l_returnflag, l_linestatus"),

    "agg_corr" ->
      "SELECT round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price FROM lineitem",

    "reshape_unpivot" ->
      ("SELECT s_suppkey, measure, value FROM (" +
       "SELECT s_suppkey, s_acctbal AS acctbal, CAST(s_nationkey AS DOUBLE) AS nationkey " +
       "FROM supplier) UNPIVOT (value FOR measure IN (acctbal, nationkey)) " +
       "ORDER BY s_suppkey, measure"),

    "sort_orderby" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey",

    "sort_limit_topk" ->
      ("SELECT o_orderkey, o_totalprice FROM orders " +
       "ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),

    "setop_union_all" ->
      ("SELECT key FROM (SELECT c_custkey AS key FROM customer " +
       "UNION ALL SELECT s_suppkey AS key FROM supplier) ORDER BY key"),

    "setop_union_byname" ->
      ("SELECT key, CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal FROM " +
       "(SELECT c_custkey AS key, c_acctbal AS bal FROM customer " +
       "UNION ALL SELECT s_suppkey AS key, s_acctbal AS bal FROM supplier) " +
       "GROUP BY key ORDER BY key"),

    "setop_intersect" ->
      ("SELECT key FROM (SELECT l_suppkey AS key FROM lineitem " +
       "INTERSECT SELECT s_suppkey AS key FROM supplier) ORDER BY key"),

    "setop_except" ->
      ("SELECT key FROM (SELECT p_partkey AS key FROM part " +
       "EXCEPT SELECT l_partkey AS key FROM lineitem WHERE l_quantity > 40) ORDER BY key"),

    "setop_intersect_all" ->
      ("SELECT key, count(*) AS n FROM (SELECT l_suppkey AS key FROM lineitem " +
       "INTERSECT ALL SELECT l_suppkey AS key FROM lineitem WHERE l_quantity > 25) " +
       "GROUP BY key ORDER BY key"),

    "setop_except_all" ->
      ("SELECT key, count(*) AS n FROM (SELECT l_suppkey AS key FROM lineitem " +
       "EXCEPT ALL SELECT l_suppkey AS key FROM lineitem WHERE l_quantity > 25) " +
       "GROUP BY key ORDER BY key"),
  )
}
