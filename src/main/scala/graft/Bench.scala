package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Headline benchmark, mirroring the 10 measured baseline queries in
  * /root/repo/BASELINE.md (same operations, same action shape; the
  * reference side of q9/q18 measured by scripts/bench_reference.py under
  * the identical config) through the MetaFrame layer. Warm JVM (one untimed pass), then 5 interleaved timed
  * passes; the headline per-query number is the median, with best and
  * spread (max−min) alongside so machine drift between rounds is visible
  * in the artifact itself.
  *
  * Prints ONE JSON line: {"metric":"total","value":N,"unit":"sec",
  * "passes":5,"queries":{median...},"best":{...},"spread":{...},"sf":"<dir>"}.
  */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String): MetaFrame = Tables.loadMeta(spark, sfDir, name)

    // each entry: name -> a thunk running the full query incl. its action
    val benchQueries: Seq[(String, () => Unit)] = Seq(
      "q1_filter_project" -> (() => {
        t("lineitem").filter(col("l_quantity") > 25)
          .select("l_orderkey", "l_partkey", "l_quantity").count(): Unit
      }),
      "q2_groupby_agg" -> (() => {
        t("lineitem").groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")).as("sum_qty"),
               avg(col("l_extendedprice")).as("avg_price"),
               count(lit(1)).as("n"))
          .collect(): Unit
      }),
      "q3_join_agg" -> (() => {
        t("orders")
          .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"), "inner")
          .groupBy("o_orderpriority")
          .agg(sum(col("l_extendedprice")).as("sum_price"))
          .collect(): Unit
      }),
      "q4_dropdup" -> (() => {
        t("lineitem").dropDuplicates(Seq("l_orderkey")).count(): Unit
      }),
      "q5_window_topk" -> (() => {
        val w = Window.partitionBy(col("l_returnflag")).orderBy(desc("l_extendedprice"))
        t("lineitem").withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5).collect(): Unit
      }),
      "q6_sort_limit" -> (() => {
        t("orders").orderBy(desc("o_totalprice")).limit(10).collect(): Unit
      }),
      "q7_distinct" -> (() => {
        t("lineitem").select("l_suppkey").distinct().count(): Unit
      }),
      "q8_union_agg" -> (() => {
        val a = t("customer").select(col("c_custkey").as("key"))
        val b = t("supplier").select(col("s_suppkey").as("key"))
        a.union(b).groupBy("key").count().count(): Unit
      }),
      // TPC-H q9 shape: 5-table join + multi-key agg — exercises the join
      // reorder/broadcast planning the 8 micro-queries never touch. String
      // group keys (not Column) so the reference runs the identical plan
      // (Column groupBy args crash its pk inference — SURVEY §7.3 Q1).
      "q9_profit_shape" -> (() => {
        t("lineitem")
          .join(t("part"), col("l_partkey") === col("p_partkey"), "inner")
          .join(t("supplier"), col("l_suppkey") === col("s_suppkey"), "inner")
          .join(t("nation"), col("s_nationkey") === col("n_nationkey"), "inner")
          .join(t("orders"), col("l_orderkey") === col("o_orderkey"), "inner")
          .withColumn("o_year", year(col("o_orderdate")))
          .groupBy("n_name", "o_year")
          .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("profit"))
          .collect(): Unit
      }),
      // TPC-H q18 shape: having-filtered aggregate feeding a two-table join
      // + ordered limit — the aggregate-as-build-side pattern.
      "q18_volume_shape" -> (() => {
        val big = t("lineitem").groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 300)
        big.join(t("orders"), col("l_orderkey") === col("o_orderkey"), "inner")
          .join(t("customer"), col("o_custkey") === col("c_custkey"), "inner")
          .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
          .orderBy(desc("sum_qty"), col("o_orderkey"))
          .limit(100)
          .collect(): Unit
      }),
    )

    // warm pass (JIT + parquet footer cache), then five interleaved timed
    // passes. Headline per-query number is the MEDIAN (robust to one noisy
    // pass either way); best and spread (max-min across passes) ride along in
    // the artifact so machine drift between rounds is visible in the JSON
    // itself instead of needing manual A/B re-runs.
    benchQueries.foreach { case (_, run) => run() }
    def timedPass(): Map[String, Double] = benchQueries.map { case (name, run) =>
      val t0 = System.nanoTime()
      run()
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val nPasses = 5
    val passes = Seq.fill(nPasses)(timedPass())
    def stats(name: String): (Double, Double, Double) = {
      val xs = passes.map(_(name)).sorted
      (xs(xs.size / 2), xs.head, xs.last - xs.head) // (median, best, spread)
    }
    val results = benchQueries.map { case (name, _) => name -> stats(name) }

    def obj(f: ((Double, Double, Double)) => Double): String =
      results.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val qs = obj(_._1)
    val best = obj(_._2)
    val spread = obj(_._3)
    val total = results.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","passes":$nPasses,"queries":$qs,"best":$best,"spread":$spread,"sf":"$sfDir"}""")
    spark.stop()
  }
}
