package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Pins the physical-plan properties the 100 TB story depends on: parquet
  * pushdown/pruning, broadcast join selection, and rank-limit pushdown.
  * If a refactor silently loses one of these, correctness stays green but
  * scale breaks — so they're asserted here, not just eyeballed in Explain. */
class PlanQualitySpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def t(name: String): MetaFrame = Tables.loadMeta(spark, sfDir, name)

  test("filter+project reaches the parquet scan (PushedFilters + pruned ReadSchema)") {
    val df = t("lineitem").filter(col("l_quantity") > 25)
      .select("l_orderkey", "l_partkey", "l_quantity").df
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,25.0)"))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>"))
  }

  test("modest dimension side of a join is broadcast, not shuffled") {
    val df = t("orders")
      .join(t("lineitem"), col("o_orderkey") === col("l_orderkey"), "inner")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).df
    df.collect() // AQE finalizes the physical plan on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("row_number top-k filter plans WindowGroupLimit (partial rank pushdown)") {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(desc("l_extendedprice"))
    val df = t("lineitem").withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).df
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("orderBy+limit plans TakeOrderedAndProject (no full sort)") {
    val df = t("orders").orderBy(desc("o_totalprice")).limit(10).df
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("pk-elided dedup adds no exchange to the plan") {
    val unique = t("lineitem").groupBy("l_suppkey").agg(count(lit(1)).as("n"))
    val elided = unique.dropDuplicates(Seq("l_suppkey"))
    assert(elided.df.queryExecution.logical eq unique.df.queryExecution.logical)
  }
}
