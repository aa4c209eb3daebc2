package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guard for the whole declared-query surface: every SparkEntry query must
  * plan, run, and return rows on the sf0.001 tables, and every oracleSql key
  * must reference an existing query. (Value-level correctness is the
  * driver's DuckDB gate at sf0.01; this catches breakage fast in sbt test.) */
class QueriesSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys are a subset of queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle SQL without a query: $unknown")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs and is non-empty at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }
}
