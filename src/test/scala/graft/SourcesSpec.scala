package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Source-format coverage (SURVEY §2.2a: construction from any source —
  * ingestion is plain `spark.read`, the wrapper only annotates): the same
  * frame roundtrips through parquet, CSV, JSON and ORC and lifts into the
  * metadata layer identically. */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  private lazy val base = Tables.load(spark, "/root/testdata/sf0.001", "nation")

  private def out(fmt: String): String = s"target/sources_spec/$fmt"

  test("CSV roundtrip through the metadata layer") {
    base.write.mode("overwrite").option("header", "true").csv(out("csv"))
    val mf = MetaFrame(
      spark.read.option("header", "true").option("inferSchema", "true").csv(out("csv")),
      Map("format" -> "csv"))
    assert(mf.count() == 25)
    assert(mf.groupBy("n_regionkey").count().primaryKey.contains(Seq("n_regionkey")))
  }

  test("JSON roundtrip") {
    base.write.mode("overwrite").json(out("json"))
    val mf = spark.read.json(out("json")).meta(Map("format" -> "json"))
    assert(mf.count() == 25)
    assert(mf.metadata("format") == "json")
  }

  test("ORC roundtrip") {
    base.write.mode("overwrite").orc(out("orc"))
    val mf = spark.read.orc(out("orc")).meta
    assert(mf.count() == 25)
    assert(mf.select("n_name").distinct().count() == 25)
  }
}
