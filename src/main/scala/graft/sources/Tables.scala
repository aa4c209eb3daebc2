package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.MetaFrame

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §2).
  *
  * Construction-from-source matches the reference's pattern
  * `MetaFrame(spark.read.parquet(...), meta)` (reference: README.md:8-16,
  * metaframe/metaframe.py:63-69): ingestion is plain `spark.read`, the wrapper
  * only annotates. Parquet scans keep Catalyst's filter pushdown and column
  * pruning because nothing is materialized here.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS): Spark 4 rejects it outright
    // unless read as a raw long, so read nanos-as-long and truncate to
    // microsecond TimestampType (matching DuckDB's ns→us behavior).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  def loadMeta(spark: SparkSession, sfDir: String, name: String): MetaFrame =
    MetaFrame(load(spark, sfDir, name), Map("table" -> name, "source" -> s"$sfDir/$name.parquet"))
}
