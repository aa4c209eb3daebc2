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

  // ------------------------------------------------------- text-format scans
  // The reference constructs from ANY spark.read source (metaframe.py:63-69);
  // parquet is the only driver-provided format, so the CSV/JSON scan queries
  // round-trip a table through the text format with a DISTRIBUTED write and
  // scan it back under an EXPLICIT schema in FAILFAST mode. The oracle is the
  // parquet truth: a value surviving parquet → text → scan bit-identically
  // (doubles included — writers emit shortest-roundtrip renderings, readers
  // parse correctly-rounded) pins the text readers' parse semantics without
  // the oracle ever touching the derived files. Malformed-row modes
  // (PERMISSIVE + corrupt-record column, DROPMALFORMED, FAILFAST) are pinned
  // in SourcesSpec on handwritten bad rows.

  import org.apache.spark.sql.types._

  /** supplier's explicit scan schema (FIXTURES.md §2 types). */
  val SupplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  /** documents' explicit scan schema (FIXTURES.md §2 types). */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def fixtureDir(sfDir: String, kind: String): String = {
    val leaf = sfDir.stripSuffix("/").split('/').last
    s"target/scan_fixtures/$leaf/$kind"
  }

  /** Writes the supplier CSV twin (header, distributed part files) and scans
    * it back under [[SupplierSchema]], FAILFAST. The fixture regenerates on
    * every call BY DESIGN — the roundtrip is the test; the write is
    * distributed, overwrite-mode, and keyed by sf leaf so concurrent sfs
    * never collide. */
  def scanCsv(spark: SparkSession, sfDir: String): DataFrame = {
    val path = fixtureDir(sfDir, "supplier_csv")
    load(spark, sfDir, "supplier")
      .write.mode("overwrite").option("header", "true").csv(path)
    spark.read.schema(SupplierSchema)
      .option("header", "true").option("mode", "FAILFAST")
      .csv(path)
  }

  /** Writes the documents JSONL twin and scans it back under
    * [[DocumentsSchema]], FAILFAST. */
  def scanJson(spark: SparkSession, sfDir: String): DataFrame = {
    val path = fixtureDir(sfDir, "documents_json")
    load(spark, sfDir, "documents")
      .write.mode("overwrite").json(path)
    spark.read.schema(DocumentsSchema)
      .option("mode", "FAILFAST")
      .json(path)
  }
}
