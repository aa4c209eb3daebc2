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

  /** [[scanCsv]]'s INFERRED-schema twin (r17 verdict #7): the same
    * roundtrip fixture scanned with `inferSchema=true` — two passes over
    * the files by contract (one samples types, one parses), which is why
    * explicit schemas are the production default and inference the
    * exploration path. Inference narrows integer-valued columns to the
    * smallest fitting integral type (s_suppkey reads back IntegerType at
    * test SFs where parquet truth is LongType — the exact dtypes are
    * pinned in SourcesSpec), so the scan is cast back to
    * [[SupplierSchema]] here: equality with the parquet truth then proves
    * inference classified every column to a type whose parse preserved
    * the values bit-for-bit. */
  def scanCsvInferred(spark: SparkSession, sfDir: String): DataFrame = {
    val path = fixtureDir(sfDir, "supplier_csv_inferred")
    load(spark, sfDir, "supplier")
      .write.mode("overwrite").option("header", "true").csv(path)
    val inferred = spark.read
      .option("header", "true").option("inferSchema", "true")
      .option("mode", "FAILFAST")
      .csv(path)
    inferred.select(SupplierSchema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** Bad-records side channel built from PUBLIC Spark semantics: scans
    * `path` twice — once in PERMISSIVE mode to capture each unparseable
    * row and APPEND it to `badDir` as a JSON line carrying every
    * partially-parsed column plus the verbatim source line under
    * `_corrupt_record` (replayable after a parser fix by re-parsing that
    * field), once in DROPMALFORMED mode to return the clean frame. The
    * bad-row write keeps the full column set deliberately — Spark rejects
    * plans whose required schema is ONLY the corrupt-record column
    * (QUERY_ONLY_CORRUPT_RECORD_COLUMN; the documented alternative is
    * caching the parsed input), and the partial values are the audit
    * signal anyway. Two scans instead of one cached pass is the
    * 100 TB-deliberate choice: both sides stream through executors with
    * pushdown intact, nothing materializes corpus-sized state, the bad
    * slice written is O(bad rows). The returned frame is lazy as usual —
    * only the audit write runs at call time. */
  def scanRoutingBadRecords(
      spark: SparkSession,
      format: String,
      path: String,
      schema: StructType,
      badDir: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(format == "csv" || format == "json", s"unsupported format: $format")
    val withCorrupt = schema.add(StructField("_corrupt_record", StringType))
    val permissive = spark.read.format(format).schema(withCorrupt)
      .options(options)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .load(path)
    // renamed on the way out: a JSON field literally named
    // `_corrupt_record` would read back as the JSON reader's own internal
    // corrupt column, making the bad-records file un-queryable
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) for any consumer selecting it
    permissive.filter(col("_corrupt_record").isNotNull)
      .withColumnRenamed("_corrupt_record", "corrupt_record")
      .write.mode("append").json(badDir)
    spark.read.format(format).schema(schema)
      .options(options)
      .option("mode", "DROPMALFORMED")
      .load(path)
  }
}
