package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines (SURVEY.md §2.3):
  * the deterministic split / decontamination / per-domain-cap steps that sit
  * between dedup and shard packing in a real 100 TB run. All three are
  * row-local or broadcast-sided — none shuffles the text payload.
  */
object Corpus {

  /** Deterministic, engine-portable dataset split: bucket = (first 8 hex
    * chars of md5(id ":" salt) as an integer) mod 100, split label by bucket
    * thresholds. Unlike `randomSplit` (sample-based, dependent on partition
    * layout and row order), the assignment is a pure function of the id —
    * reproducible across runs, engines, and cluster layouts, and STABLE
    * under corpus growth: a document never changes split when new data
    * arrives, which is what keeps eval sets uncontaminated across dataset
    * versions. Row-local (no shuffle at any scale); md5 keeps the bucket
    * arithmetic exactly re-derivable by any SQL engine. A NULL id yields a
    * NULL bucket and deterministically lands in "test" (the CASE fallback
    * branch — same in ANSI SQL), never in the training split.
    *
    * @param trainPct buckets [0, trainPct) → "train"
    * @param valPct   buckets [trainPct, trainPct+valPct) → "val";
    *                 the rest → "test"
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      salt: String,
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "trainPct/valPct must be non-negative and sum to at most 100")
    val bucket = (conv(
      substring(md5(concat(col(idCol).cast("string"), lit(":" + salt))), 1, 8),
      16, 10).cast("long") % 100).as("bucket")
    df.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Benchmark decontamination: flags corpus documents sharing at least
    * `minShared` distinct w-token shingles with ANY benchmark document —
    * the standard eval-leak scrub before training. The benchmark side (eval
    * suites) is tiny by construction, so its distinct shingle-hash set
    * BROADCASTS; the corpus side is one row-local shingle explode joined
    * against that broadcast and re-grouped on the doc id — the corpus never
    * self-joins and its text payload never shuffles, so cost is O(corpus
    * shingles) at any scale. Shingles travel as rolled 64-bit hashes
    * (same representation as the dedup family).
    *
    * Returns one row per corpus doc: (id, n_shared_shingles, contaminated).
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      minShared: Long = 1L): DataFrame = {
    require(minShared >= 1, "minShared must be at least 1")
    val shingleSet: Column =
      array_distinct(graft.expressions.MinHashSignature.shingleHashes(
        transform(graft.functions.TextFunctions.tokens(col(textCol)), t => xxhash64(t)),
        shingleWidth))
    val benchShingles = benchmark.select(explode(shingleSet).as("s")).distinct()
    val corpusShingles = corpus.select(col(idCol).as("id"), explode(shingleSet).as("s"))
    val shared = corpusShingles
      .join(broadcast(benchShingles), Seq("s"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shared_shingles"))
      .withColumnRenamed("id", "__shared_id")
    // null-safe re-attach: NULL-id rows group as ONE pseudo-doc upstream (a
    // groupBy key, like any aggregation) — a plain equi-join would silently
    // zero their counts here
    corpus.select(col(idCol).as("id"))
      .join(shared, col("id") <=> col("__shared_id"), "left")
      .select(
        col("id"),
        coalesce(col("n_shared_shingles"), lit(0L)).as("n_shared_shingles"),
        (coalesce(col("n_shared_shingles"), lit(0L)) >= minShared).as("contaminated"))
  }

  /** Per-group cap: keeps the top `cap` rows of every group by
    * (scoreCol desc, idCol asc — the deterministic tie-break). The standard
    * per-domain quality cap in web-corpus assembly: no single domain may
    * contribute more than `cap` documents. One shuffle on the group key;
    * rank pushdown (WindowGroupLimit) keeps the sort partial. */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String,
      cap: Int): DataFrame = {
    require(cap >= 1, "cap must be at least 1")
    val w = Window.partitionBy(col(groupCol)).orderBy(desc(scoreCol), asc(idCol))
    df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .filter(col("rank_in_group") <= cap)
  }
}
