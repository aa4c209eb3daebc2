package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Corpus, Dedup}

/** Ingestion-time corpus assembly — the STREAMING twin of
  * [[graft.operators.Assembly.assembleCorpus]], structured the way a
  * production ingestion pipeline actually runs: `foreachBatch`, with each
  * micro-batch flowing through the audited BATCH operators against frozen
  * artifacts, and accepted documents appended to the corpus store so that
  * batch N+1 deduplicates against everything batch N accepted.
  *
  * Why `foreachBatch` and not a pure streaming DAG: the dedup verdict is a
  * per-document aggregate over its candidate matches against a corpus that
  * GROWS with every batch — in a continuous DAG that is an update-mode
  * aggregate joined back to per-row stateless verdicts (a stream-stream
  * self-join Structured Streaming cannot express), with O(stream) state.
  * Per micro-batch, the same logic is a handful of static joins that AQE
  * plans with actual batch statistics, the corpus re-reads fresh each
  * round (so growth is visible), and the streaming runtime contributes
  * exactly what it is good at: source offsets, retries, and trigger
  * cadence. This is the composition Spark's own guide recommends for
  * logic a streaming DAG cannot express.
  *
  * Divergences from the one-shot batch assembly, both inherent to
  * ingestion and stated here once:
  *  - the quality gate scores against a FROZEN pre-trained LM
  *    ([[Corpus.qualityGateAgainst]]; train once with [[Corpus.lmCounts]],
  *    persist with `MetaPersist.writeModel`) — a stable bar, where the
  *    batch gate's self-trained thresholds drift with the input slice;
  *  - there is no per-source cap or shard packing: both are GLOBAL
  *    orderings over the final corpus, meaningless per batch — run them as
  *    a batch step over the accepted store when training data is cut;
  *  - duplicate attribution depends on arrival grouping: two near-dups in
  *    ONE batch resolve by canonical election (`"duplicate"`, lowest id
  *    wins); across batches the earlier-accepted doc wins
  *    (`"duplicate_corpus"`). The ACCEPTED SET is the same whenever ids
  *    are arrival-ordered — only the label differs.
  *
  * Exactly-once caveat: `foreachBatch` is at-least-once on retry; the two
  * appends below are not transactional. The audit table carries
  * `batch_id`, so a replayed batch is detectable (and deduplicable) by
  * `dropDuplicates("batch_id", "id")` downstream; a transactional store
  * (or partition-by-batch overwrite) is the production hardening.
  */
object Ingest {

  /** One micro-batch through the ingestion stages: frozen-LM quality gate →
    * in-batch winnowing near-dedup (canonical election) → batch-vs-corpus
    * winnowing near-dedup → benchmark decontamination → deterministic
    * split. Returns one AUDIT row per batch doc with first-failing-stage
    * attribution: (id, source, lang, n_tokens, drop_stage, keep, split);
    * `drop_stage` ∈ quality | duplicate | duplicate_corpus | contaminated,
    * null for accepted docs (which carry their split).
    *
    * The corpus must carry the batch's `idCol`/`textCol` columns.
    * Pure batch function (usable standalone for backfills); every stage is
    * deterministic, so the audit table is exactly reproducible from
    * (batch, corpus, benchmark, counts). Stage verdict tables are pinned
    * via checkpoint exactly as in the batch assembly — each feeds both the
    * next stage's survivor filter and the final audit join. */
  def assembleMicroBatch(
      batch: DataFrame,
      corpus: DataFrame,
      benchmark: DataFrame,
      lmCounts: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      minTokens: Long = 1L,
      maxTokens: Long = Long.MaxValue,
      maxTopNgramFrac: Double = 1.0,
      maxDupNgramFrac: Double = 1.0,
      maxAvgNll: Double = Double.MaxValue,
      minJaccard: Double = 0.8,
      shingleWidth: Int = 3,
      minShared: Long = 1L,
      salt: String = "graft",
      trainPct: Int = 80,
      valPct: Int = 10): DataFrame = {
    val base = batch.select(
      col(idCol).as("id"), col(textCol).as("text"),
      col(sourceCol).as("source"), col(langCol).as("lang"))
    // the corpus carries the same idCol/textCol names as the batch
    val corpusNorm = corpus.select(col(idCol).as("id"), col(textCol).as("text"))

    // 1. quality gate against the frozen LM
    val gate = Dedup.truncate(
      Corpus.qualityGateAgainst(base, lmCounts, "id", "text", minTokens, maxTokens,
          maxTopNgramFrac, maxDupNgramFrac, maxAvgNll)
        .select(col("id"), col("n_tokens"), col("keep").as("gate_keep")))
    val kept1 = base.join(gate.filter(col("gate_keep")).select("id"), Seq("id"), "left_semi")

    // 2. in-batch near-dedup, keep-canonical (lowest id of each cluster)
    val dd = Dedup.truncate(
      Dedup.winnowNearDup(kept1, "id", "text", minJaccard = minJaccard,
          shingleWidth = shingleWidth)
        .select(col("id"), (col("cluster_id") <=> col("id")).as("canonical")))
    val kept2 = kept1.join(dd.filter(col("canonical")).select("id"), Seq("id"), "left_semi")

    // 3. batch-vs-corpus near-dedup: candidates are fingerprint collisions
    // only, the corpus never self-joins — O(corpus + batch + candidates)
    val cm = Dedup.truncate(
      Dedup.winnowIncremental(corpusNorm, kept2, "id", "text", minJaccard = minJaccard,
          shingleWidth = shingleWidth)
        .filter(col("matched_id").isNotNull)
        .select(col("id"), lit(true).as("corpus_dup")))
    val kept3 = kept2.join(cm.select("id"), Seq("id"), "left_anti")

    // 4. decontamination against the (broadcast) benchmark shingle set
    val dec = Dedup.truncate(
      Corpus.decontaminate(kept3, benchmark, "id", "text", shingleWidth, minShared)
        .select(col("id"), col("contaminated")))
    val kept4 = kept3.join(dec.filter(!col("contaminated")).select("id"), Seq("id"), "left_semi")

    // 5. deterministic split of the accepted docs
    val splits = Corpus.hashSplit(kept4, "id", salt, trainPct, valPct)
      .select(col("id"), col("split"))

    base.select(col("id"), col("source"), col("lang"))
      .join(gate, Seq("id"), "left")
      .join(dd, Seq("id"), "left")
      .join(cm, Seq("id"), "left")
      .join(dec, Seq("id"), "left")
      .join(splits, Seq("id"), "left")
      .withColumn("drop_stage",
        when(!col("gate_keep"), "quality")
          .when(!coalesce(col("canonical"), lit(false)), "duplicate")
          .when(coalesce(col("corpus_dup"), lit(false)), "duplicate_corpus")
          .when(col("contaminated"), "contaminated"))
      .withColumn("keep", col("drop_stage").isNull)
      .select(col("id"), col("source"), col("lang"), col("n_tokens"),
        col("drop_stage"), col("keep"), col("split"))
  }

  /** Wires [[assembleMicroBatch]] into a running ingestion query: per
    * micro-batch, re-reads the accepted-corpus store (growth from prior
    * batches included), assembles, appends the audit rows (tagged with the
    * micro-batch id) to `auditDir`, and appends the accepted documents to
    * `corpusDir`. The corpus store starts empty when `corpusDir` does not
    * exist yet — or seed it beforehand with an existing corpus.
    *
    * The stream must carry (idCol, textCol, sourceCol, langCol). Blocks
    * nothing: returns the started query (AvailableNow by default — drain
    * what exists, then stop — pass a processing-time trigger for 24/7). */
  def ingestCorpus(
      stream: DataFrame,
      corpusDir: String,
      auditDir: String,
      benchmark: DataFrame,
      lmCounts: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      langCol: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      minTokens: Long = 1L,
      maxTokens: Long = Long.MaxValue,
      maxTopNgramFrac: Double = 1.0,
      maxDupNgramFrac: Double = 1.0,
      maxAvgNll: Double = Double.MaxValue,
      minJaccard: Double = 0.8,
      shingleWidth: Int = 3,
      minShared: Long = 1L,
      salt: String = "graft",
      trainPct: Int = 80,
      valPct: Int = 10): StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .queryName("graft_ingest_corpus")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val base = batch.select(
          col(idCol).as("id"), col(textCol).as("text"),
          col(sourceCol).as("source"), col(langCol).as("lang"))
        val corpus = readCorpus(spark, corpusDir).getOrElse(base.limit(0))
        val audit = assembleMicroBatch(base, corpus, benchmark, lmCounts,
          "id", "text", "source", "lang", minTokens, maxTokens,
          maxTopNgramFrac, maxDupNgramFrac, maxAvgNll, minJaccard,
          shingleWidth, minShared, salt, trainPct, valPct)
          .withColumn("batch_id", lit(batchId))
        // audit first, then the corpus append: a crash between the two
        // leaves an audit row whose doc is missing from the store — the
        // replayed batch re-accepts it (near-dedup against the store is
        // what makes the replay converge rather than double-ingest)
        audit.write.mode("append").parquet(auditDir)
        base.join(audit.filter(col("keep")).select("id"), Seq("id"), "left_semi")
          .write.mode("append").parquet(corpusDir)
      }
      .start()
  }

  /** The accepted-corpus store, or None before the first batch created it.
    * Fresh read per call — each micro-batch must see prior appends. */
  private def readCorpus(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(dir)) else None
  }

  /** Compacts an append-mode store ([[ingestCorpus]]'s corpus or audit
    * directory): every micro-batch appends a handful of files, so a
    * long-running ingestion accumulates thousands of small parquet files —
    * the small-files problem that makes the per-batch corpus re-read (and
    * any downstream scan) open-file-bound instead of byte-bound. Rewrites
    * the store into `max(1, ceil(bytes / targetFileBytes))` files and swaps
    * directories: write to `<dir>.compact`, rename the live dir aside,
    * rename the compacted dir in, delete the old. The swap window is two
    * renames; run it from the single writer (between triggers, or while the
    * query is stopped) — the store has exactly one writer by [[ingestCorpus]]
    * design, so no second process can append mid-swap. Returns the file
    * count after compaction.
    *
    * Row content is preserved exactly (one pass, no shuffle beyond the
    * coalesce); a failure before the first rename leaves the live store
    * untouched, and after it the compacted data is complete on disk —
    * re-running [[compactStore]] is always safe. */
  def compactStore(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes >= 1, "targetFileBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no store at $dir")
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compact")
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    fs.delete(tmp, true); fs.delete(old, true)
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(p, old), s"could not move the live store aside: $dir")
    require(fs.rename(tmp, p), s"could not move the compacted store in: $dir")
    fs.delete(old, true)
    nFiles
  }
}
