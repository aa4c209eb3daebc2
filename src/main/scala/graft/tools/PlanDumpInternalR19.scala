package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** r19 optimization evidence (the [[PlanDumpInternal]] convention): the
  * quality gate and the iterative label loops pin/checkpoint their stages,
  * so a declared query's final `.explain` only shows the post-pin tail —
  * the optimized shapes live in the per-stage plans. Dumps the INTERNAL
  * stage plans with the pre-r19 shape reconstructed inline (the exact code
  * the r19 commit replaced, labeled `_before`) next to the shipped shape
  * (`_after`), to `plans/r19/internal_<stage>_{before,after}.txt`.
  *
  * Run: `runMain graft.tools.PlanDumpInternalR19 [sfDir] [outDir]`. */
object PlanDumpInternalR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r19")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"$name.txt"), txt.getBytes("UTF-8"))
      val nTok = "split\\(".r.findAllIn(txt).size
      val nScan = "Scan parquet".r.findAllIn(txt).size
      val nEx = "Exchange".r.findAllIn(txt).size
      println(s"[plandump] wrote $outDir/$name.txt " +
        s"(split()=$nTok, parquet scans=$nScan, Exchange mentions=$nEx)")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val toksCol = graft.functions.TextFunctions.tokens(col("text"))

    // ---- quality gate: tokenize passes ---------------------------------
    // pre-r19 shape (the exact code qualityGate ran): the LM trainer, the
    // LM scorer and the repetition signals each tokenize the text from
    // scratch — three split() subtrees / document scans in ONE gate
    locally {
      import graft.operators.Corpus
      val lmScored = Corpus.lmScoreAgainst(
        docs, Corpus.lmCounts(docs, "text"), "doc_id", "text")
      val rep = Corpus.repetitionStats(docs, "doc_id", "text", 2)
      val reasons = filter(array(
          when(col("n_tokens") < 5L, lit("too_short")),
          when(col("top_ngram_frac") > 0.5, lit("repetitive_top_ngram")),
          when(col("avg_nll").isNull, lit("low_lm_quality"))),
        x => x.isNotNull)
      dump("internal_gate_before",
        lmScored.select(col("id"), col("n_tokens"), col("avg_nll"))
          .join(rep.select(col("id").as("__qg_rep_id"),
            col("top_ngram_frac"), col("dup_ngram_frac")),
            col("id") <=> col("__qg_rep_id"), "inner")
          .withColumn("n_reasons", size(reasons).cast("long")))
    }
    // r19 shape, dumped as the two plans the shipped gate ACTUALLY runs:
    // (a) the pin job — the one tokenize pass (split()=1, one document
    // scan) that materializes the shared (id, tokens) projection; (b) the
    // real operator's returned post-pin plan — zero split(), zero document
    // scans, every branch reading the pinned RDD. (An unpinned inline
    // reconstruction is NOT dumped: Catalyst re-inlines the shared
    // projection into each consumer, which is exactly the re-tokenization
    // the pin exists to stop.)
    locally {
      dump("internal_gate_after_pinjob",
        docs.select(col("doc_id").as("id"), toksCol.as("__ts")))
      dump("internal_gate_after_postpin",
        graft.operators.Corpus.qualityGate(docs, "doc_id", "text",
          minTokens = 5L, maxTopNgramFrac = 0.5))
    }

    // ---- connectedComponents round: convergence diff --------------------
    // one representative round over a small confirmed-pair edge list
    val pairs = graft.operators.Dedup.simhashNearDup(docs.limit(2000), "doc_id", "text")
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val edges = pairs.select(col("src"), col("dst"))
      .union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val labels = edges.select(col("src").as("id")).distinct()
      .withColumn("component", col("id")).localCheckpoint()
    val neighborMin = edges.join(labels, edges("dst") === labels("id"))
      .groupBy(edges("src").as("id2")).agg(min(col("component")).as("nbr_min"))
    // pre-r19 shape: the round's checkpoint job PLUS a second join-shaped
    // job diffing new labels against old (dumped as that diff query)
    locally {
      val propagated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
      val reps = propagated.select(col("id").as("__rep_id"), col("component").as("__rep_component"))
      val next = propagated.join(reps, propagated("component") === reps("__rep_id"), "left")
        .select(propagated("id"), least(propagated("component"),
          coalesce(col("__rep_component"), propagated("component"))).as("component"))
        .localCheckpoint()
      dump("internal_cc_diff_before",
        next.alias("n").join(labels.alias("c"), col("n.id") === col("c.id"))
          .filter(col("n.component") =!= col("c.component")).limit(1))
    }
    // r19 shape: the previous label rides the round as __old, so the diff
    // is a row-local filter+count over the round's own checkpoint — no
    // join, and (on the localCheckpoint path) counted in the SAME job
    // that materializes the round
    locally {
      val propagated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(labels("id"),
          least(labels("component"), coalesce(col("nbr_min"), labels("component"))).as("component"),
          labels("component").as("__old"))
      val reps = propagated.select(col("id").as("__rep_id"), col("component").as("__rep_component"))
      val next = propagated.join(reps, propagated("component") === reps("__rep_id"), "left")
        .select(propagated("id"), least(propagated("component"),
          coalesce(col("__rep_component"), propagated("component"))).as("component"),
          col("__old"))
        .localCheckpoint(eager = false)
      dump("internal_cc_diff_after", next.filter(col("component") =!= col("__old")))
    }
    spark.stop()
  }
}
