package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** r18 optimization evidence: the iterative/eager operators (LPA, triangles,
  * winnow dedup) `localCheckpoint` their stages, so a declared query's final
  * `.explain` only shows the post-checkpoint tail — the optimized shapes
  * live in the per-stage plans. This tool dumps those INTERNAL stage plans,
  * with the pre-r18 shape reconstructed inline (the exact code the r18
  * commit removed, labeled `_before`) next to the shipped shape (`_after`),
  * to `plans/r18/internal_<stage>_{before,after}.txt`.
  *
  * Run: `runMain graft.tools.PlanDumpInternal [sfDir] [outDir]`. */
object PlanDumpInternal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r18")
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
      println(s"[plandump] wrote $outDir/$name.txt")
    }

    val li = Tables.load(spark, sfDir, "lineitem")
    val pairs = graft.operators.Graph.coOccurrence(li, "l_orderkey", "l_partkey",
        minPairCount = 1, maxBasketSize = 5)
      .select(col("item_a"), col("item_b"))
      .localCheckpoint() // stand-in for "upstream already materialized"

    // ---- LPA round: (node,label) count -> winner pick ------------------
    val und = pairs.select(col("item_a").as("u"), col("item_b").as("v"))
      .union(pairs.select(col("item_b").as("u"), col("item_a").as("v")))
      .localCheckpoint()
    val labels = und.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("label"))
      .localCheckpoint()
    val counts = und
      .join(labels.select(col("id").as("u"), col("label")), Seq("u"))
      .groupBy(col("v").as("id"), col("label"))
      .agg(count(lit(1)).as("__n"))
    // pre-r18 shape: row_number window (full sort of the count table)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__n").desc, col("label").asc)
    dump("internal_lpa_round_before",
      counts.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("id"), col("label").as("__new")))
    // r18 shape: argmin hash aggregate with map-side partials
    dump("internal_lpa_round_after",
      counts.groupBy(col("id"))
        .agg(min(struct((-col("__n")).as("__negn"), col("label"))).as("__m"))
        .select(col("id"), col("__m.label").as("__new")))

    // ---- triangles/kCore input normalization ---------------------------
    // pre-r18 shape: least/greatest + distinct (one full edge exchange)
    dump("internal_triangles_normalize_before",
      pairs.filter(col("item_a").isNotNull && col("item_b").isNotNull &&
          col("item_a") =!= col("item_b"))
        .select(least(col("item_a"), col("item_b")).as("u"),
          greatest(col("item_a"), col("item_b")).as("v"))
        .distinct())
    // r18 shape under inputNormalized = true: a bare projection
    dump("internal_triangles_normalize_after",
      pairs.select(col("item_a").as("u"), col("item_b").as("v")))

    // ---- winnow confirm: candidate pairs + shingle sets + jaccard ------
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id").as("id"), col("text"))
    val cand = Dedup.winnowPairs(docs, "id", "text")
      .select(col("id_a").as("batch_id"), col("id_b").as("corpus_id"))
      .localCheckpoint()
    // pre-r18 shape: shingleSets derived TWICE (one subtree per join side)
    // and jaccard via size(array_union(...))
    def shingleSetsOld(out: String): DataFrame = docs.select(
      col("id").as(out),
      array_distinct(graft.expressions.MinHashSignature.shingleHashes(
        transform(graft.functions.TextFunctions.tokens(col("text")),
          t => xxhash64(t)), 3)).as(s"${out}_sh"))
    val interOld = size(array_intersect(col("b_id_sh"), col("c_id_sh"))).cast("double")
    val uniOld = size(array_union(col("b_id_sh"), col("c_id_sh"))).cast("double")
    dump("internal_winnow_confirm_before",
      cand.join(shingleSetsOld("b_id"), col("batch_id") === col("b_id"))
        .join(shingleSetsOld("c_id"), col("corpus_id") === col("c_id"))
        .withColumn("jaccard",
          when(uniOld === 0.0, 0.0).otherwise(interOld / uniOld))
        .filter(col("jaccard") >= 0.8)
        .select(col("batch_id"), col("corpus_id"), col("jaccard")))
    // r18 shape: ONE pinned shingle-set scan feeding both sides, union
    // size arithmetic (|A|+|B|-|A∩B|) — no array_union node
    val ss = Dedup.shingleSets(docs, "id", "text", 3, "b_id").localCheckpoint()
    dump("internal_winnow_confirm_after",
      Dedup.confirmedMatchesFromSets(cand, ss,
        ss.select(col("b_id").as("c_id"), col("b_id_sh").as("c_id_sh")), 0.8))

    spark.stop()
  }
}
