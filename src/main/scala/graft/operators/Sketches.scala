package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (SURVEY.md §2.3 extensions): per-group
  * HLL distinct-count sketches that PERSIST as plain binary columns and
  * merge across batches/partitions/days without rescanning history — the
  * building block every 100 TB "distinct users per X over any date range"
  * dashboard reduces to (Apache DataSketches HLL, the engine behind
  * Spark's `hll_sketch_agg`/`hll_union_agg`).
  *
  * Why sketches and not `countDistinct`: exact distinct counts don't
  * compose — yesterday's count plus today's count overcounts the overlap,
  * so exact rollups re-shuffle ALL history every time. A sketch store is
  * O(groups × 2^lgK) bytes, append-only, and unions losslessly (register
  * max), so the re-aggregation input is sketch rows, never raw events.
  *
  * Determinism: DataSketches HLL is deterministic for a fixed lgK (same
  * hash, same registers at any partitioning), and a union of same-lgK
  * sketches reproduces the direct whole-input sketch register-for-register
  * — pinned in OpsSpec, and surfaced as a verdict column in the declared
  * property query (estimates themselves are approximate, so the oracle is
  * a tolerance property, the hash-family convention). */
object Sketches {

  /** Per-group HLL sketch + row count. The sketch column is a plain
    * binary: write it to parquet as a day/batch partition and the store
    * composes by [[hllUnionEstimate]] later. */
  def hllByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, "lgK must be in [4, 21] (DataSketches bounds)")
    df.groupBy(col(groupCol).as("group"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"),
        count(col(valueCol)).as("n_rows"))
  }

  /** Merge a sketch table (e.g. the union of many per-batch
    * [[hllByGroup]] outputs) back to per-group estimates. `allowDifferentLgK`
    * stays false: silently unioning mixed-precision sketches degrades to
    * the coarsest and that should be an explicit decision. */
  def hllUnionEstimate(
      sketches: DataFrame,
      allowDifferentLgK: Boolean = false): DataFrame =
    sketches.groupBy(col("group"))
      .agg(
        hll_sketch_estimate(
          hll_union_agg(col("sketch"), lit(allowDifferentLgK))).as("distinct_est"),
        sum(col("n_rows")).as("n_rows"))

  /** Per-group KLL quantile sketch + row count — the QUANTILE member of
    * the sketch store (exact percentiles don't compose across batches any
    * more than exact distincts do; a KLL store is O(groups · k · log n)
    * bytes and unions losslessly in rank error). The sketch column is a
    * plain binary: write it as a day/batch partition and re-aggregate with
    * [[kllUnionQuantiles]] later, history never rescanned.
    *
    * UNLIKE the HLL store, KLL compaction is randomized, so the contract
    * is the published ~1.65/√k rank-error bound (tolerance-pinned in
    * OpsSpec and the declared property query), never byte-equality. */
  def kllByGroup(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 200): DataFrame = {
    require(k >= 8, "k must be at least 8 (DataSketches bound)")
    df.groupBy(col(groupCol).as("group"))
      .agg(
        graft.expressions.KllSketchAgg
          .kllSketch(col(valueCol).cast("double"), k).as("sketch"),
        count(col(valueCol)).as("n_rows"))
  }

  /** Union a KLL sketch table back to per-group quantile estimates at
    * `ranks` — one column per rank, named `q<rank·100>`. Estimates are
    * always actual data values (KLL stores a sample of the input); a
    * group whose every sketch was empty reads NaN, failing loudly
    * downstream. */
  def kllUnionQuantiles(
      sketches: DataFrame,
      ranks: Seq[Double],
      k: Int = 200): DataFrame = {
    require(ranks.nonEmpty, "need at least one rank")
    require(ranks.forall(r => r >= 0.0 && r <= 1.0), "ranks must be in [0, 1]")
    val merged = sketches.groupBy(col("group"))
      .agg(
        graft.expressions.KllSketchAgg
          .kllUnionQuantiles(col("sketch"), ranks, k).as("__q"),
        sum(col("n_rows")).as("n_rows"))
    val qCols = ranks.zipWithIndex.map { case (r, i) =>
      element_at(col("__q"), i + 1).as(s"q${math.round(r * 100)}")
    }
    merged.select(col("group") +: qCols :+ col("n_rows"): _*)
  }

  /** Per-group frequent-items (heavy-hitters) sketch + row count — the
    * THIRD member of the sketch store (HLL = distinct counts, KLL =
    * quantiles, this = top items): "which suppliers / domains / tokens
    * dominate each partition, across any date range, without rescanning
    * history". O(maxMapSize) bytes per group, lossless-in-guarantee merge.
    *
    * Contract (pinned in OpsSpec and the declared property query): purge
    * and merge order make ESTIMATES run-dependent, but every item's true
    * count lies in [lb, ub] and no item above the merged maximum error is
    * ever missing from [[freqUnionItems]]'s NO_FALSE_NEGATIVES table. */
  def freqByGroup(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      maxMapSize: Int = 256): DataFrame = {
    require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
      "maxMapSize must be a power of 2, at least 8 (DataSketches bound)")
    df.groupBy(col(groupCol).as("group"))
      .agg(
        graft.expressions.FreqSketchAgg
          .freqSketch(col(itemCol).cast("long"), maxMapSize).as("sketch"),
        count(col(itemCol)).as("n_rows"))
  }

  /** Union a frequent-items sketch table back to one row per (group,
    * tracked item) with estimate and exact-count bounds. */
  def freqUnionItems(
      sketches: DataFrame,
      maxMapSize: Int = 256): DataFrame =
    sketches.groupBy(col("group"))
      .agg(
        graft.expressions.FreqSketchAgg
          .freqUnionItems(col("sketch"), maxMapSize).as("__items"),
        sum(col("n_rows")).as("n_rows"))
      .select(col("group"), explode(col("__items")).as("__i"), col("n_rows"))
      .select(col("group"), col("__i.item").as("item"), col("__i.est").as("est"),
        col("__i.lb").as("lb"), col("__i.ub").as("ub"), col("n_rows"))
}
