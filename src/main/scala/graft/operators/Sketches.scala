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
    * `ranks` — one column per rank, named `q<rank·100>` with any
    * fractional percent spelled with `_` as the decimal point (0.5 → q50,
    * 0.975 → q97_5, 0.005 → q0_5) so NEARBY ranks never collide into
    * duplicate column names (a rounded `q<round(rank·100)>` would map
    * 0.975 and 0.98 both to q98 and return an ambiguous-column frame with
    * no error). Duplicate ranks are rejected up front. Estimates are
    * always actual data values (KLL stores a sample of the input); a
    * group whose every sketch was empty reads NaN, failing loudly
    * downstream. */
  def kllUnionQuantiles(
      sketches: DataFrame,
      ranks: Seq[Double],
      k: Int = 200): DataFrame = {
    require(ranks.nonEmpty, "need at least one rank")
    require(ranks.forall(r => r >= 0.0 && r <= 1.0), "ranks must be in [0, 1]")
    require(ranks.distinct.length == ranks.length,
      s"ranks must be distinct, got $ranks")
    val names = ranks.map(quantileColName)
    require(names.distinct.length == names.length,
      s"rank column names collide: $names — ranks closer than 1e-6 are not distinguishable")
    val merged = sketches.groupBy(col("group"))
      .agg(
        graft.expressions.KllSketchAgg
          .kllUnionQuantiles(col("sketch"), ranks, k).as("__q"),
        sum(col("n_rows")).as("n_rows"))
    val qCols = names.zipWithIndex.map { case (n, i) =>
      element_at(col("__q"), i + 1).as(n)
    }
    merged.select(col("group") +: qCols :+ col("n_rows"): _*)
  }

  /** Collision-free quantile column name: percent with `_` as the decimal
    * point and trailing zeros stripped — q50, q97_5, q0_5; backward
    * compatible with the integer-percent names for whole percents. */
  private[graft] def quantileColName(rank: Double): String = {
    val micropct = math.round(rank * 1e8)   // percent at 1e-6 precision
    val whole = micropct / 1000000L
    val frac = micropct % 1000000L
    if (frac == 0L) s"q$whole"
    else s"q${whole}_${f"$frac%06d".reverse.dropWhile(_ == '0').reverse}"
  }

  /** Per-group frequent-items (heavy-hitters) sketch + row count — the
    * THIRD member of the sketch store (HLL = distinct counts, KLL =
    * quantiles, this = top items): "which supplier keys / user ids
    * dominate each partition, across any date range, without rescanning
    * history". O(maxMapSize) bytes per group, lossless-in-guarantee merge.
    *
    * ITEM DOMAIN: this pair sketches INTEGRAL items (the DataSketches
    * LongsSketch) and rejects any other item type up front — a string
    * column would long-cast to NULL row by row (non-ANSI) and fill the
    * store with silently-empty sketches. String domains/tokens go through
    * the typed twin [[freqStrByGroup]]/[[freqStrUnionItems]]; the two
    * stores' binaries are NOT interchangeable.
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
    requireIntegralItems(df, itemCol)
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
    unionItemsTail(sketches,
      graft.expressions.FreqSketchAgg.freqUnionItems(col("sketch"), maxMapSize))

  /** STRING-domain twin of [[freqByGroup]] — heavy hitters over a string
    * item column (domains, tokens, source names) via the DataSketches
    * `ItemsSketch[String]`, same guarantees, same store discipline. */
  def freqStrByGroup(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      maxMapSize: Int = 256): DataFrame = {
    require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
      "maxMapSize must be a power of 2, at least 8 (DataSketches bound)")
    require(df.schema(itemCol).dataType == org.apache.spark.sql.types.StringType,
      s"freqStrByGroup sketches STRING items; '$itemCol' is " +
        s"${df.schema(itemCol).dataType.simpleString} — use freqByGroup for integral items")
    df.groupBy(col(groupCol).as("group"))
      .agg(
        graft.expressions.FreqStrSketchAgg
          .freqStrSketch(col(itemCol), maxMapSize).as("sketch"),
        count(col(itemCol)).as("n_rows"))
  }

  /** Union a STRING frequent-items sketch table ([[freqStrByGroup]]
    * output) back to one row per (group, tracked item). */
  def freqStrUnionItems(
      sketches: DataFrame,
      maxMapSize: Int = 256): DataFrame =
    unionItemsTail(sketches,
      graft.expressions.FreqStrSketchAgg.freqStrUnionItems(col("sketch"), maxMapSize))

  private def unionItemsTail(
      sketches: DataFrame,
      unionAgg: org.apache.spark.sql.Column): DataFrame =
    sketches.groupBy(col("group"))
      .agg(unionAgg.as("__items"), sum(col("n_rows")).as("n_rows"))
      .select(col("group"), explode(col("__items")).as("__i"), col("n_rows"))
      .select(col("group"), col("__i.item").as("item"), col("__i.est").as("est"),
        col("__i.lb").as("lb"), col("__i.ub").as("ub"), col("n_rows"))

  private def requireIntegralItems(df: DataFrame, itemCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val t = df.schema(itemCol).dataType
    require(t == ByteType || t == ShortType || t == IntegerType || t == LongType,
      s"freqByGroup sketches INTEGRAL items (long sketch); '$itemCol' is " +
        s"${t.simpleString} — a non-integral cast to long would NULL every item " +
        "and produce empty sketches. Use freqStrByGroup for string domains.")
  }

  // ------------------------------------------------------- theta (set algebra)

  /** Per-group THETA sketch + row count — the SET-ALGEBRA member of the
    * sketch store (HLL = distinct counts, KLL = quantiles, frequent items
    * = top items, this = distinct-set INTERSECTION/DIFFERENCE): "how many
    * users did A AND B", "how many of yesterday's distinct users are gone
    * today" — questions an HLL store cannot answer because union is its
    * only operation. Items may be integral (long hash) or string (string
    * hash), dispatched on the column type up front.
    *
    * DETERMINISM (pinned in OpsSpec): the retained min-k hash set is
    * order-independent, so same items → same ordered compact binary at
    * any partitioning, exact mode or sampling mode — the strongest
    * contract in the sketch store. Estimates are EXACT below ~2^lgK
    * distinct items per group; beyond, relative error ~1/√2^lgK.
    *
    * Scale shape: one group-key reduce with map-side partial sketches;
    * the store is O(groups · 2^lgK · 8) bytes, append-only by batch
    * partition, re-mergeable by [[thetaUnionSketches]]; all segment
    * algebra downstream is row-local over joined sketch binaries —
    * raw events never shuffle twice. */
  def thetaByGroup(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      lgK: Int = 12): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    require(lgK >= 4 && lgK <= 26, "lgK must be in [4, 26] (DataSketches bounds)")
    val t = df.schema(itemCol).dataType
    val (item, isStr) = t match {
      case ByteType | ShortType | IntegerType | LongType =>
        (col(itemCol).cast("long"), false)
      case StringType => (col(itemCol), true)
      case other => throw new IllegalArgumentException(
        s"thetaByGroup items must be integral or string; '$itemCol' is ${other.simpleString}")
    }
    df.groupBy(col(groupCol).as("group"))
      .agg(
        graft.expressions.ThetaSketchAgg
          .thetaSketch(item, lgK, isStr).as("sketch"),
        count(col(itemCol)).as("n_rows"))
  }

  /** Merge a theta sketch table (e.g. many per-batch [[thetaByGroup]]
    * outputs) back to one merged sketch + estimate per group — the
    * re-aggregation member; keep the merged binary for further algebra. */
  def thetaUnionSketches(
      sketches: DataFrame,
      lgK: Int = 12): DataFrame =
    sketches.groupBy(col("group"))
      .agg(
        graft.expressions.ThetaSketchAgg
          .thetaUnion(col("sketch"), lgK).as("sketch"),
        sum(col("n_rows")).as("n_rows"))
      .select(col("group"), col("sketch"),
        graft.expressions.ThetaSketchAgg.thetaEstimate(col("sketch"))
          .as("distinct_est"),
        col("n_rows"))

  /** Segment-overlap report between two per-group sketch tables
    * ([[thetaByGroup]]/[[thetaUnionSketches]] outputs, same group
    * domain): one row per group present in EITHER side with the full set
    * algebra — |A|, |B|, |A∪B|, |A∩B|, |A\B|, |B\A| and
    * `jaccard_micro = round(1e6 · |A∩B| / |A∪B|)` (0 for two empty
    * segments). ONE co-partitioned full-outer join on the group key;
    * every estimate is a row-local sketch operation — the raw events
    * behind the segments are never touched. Missing side = empty segment
    * (NULL-safe: estimates coalesce to 0). */
  def thetaOverlap(
      a: DataFrame,
      b: DataFrame): DataFrame = {
    import graft.expressions.ThetaSketchAgg._
    val ja = a.select(col("group"), col("sketch").as("__sa"))
    val jb = b.select(col("group"), col("sketch").as("__sb"))
    val both = ja.join(jb, Seq("group"), "full_outer")
    val aEst = when(col("__sa").isNull, lit(0.0)).otherwise(thetaEstimate(col("__sa")))
    val bEst = when(col("__sb").isNull, lit(0.0)).otherwise(thetaEstimate(col("__sb")))
    val inter = when(col("__sa").isNull || col("__sb").isNull, lit(0.0))
      .otherwise(thetaIntersectEstimate(col("__sa"), col("__sb")))
    val uni = when(col("__sa").isNull, bEst)
      .when(col("__sb").isNull, aEst)
      .otherwise(thetaUnionEstimate(col("__sa"), col("__sb")))
    val aNotB = when(col("__sa").isNull, lit(0.0))
      .when(col("__sb").isNull, aEst)
      .otherwise(thetaANotBEstimate(col("__sa"), col("__sb")))
    val bNotA = when(col("__sb").isNull, lit(0.0))
      .when(col("__sa").isNull, bEst)
      .otherwise(thetaANotBEstimate(col("__sb"), col("__sa")))
    both.select(col("group"),
      aEst.as("a_est"), bEst.as("b_est"),
      uni.as("union_est"), inter.as("intersect_est"),
      aNotB.as("a_not_b_est"), bNotA.as("b_not_a_est"),
      when(uni > 0.0, round(inter * lit(1e6) / uni).cast("long"))
        .otherwise(lit(0L)).as("jaccard_micro"))
  }
}
