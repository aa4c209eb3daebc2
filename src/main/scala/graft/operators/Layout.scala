package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout (SURVEY.md §2.3 extensions): Z-order
  * (Morton-curve) clustering, the standard warehouse trick for making
  * parquet min/max stats prune on SEVERAL columns at once (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`; Morton 1966). A range partition on a single
  * column gives perfect file skipping on that column and none on any
  * other; interleaving the bits of k per-column bucket ids gives every
  * column ~1/k of the skipping power — the right trade for the "filter by
  * time AND tenant AND shard" scan patterns a 100 TB corpus store serves.
  *
  * Bucketing is INTEGER-EXACT value-range binning:
  * `bucket = ((x − min) · 2^bits) div (max − min + 1)` over long
  * arithmetic — a pure function of (value, min, max), bit-identical in
  * any engine, which keeps the whole z-value oracle-checkable (unlike
  * quantile binning, whose boundaries depend on sampling). The min/max
  * pass rides ONE 1-row aggregate broadcast onto the scan (the LM-scorer
  * crossJoin shape). Value-range binning is skew-sensitive by design —
  * callers with pathological skew can pre-transform the column; the
  * z-ORDER only needs buckets to be monotone in the value, not uniform.
  *
  * Scale shape: z-value computation is row-local codegen'd integer
  * arithmetic (no shuffle, no UDF); [[cluster]] adds the single
  * repartitionByRange exchange that any layout rewrite inherently costs,
  * then sorts within partitions so every output file covers a tight
  * z-range (parquet writes min/max stats per file/row-group; a reader
  * filtering on any z-order column skips most files). NULLs sort to
  * bucket 0 so they cluster together instead of scattering.
  */
object Layout {

  /** Max total interleaved bits that fit a non-negative LONG. */
  private val MaxTotalBits = 62

  /** Appends a `zval` column: the Morton interleave of `bitsPerCol`-bit
    * value-range bucket ids of `cols` (all must be integral types).
    * Deterministic given the data — min/max are exact aggregates. */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bitsPerCol: Int = 8,
      outCol: String = "zval"): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(bitsPerCol >= 1 && cols.size * bitsPerCol <= MaxTotalBits,
      s"cols.size * bitsPerCol must be in [1, $MaxTotalBits] " +
        s"(got ${cols.size} x $bitsPerCol)")
    cols.foreach { c =>
      val dt = df.schema(c).dataType.typeName
      require(Set("long", "integer", "short", "byte").contains(dt),
        s"zorder column $c must be integral (got $dt); pre-transform " +
          "doubles/strings/dates to a monotone integer first")
    }
    // ONE 1-row exact min/max aggregate for every column, broadcast onto
    // the scan (crossJoin of a single row — the established totals shape)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"__min_$c"),
      max(col(c).cast("long")).as(s"__max_$c")))
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val nb = 1L << bitsPerCol
    // overflow guard: the bucket formula multiplies (x−min) by 2^bits in
    // LONG arithmetic, so a span wider than 2^(63−bits) would silently
    // wrap (and min=Long.MinValue/max=Long.MaxValue overflows the divisor
    // to 0 → divide-by-zero), corrupting z-values without error — buckets
    // are documented as exactly re-derivable, so fail LOUDLY instead.
    // One extra assert column per bound rides the same 1-row broadcast;
    // raise_error evaluates per output row but only on violating bounds.
    val maxSpan = Long.MaxValue >> bitsPerCol
    val guarded = cols.foldLeft(bounds) { (acc, c) =>
      // try_subtract: the span itself can overflow long (min near
      // Long.MinValue, max near Long.MaxValue) — ANSI mode would throw an
      // unactionable ARITHMETIC_OVERFLOW there, non-ANSI would wrap
      // negative; either way the NULL/out-of-range span routes into THIS
      // guard's actionable message instead
      val span = try_subtract(col(s"__max_$c"), col(s"__min_$c"))
      acc.withColumn(s"__min_$c",
        when(col(s"__max_$c").isNull ||
            (span.isNotNull && span >= 0 && span <= maxSpan),
          col(s"__min_$c"))
          .otherwise(raise_error(concat(
            lit(s"zorder column $c value span exceeds 2^${63 - bitsPerCol} " +
              "(bucket arithmetic would overflow silently); rescale the " +
              "column or lower bitsPerCol [span: "),
            coalesce(span.cast("string"), lit("long-overflow")), lit("]")))
            .cast("long")))
    }
    // bucket = ((x − min) · nb) div span: SQL `div` keeps the division in
    // LONG arithmetic end-to-end (Column `/` is double division, whose
    // rounding could diverge from an engine twin at large magnitudes);
    // NULL values land in bucket 0 so they cluster instead of scattering
    val withBuckets = cols.foldLeft(df.crossJoin(broadcast(guarded))) { (acc, c) =>
      acc.withColumn(s"__bk_$c",
        coalesce(
          expr(s"((cast(`$c` as bigint) - `__min_$c`) * ${nb}L) div " +
            s"(`__max_$c` - `__min_$c` + 1L)"),
          lit(0L)))
    }
    // Morton interleave: bit i of column j lands at position i*k + j —
    // k*bits shift/mask terms, all codegen'd integer ops
    val k = cols.size
    val z = (0 until bitsPerCol).flatMap { i =>
      cols.zipWithIndex.map { case (c, j) =>
        shiftleft(shiftright(col(s"__bk_$c"), i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ + _)
    withBuckets
      .withColumn(outCol, z)
      .drop(cols.flatMap(c => Seq(s"__min_$c", s"__max_$c", s"__bk_$c")): _*)
  }

  /** Rewrites the frame's layout: z-value → range partition → sort within
    * partitions. Each output partition (→ parquet file on write) covers a
    * tight z-range, so min/max stats prune on EVERY zorder column. The
    * `zval` column is dropped from the result — it has done its job once
    * the rows are placed. */
  def cluster(
      df: DataFrame,
      cols: Seq[String],
      numPartitions: Int,
      bitsPerCol: Int = 8): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    withZValue(df, cols, bitsPerCol)
      .repartitionByRange(numPartitions, col("zval"))
      .sortWithinPartitions("zval")
      .drop("zval")
  }
}
