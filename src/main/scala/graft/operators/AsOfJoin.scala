package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** As-of (backward) join — an operator the reference surface lacks entirely
  * (SURVEY.md §2.2c: PySpark classic has none): for every left row, attach
  * the most recent right row with right.ts <= left.ts within the same key.
  *
  * Implementation is the scale-safe union + last-value carry-forward:
  * tag both sides, union, and let `last(_, ignoreNulls=true)` over a
  * (key, ts, side) window carry the latest right payload onto each left row.
  * ONE shuffle on the key — no range-join explosion, no per-row probing —
  * so cost is O(n log n) per key partition regardless of time-range width.
  *
  * Skew caveat: AQE's skew mitigation splits oversized JOIN partitions, not
  * window partitions — a single pathologically hot key's window sort still
  * lands on one task under [[backward]]. When one key dominates, use
  * [[backwardBucketed]]: it windows on (key, coarse time bucket) so the hot
  * key's sort splits across buckets, then stitches buckets together with an
  * O(keys × buckets) carry-in pass. Same results (pinned in
  * AdviceRegressionSpec), one extra small shuffle — prefer plain
  * [[backward]] unless a hot key is measured.
  */
object AsOfJoin {

  /** Union of both sides with right payload in `__p_*` slots, order columns
    * `__ts` / `__side` (side=0 sorts right rows before left rows at equal
    * timestamps → the backward match is inclusive). */
  private def tagAndUnion(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedRight = right.select(
      (col(keyCol) +: col(rightTsCol).as("__ts") +: lit(0).as("__side") +:
        payloadCols.map(c => col(c).as(s"__p_$c")) ++:
        leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(keyCol) +: col(leftTsCol).cast(right.schema(rightTsCol).dataType).as("__ts") +:
        lit(1).as("__side") +:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++:
        leftCols.filterNot(_ == keyCol).map(col)): _*)
    taggedLeft.unionByName(taggedRight)
  }

  /** The matchable-right-row struct carried forward by the window: NULL for
    * left rows and for right rows with a NULL timestamp (no defined order
    * position — same as DuckDB ASOF). Carrying ONE struct per right row (not
    * one last() per payload column) keeps the matched timestamp and every
    * payload value from the SAME most-recent right row, so a genuinely-NULL
    * payload on the newest match stays NULL instead of falling back to an
    * older row's value. */
  private def rightStruct(payloadCols: Seq[String]): Column =
    when(col("__side") === 0 && col("__ts").isNotNull,
      struct(col("__ts").as("__m_ts") +: payloadCols.map(c => col(s"__p_$c").as(s"__m_$c")): _*))

  /** Final projection: keep left rows, unpack the carried struct, apply the
    * optional tolerance (matches older than `tolerance` seconds are nulled). */
  private def project(
      carried: DataFrame,
      keyCol: String,
      leftCols: Seq[String],
      payloadCols: Seq[String],
      tolerance: Option[Long]): DataFrame = {
    val withinTol: Column = tolerance match {
      case Some(secs) =>
        col("__c").isNotNull &&
          (unix_timestamp(col("__ts")) - unix_timestamp(col("__c.__m_ts"))) <= secs
      case None => col("__c").isNotNull
    }
    carried
      .filter(col("__side") === 1)
      .select(
        (col(keyCol) +: leftCols.filterNot(_ == keyCol).map(col)) ++
          payloadCols.map(c =>
            when(withinTol, col(s"__c.__m_$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }

  /** @param left       left frame
    * @param right      right frame
    * @param keyCol     equi key present on both sides
    * @param leftTsCol  left event-time column
    * @param rightTsCol right event-time column
    * @param payloadCols right columns to carry (renamed as given)
    * @param tolerance  optional max lookback as a Column interval predicate
    *                   in seconds; matches older than this are nulled out
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val unioned = tagAndUnion(left, right, keyCol, leftTsCol, rightTsCol, payloadCols)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("__c", last(rightStruct(payloadCols), ignoreNulls = true).over(w))
    project(carried, keyCol, left.columns.toSeq, payloadCols, tolerance)
  }

  /** Hot-key variant of [[backward]] (the mitigation the skew caveat above
    * describes): same semantics, but the big window runs per
    * (key, floor(ts / bucketWidth)) so a single dominant key's sort
    * parallelizes across time buckets instead of serializing on one task.
    *
    * Stitching: a left row whose bucket holds no earlier right row must
    * reach back to the latest right row of the nearest PRECEDING non-empty
    * bucket (which may be many buckets back). That carry-in is computed on
    * per-(key, bucket) SUMMARIES — one row per key×bucket, so the per-key
    * stitch window is O(buckets), never O(rows) — then joined back on
    * (key, bucket), an equi join AQE can split. Bucket assignment uses
    * second-truncated epochs, which is order-preserving, so results equal
    * [[backward]] exactly (ties among identical right timestamps are
    * nondeterministic in BOTH variants, as in any window `last`).
    *
    * @param bucketWidth coarse bucket width — seconds for timestamp/date
    *                    columns, plain value units for numeric ts columns;
    *                    pick ≫ median right-row spacing so most matches
    *                    resolve within their own bucket
    */
  def backwardBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      bucketWidth: Long,
      tolerance: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val unioned0 = tagAndUnion(left, right, keyCol, leftTsCol, rightTsCol, payloadCols)
    val tsNum: Column = right.schema(rightTsCol).dataType match {
      case TimestampType => unix_timestamp(col("__ts")).cast("double")
      case TimestampNTZType | DateType =>
        unix_timestamp(col("__ts").cast(TimestampType)).cast("double")
      case _ => col("__ts").cast("double")
    }
    val unioned = unioned0.withColumn("__b", floor(tsNum / lit(bucketWidth.toDouble)))
    // pass 1: carry within each (key, bucket) — the parallelized big sort
    val wB = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = unioned.withColumn("__c0", last(rightStruct(payloadCols), ignoreNulls = true).over(wB))
    // pass 2: per-(key, bucket) summaries — every bucket any row touches,
    // with that bucket's last matchable right struct (NULL when none)
    val summaries = unioned
      .withColumn("__r", rightStruct(payloadCols))
      .groupBy(col(keyCol), col("__b"))
      .agg(max_by(col("__r"), when(col("__r").isNotNull, col("__ts"))).as("__last"))
    // pass 3: carry-in = latest right struct from any strictly-earlier
    // bucket (ignoreNulls skips empty buckets) — O(buckets) rows per key
    val wK = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = summaries.withColumn("__cin", last(col("__last"), ignoreNulls = true).over(wK))
      .select(col(keyCol), col("__b"), col("__cin"))
    // stitch: same-bucket match wins, else the carry-in from earlier buckets.
    // Null-safe equality + left join: __b is NULL for NULL-__ts rows (and
    // keyCol itself may be NULL); [[backward]] keeps such left rows with NULL
    // asof_* columns, so a plain using-join here would silently drop them.
    val cin = carryIn
      .withColumnRenamed(keyCol, "__cin_k")
      .withColumnRenamed("__b", "__cin_b")
    val carried = within
      .join(cin, col(keyCol) <=> col("__cin_k") && col("__b") <=> col("__cin_b"), "left")
      .drop("__cin_k", "__cin_b")
      .withColumn("__c", coalesce(col("__c0"), col("__cin")))
    project(carried, keyCol, left.columns.toSeq, payloadCols, tolerance)
  }
}
