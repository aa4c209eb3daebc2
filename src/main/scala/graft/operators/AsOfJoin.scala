package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * lands on one task. When one key dominates, pre-bucket it by coarse time
  * range (window on (key, floor(ts / bucket)), carrying each bucket's last
  * right row into the next bucket) to re-parallelize the sort.
  */
object AsOfJoin {

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
    val leftCols = left.columns.toSeq
    // side=0 sorts right rows before left rows at equal timestamps → the
    // backward match is inclusive (a right row at exactly left.ts matches)
    val taggedRight = right.select(
      (col(keyCol) +: col(rightTsCol).as("__ts") +: lit(0).as("__side") +:
        payloadCols.map(c => col(c).as(s"__p_$c")) ++:
        leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (col(keyCol) +: col(leftTsCol).cast(right.schema(rightTsCol).dataType).as("__ts") +:
        lit(1).as("__side") +:
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++:
        leftCols.filterNot(_ == keyCol).map(col)): _*)
    val unioned = taggedLeft.unionByName(taggedRight)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry ONE struct per right row (not one last() per payload column):
    // the matched timestamp and every payload value always come from the
    // SAME most-recent right row, so a genuinely-NULL payload on the newest
    // match stays NULL instead of falling back to an older row's value.
    // Right rows with a NULL timestamp are not matchable (no defined order
    // position — same as DuckDB ASOF), so they must not produce a struct.
    val carried = unioned.withColumn("__c",
      last(
        when(col("__side") === 0 && col("__ts").isNotNull,
          struct(col("__ts").as("__m_ts") +: payloadCols.map(c => col(s"__p_$c").as(s"__m_$c")): _*)),
        ignoreNulls = true).over(w))
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
}
