package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe range joins (SURVEY.md §2.2c "theta / non-equi").
  *
  * A bare `points JOIN intervals ON p BETWEEN lo AND hi` has no equi
  * conjunct, so Spark plans a broadcast-nested-loop join — O(|points| ×
  * |intervals|) comparisons, which detonates at cluster scale. Binning
  * restores an equi key: intervals replicate onto every fixed-width bin they
  * overlap (a row-local `explode(sequence(...))`), points map to exactly one
  * bin, and the join becomes a plain shuffled equi-join on the bin id with
  * the exact `BETWEEN` evaluated as a residual filter. Cost is
  * O(|points| + |intervals| × avgBinsPerInterval) — pick `binWidth` near the
  * typical interval length so the replication factor stays small.
  *
  * Each (interval, bin) pair is emitted once and a point owns one bin, so no
  * post-join dedup is needed: the result multiset equals the naive join's.
  */
object RangeJoin {

  /** Joins `points` to every interval row with `lo <= point <= hi`.
    * Column names must not collide across the two inputs (alias first). */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedPoints = points.withColumn(
      "__bin", floor(col(pointCol) / binWidth).cast("long"))
    val binnedIntervals = intervals.withColumn(
      "__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval×interval overlap join: every pair with
    * `aLo <= bHi AND bLo <= aHi` (closed intervals — touching endpoints
    * overlap). The interval twin of [[pointInInterval]], and the shape
    * behind campaign-attribution windows, downtime×session intersection,
    * and any "which spans intersect" question.
    *
    * Scale path: both sides replicate onto every fixed-width bin they
    * cover (row-local `explode(sequence(...))`), the join is a plain
    * shuffled EQUI-join on the bin id, and each qualifying pair is kept
    * exactly ONCE — at the bin containing `greatest(aLo, bLo)`, the start
    * of the overlap, which both intervals necessarily cover — so no
    * post-join dedup shuffle exists. The exact overlap predicate runs as
    * a row-local residual filter. Cost is O(Σ bins per interval) join
    * input; pick `binWidth` near the typical interval length.
    *
    * Column names must not collide across the two inputs (alias first). */
  def intervalOverlap(
      a: DataFrame,
      aLo: String,
      aHi: String,
      b: DataFrame,
      bLo: String,
      bHi: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, lo: String, hi: String) = df.withColumn(
      "__bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("__bin"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__bin") ===
        floor(greatest(col(aLo), col(bLo)) / binWidth).cast("long"))
      .drop("__bin")
  }
}
