package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ/"unit tests for
  * data" model, Schelter et al., VLDB 2018) — a user states constraints
  * over a table and gets back one verdict row per constraint with exact
  * violation counts, instead of hand-writing N audit queries.
  *
  * Semantics (documented per constraint below): value constraints are
  * NULL-IGNORING — a NULL never violates `InRange`/`InSet`/`MatchesRegex`;
  * completeness is its own constraint (`NotNull`), so a check suite
  * composes the two explicitly instead of conflating "missing" with
  * "wrong" (the Deequ completeness/compliance split).
  *
  * Scale shape: every row-local constraint in the suite evaluates in ONE
  * shared scan — a single partial-aggregate pass (map-side combined, no
  * shuffle beyond the 1-row final merge) no matter how many constraints —
  * and each `Unique` constraint adds exactly one groupBy on its own key.
  * Verdicts are exact integer counts, so the whole suite re-derives in
  * ANSI SQL and is reproducible at any partitioning.
  */
object Checks {

  sealed trait Constraint

  /** Violated by NULL values of `column`. */
  final case class NotNull(column: String) extends Constraint

  /** Violated by non-NULL values outside [lo, hi] (inclusive). */
  final case class InRange(column: String, lo: Double, hi: Double) extends Constraint

  /** Violated by non-NULL values not in `values`. */
  final case class InSet(column: String, values: Seq[Any]) extends Constraint

  /** Violated by non-NULL values not containing a match of `pattern`
    * (unanchored, `rlike` semantics — anchor with ^...$ for full-match). */
  final case class MatchesRegex(column: String, pattern: String) extends Constraint

  /** Violated by every row whose `columns` key occurs more than once
    * (the violation count is the number of rows in duplicated key groups,
    * not the number of duplicated keys). NULL key components group like
    * values. */
  final case class Unique(columns: Seq[String]) extends Constraint

  /** Table-level row-count bound: violations is 0 or 1. */
  final case class RowCountBetween(lo: Long, hi: Long) extends Constraint

  private[operators] def meta(c: Constraint): (String, String, String) = c match {
    case NotNull(col)          => (s"not_null($col)", "not_null", col)
    case InRange(col, lo, hi)  => (s"in_range($col)", "in_range", s"$col in [$lo, $hi]")
    case InSet(col, vs)        => (s"in_set($col)", "in_set", s"$col in {${vs.mkString(",")}}")
    case MatchesRegex(col, p)  => (s"regex($col)", "regex", s"$col ~ $p")
    case Unique(cols)          => (s"unique(${cols.mkString(",")})", "unique", cols.mkString(","))
    case RowCountBetween(l, h) => ("row_count", "row_count", s"rows in [$l, $h]")
  }

  private def violation(c: Constraint): Option[Column] = c match {
    case NotNull(cl)         => Some(when(col(cl).isNull, 1L).otherwise(0L))
    case InRange(cl, lo, hi) =>
      Some(when(col(cl).isNotNull && (col(cl) < lit(lo) || col(cl) > lit(hi)), 1L).otherwise(0L))
    case InSet(cl, vs)       =>
      Some(when(col(cl).isNotNull && !col(cl).isin(vs: _*), 1L).otherwise(0L))
    case MatchesRegex(cl, p) =>
      Some(when(col(cl).isNotNull && !col(cl).rlike(p), 1L).otherwise(0L))
    case _                   => None
  }

  /** Evaluate `constraints` over `df`. Returns one row per constraint:
    * (check_name, kind, target, violations, n_rows, pass) — `violations`
    * the exact count per the constraint's semantics above, `n_rows` the
    * table row count, `pass` = violations == 0 (row-count: within bounds).
    * Row order is the declaration order of `constraints` (stable ids make
    * the output joinable across runs for drift tracking). */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "constraints must be non-empty")
    val rowLocal = constraints.zipWithIndex
      .flatMap { case (c, i) => violation(c).map(v => (c, i, v)) }
    val rowCounts = constraints.zipWithIndex.collect { case (c: RowCountBetween, i) => (c, i) }
    val uniques = constraints.zipWithIndex.collect { case (c: Unique, i) => (c, i) }

    val aggPart: Option[DataFrame] =
      if (rowLocal.isEmpty && rowCounts.isEmpty) None
      else {
        val sums = rowLocal.map { case (_, i, v) => sum(v).as(s"__v$i") }
        val base = df.agg(count(lit(1)).as("__n"), sums: _*)
        val entries: Seq[Column] =
          rowLocal.map { case (c, i, _) =>
            val (id, kind, target) = meta(c)
            val viol = coalesce(col(s"__v$i"), lit(0L))
            struct(lit(id).as("check_name"), lit(kind).as("kind"),
              lit(target).as("target"), lit(i).as("ord"),
              viol.as("violations"), (viol === 0L).as("pass"))
          } ++ rowCounts.map { case (c @ RowCountBetween(lo, hi), i) =>
            val (id, kind, target) = meta(c)
            val ok = col("__n") >= lit(lo) && col("__n") <= lit(hi)
            struct(lit(id).as("check_name"), lit(kind).as("kind"),
              lit(target).as("target"), lit(i).as("ord"),
              when(ok, 0L).otherwise(1L).as("violations"), ok.as("pass"))
          }
        Some(base
          .select(col("__n"), explode(array(entries: _*)).as("c"))
          .select(col("c.check_name"), col("c.kind"), col("c.target"), col("c.ord"),
            col("c.violations"), col("__n").as("n_rows"), col("c.pass")))
      }

    val uniqueParts: Seq[DataFrame] = uniques.map { case (u, i) =>
      val (id, kind, target) = meta(u)
      df.groupBy(u.columns.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(
          coalesce(sum(when(col("__c") > 1L, col("__c"))), lit(0L)).as("__viol"),
          coalesce(sum(col("__c")), lit(0L)).as("__nr"))
        .select(lit(id).as("check_name"), lit(kind).as("kind"),
          lit(target).as("target"), lit(i).as("ord"),
          col("__viol").as("violations"), col("__nr").as("n_rows"),
          (col("__viol") === 0L).as("pass"))
    }

    (aggPart.toSeq ++ uniqueParts)
      .reduce(_ unionByName _)
      .orderBy("ord")
      .drop("ord")
  }
}
