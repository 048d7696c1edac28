package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DATA-QUALITY CONSTRAINT SUITE — a declarative, reusable check API
  * (the deequ pattern): callers declare WHAT must hold on their table
  * (completeness, uniqueness, ranges, value sets, referential integrity,
  * group cardinality, arbitrary predicates) and get one verdict row per
  * constraint — `(check_name, violations, passed)` — plus, per
  * constraint, the offending rows for debugging.
  *
  * Scale design (100 TB): every row-level constraint lowers into ONE
  * shared aggregate over a single scan of the table — conditional sums
  * with map-side partial aggregation, so the shuffle carries one partial
  * row per partition, never data rows. Uniqueness rides the same pass as
  * count−countDistinct. Referential integrity is a left-anti join the
  * optimizer broadcasts when the reference side is small; group
  * cardinality is one keyed count. The per-shape 1-row results cross-join
  * at the end — constant driver cost regardless of table size, and the
  * whole suite is a handful of jobs no matter how many constraints ride
  * the shared pass.
  */
object Quality {

  sealed trait Constraint { def name: String }

  /** `column` must never be null (completeness). */
  final case class NotNull(name: String, column: String) extends Constraint

  /** The `columns` tuple is unique across the table. Violations = number
    * of surplus rows (count − distinct count), the same accounting a
    * dedup pass would remove. Null semantics: a null-containing tuple IS
    * a group (two rows with the same null key = 1 violation; a singleton
    * null key = 0), matching [[failureRows]] — compose with [[NotNull]]
    * to also reject nulls outright. */
  final case class Unique(name: String, columns: Seq[String]) extends Constraint

  /** Value ∈ `values`. Nulls are NOT violations — compose with [[NotNull]]
    * when they should be. */
  final case class InSet(name: String, column: String,
                         values: Seq[Any]) extends Constraint

  /** lo ≤ value ≤ hi (inclusive). Nulls are NOT violations. */
  final case class InRange(name: String, column: String,
                           lo: Double, hi: Double) extends Constraint

  /** Counts rows where `condition` evaluates TRUE (a null condition is
    * not a violation — callers coalesce to change that). The escape hatch
    * for any row-level shape the typed constraints don't cover. */
  final case class FailsWhen(name: String, condition: Column) extends Constraint

  /** Every `columns` tuple must exist in `ref`'s `refColumns`
    * (foreign-key shape). Violations = orphan rows; tuples with nulls
    * never match and so count as orphans, mirroring a strict anti join. */
  final case class RefIntegrity(name: String, columns: Seq[String],
                                ref: DataFrame,
                                refColumns: Seq[String]) extends Constraint

  /** No `groupCols` group holds more than `max` rows. Violations = number
    * of oversized GROUPS (not rows): the actionable unit is the group. */
  final case class MaxPerGroup(name: String, groupCols: Seq[String],
                               max: Long) extends Constraint

  /** DATASET-level statistical constraint: lo ≤ mean(column) ≤ hi.
    * Violations are 0/1 — the STAT fails, not rows — so [[failureRows]]
    * is empty by definition. Nulls are ignored (aggregate semantics);
    * an empty table passes. Rides the shared aggregate pass. */
  final case class MeanInRange(name: String, column: String,
                               lo: Double, hi: Double) extends Constraint

  /** DATASET-level statistical constraint: lo ≤ stddev_samp(column) ≤ hi
    * (SAMPLE standard deviation — both engines' default `stddev`).
    * Violations 0/1; empty/singleton tables pass (stddev undefined). */
  final case class StddevInRange(name: String, column: String,
                                 lo: Double, hi: Double) extends Constraint

  /** Rows whose z-score against the column's own mean/stddev exceeds
    * `maxZ` (the [[graft.queries.Analytics]] z-anomaly machinery as a
    * declarable constraint). Violations = anomalous ROW count;
    * [[failureRows]] returns them. A zero/undefined stddev passes (no
    * spread ⇒ no outliers). */
  final case class NoAnomalies(name: String, column: String,
                               maxZ: Double) extends Constraint

  /** The row-level violation counter a constraint contributes to the
    * shared aggregate pass; None for the join/group-shaped ones. */
  private def scalarAgg(c: Constraint): Option[Column] = c match {
    case NotNull(_, c0) =>
      Some(coalesce(sum(when(col(c0).isNull, 1L).otherwise(0L)), lit(0L)))
    case Unique(_, cols0) =>
      // distinct over a STRUCT, not the bare tuple: countDistinct drops
      // tuples containing any null, which would count every null-keyed
      // row as a violation while failureRows (window count > 1) treats
      // nulls as a group. The struct is never null, so null tuples count
      // as distinct groups and check()/failureRows agree.
      Some(count(lit(1)) - countDistinct(struct(cols0.map(col): _*)))
    case InSet(_, c0, vs) =>
      Some(coalesce(sum(when(!col(c0).isin(vs: _*), 1L).otherwise(0L)), lit(0L)))
    case InRange(_, c0, lo, hi) =>
      Some(coalesce(
        sum(when(col(c0) < lo || col(c0) > hi, 1L).otherwise(0L)), lit(0L)))
    case FailsWhen(_, cond) =>
      // coalesce: sum over an empty table is null, not 0
      Some(coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)))
    case MeanInRange(_, c0, lo, hi) =>
      // null stat (empty table) passes: when(null) falls to otherwise
      Some(when(avg(col(c0)) < lo || avg(col(c0)) > hi, 1L).otherwise(0L))
    case StddevInRange(_, c0, lo, hi) =>
      Some(when(stddev_samp(col(c0)) < lo || stddev_samp(col(c0)) > hi, 1L)
        .otherwise(0L))
    case _ => None
  }

  /** Run the suite: one verdict row per constraint, in declaration order —
    * `(check_name string, violations long, passed int)`. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "empty constraint suite")
    require(constraints.map(_.name).distinct.size == constraints.size,
      "constraint names must be unique")
    // positional aliases: check names are user strings (dots, spaces)
    val alias = constraints.zipWithIndex
      .map { case (c, i) => c.name -> s"_v$i" }.toMap
    val scalar = constraints.flatMap(c => scalarAgg(c).map(a => c -> a))
    val aggFrame: Option[DataFrame] = scalar match {
      case Seq() => None
      case (c0, a0) +: rest =>
        Some(df.agg(a0.as(alias(c0.name)),
          rest.map { case (c, a) => a.as(alias(c.name)) }: _*))
    }
    val joined: Seq[DataFrame] = constraints.collect {
      case c @ RefIntegrity(_, cols0, ref, refCols) =>
        val r = ref.select(refCols.zipWithIndex.map { case (rc, i) =>
          col(rc).as(s"_r$i") }: _*)
        val cond = cols0.zipWithIndex
          .map { case (lc, i) => col(lc) === col(s"_r$i") }
          .reduce(_ && _)
        df.join(r, cond, "left_anti")
          .agg(count(lit(1)).as(alias(c.name)))
      case c @ MaxPerGroup(_, g, m) =>
        df.groupBy(g.map(col): _*).agg(count(lit(1)).as("_n"))
          .filter(col("_n") > m)
          .agg(count(lit(1)).as(alias(c.name)))
      case c @ NoAnomalies(_, c0, maxZ) =>
        // two-pass by necessity (the stat, then the rows against it);
        // the 1-row stat frame broadcasts — no second shuffle
        val stats = df.agg(avg(col(c0)).as("_qm"),
          stddev_samp(col(c0)).as("_qs"))
        df.crossJoin(broadcast(stats))
          .filter(col("_qs").isNotNull && col("_qs") > 0.0 &&
            abs(col(c0) - col("_qm")) > lit(maxZ) * col("_qs"))
          .agg(count(lit(1)).as(alias(c.name)))
    }
    val wide = (aggFrame.toSeq ++ joined).reduce(_.crossJoin(_))
    wide.select(explode(array(constraints.map { c =>
        struct(lit(c.name).as("check_name"),
          col(alias(c.name)).as("violations"))
      }: _*)).as("r"))
      .select(col("r.check_name").as("check_name"),
        col("r.violations").as("violations"),
        (col("r.violations") === 0L).cast("int").as("passed"))
  }

  /** The offending rows behind one constraint's violation count — the
    * debugging half of the suite. For [[Unique]] that is every row whose
    * tuple appears more than once; for [[MaxPerGroup]], all rows of the
    * oversized groups; for [[RefIntegrity]], the orphans. */
  def failureRows(df: DataFrame, c: Constraint): DataFrame = c match {
    case NotNull(_, c0) => df.filter(col(c0).isNull)
    case InSet(_, c0, vs) => df.filter(!col(c0).isin(vs: _*))
    case InRange(_, c0, lo, hi) => df.filter(col(c0) < lo || col(c0) > hi)
    case FailsWhen(_, cond) => df.filter(cond)
    case Unique(_, cols0) =>
      val w = Window.partitionBy(cols0.map(col): _*)
      df.withColumn("_q_n", count(lit(1)).over(w))
        .filter(col("_q_n") > 1L).drop("_q_n")
    case RefIntegrity(_, cols0, ref, refCols) =>
      val r = ref.select(refCols.zipWithIndex.map { case (rc, i) =>
        col(rc).as(s"_r$i") }: _*)
      val cond = cols0.zipWithIndex
        .map { case (lc, i) => col(lc) === col(s"_r$i") }
        .reduce(_ && _)
      df.join(r, cond, "left_anti")
    case MaxPerGroup(_, g, m) =>
      val big = df.groupBy(g.map(col): _*)
        .agg(count(lit(1)).as("_q_n")).filter(col("_q_n") > m).drop("_q_n")
      df.join(big, g, "left_semi")
    case NoAnomalies(_, c0, maxZ) =>
      val stats = df.agg(avg(col(c0)).as("_qm"),
        stddev_samp(col(c0)).as("_qs"))
      df.crossJoin(broadcast(stats))
        .filter(col("_qs").isNotNull && col("_qs") > 0.0 &&
          abs(col(c0) - col("_qm")) > lit(maxZ) * col("_qs"))
        .drop("_qm", "_qs")
    // dataset-level stats have no per-row offenders by definition
    case MeanInRange(_, _, _, _) => df.limit(0)
    case StddevInRange(_, _, _, _) => df.limit(0)
  }
}
