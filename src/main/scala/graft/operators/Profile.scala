package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling: the "what is actually in this table" scan every
  * pipeline runs before trusting a new data drop — row count, per-column
  * null counts, exact distinct cardinalities, numeric ranges — as ONE
  * aggregate returning one wide row (engine-comparable, join-free).
  *
  * Scale: Catalyst rewrites multi-column exact COUNT(DISTINCT) via Expand
  * (k+1 row multiplication for k distinct aggregates) — exact NDV is a
  * deliberate choice here because the profile is the trust anchor other
  * checks compare against. For routine 100 TB monitoring swap
  * `exactNdv = false`: HLL++ `approx_count_distinct` keeps the scan a
  * single pass with no Expand, the same trade `approx_stats` documents.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              minMaxCols: Seq[String] = Nil,
              exactNdv: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    def ndv(c: String): Column =
      if (exactNdv) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs =
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        ndv(c).as(s"${c}_ndv"))) ++
      minMaxCols.flatMap(c => Seq(
        min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
