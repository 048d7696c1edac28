package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Morton (Z-order) keys for multi-dimensional
  * scan pruning — the lakehouse technique (Delta OPTIMIZE ZORDER BY,
  * Iceberg sort orders) that makes per-file min/max statistics selective
  * on EVERY clustered dimension instead of just the leading sort column.
  *
  * A table sorted by one column prunes on that column only: every file
  * spans the full range of the others. Writing in Z-order interleaves the
  * bits of the clustered dimensions, so consecutive key ranges are
  * rectangles in dimension space — each file's bounding box is narrow in
  * ALL clustered dimensions, and a predicate on any of them skips most
  * files at planning time from footer statistics alone. At 100 TB this
  * is the difference between a metrics query reading one month × one
  * tenant's files and reading the whole month.
  *
  * Everything here is exact integer arithmetic — normalization uses
  * integer division, never a float — so a z-key is bit-for-bit
  * reproducible across engines (the gate has DuckDB recompute it).
  */
object Layout {

  /** Interleave the low `bits` of x (even positions) and y (odd):
    * unrolled shift/mask tree, stays inside whole-stage codegen. Inputs
    * must already be in `[0, 2^bits)` — see [[normalize]]. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Map an integer column with known `[min, max]` onto `[0, 2^bits)` by
    * EXACT integer arithmetic: `(c-min)·(2^bits-1) div (max-min)`. The
    * div is expressed as subtract-remainder-then-divide so the quotient
    * is an exactly-representable integer before the (double) division —
    * no float rounding anywhere a boundary could shift. */
  def normalize(c: Column, min: Long, max: Long, bits: Int = 16): Column = {
    val span = max - min
    if (span == 0L) lit(0L)
    else {
      val scaled = (c.cast("long") - lit(min)) * lit((1L << bits) - 1)
      ((scaled - pmod(scaled, lit(span))) / lit(span)).cast("long")
    }
  }

  /** Write `df` clustered by the Z-order of two integer expressions:
    * range-partition on the z-key into `numFiles` buckets, sort within
    * each, drop the key. Per-file min/max footers then bound BOTH
    * dimensions tightly (spec-asserted). */
  def zorderWrite(df: DataFrame, x: Column, y: Column,
                  xRange: (Long, Long), yRange: (Long, Long),
                  path: String, numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("_zkey", zvalue(
        normalize(x, xRange._1, xRange._2, bits),
        normalize(y, yRange._1, yRange._2, bits), bits))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)

  /** The unrolled interleave as engine-neutral SQL over integer
    * expressions `x` and `y` (shared by the gate's DuckDB oracle). */
  def zvalueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
}
