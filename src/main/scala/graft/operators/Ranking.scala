package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — `row_number() OVER (ORDER BY …)` without
  * the single-partition exchange.
  *
  * Spark's window functions with an empty PARTITION BY collapse the whole
  * table into ONE task (`Exchange SinglePartition`) — the canonical
  * scale-killer: at 100 TB that task never finishes. The classic fix (the
  * same decomposition TeraSort and every external sorter uses) is
  *   1. range-partition on the sort key — each partition holds a
  *      contiguous key range, partition ids ascend with the ordering;
  *   2. rank WITHIN each partition (a partitioned window — parallel);
  *   3. add per-partition prefix offsets — `parts` longs through the
  *      driver, independent of row count.
  * One range exchange + one in-partition sort, the same I/O a global
  * `ORDER BY` costs, and every stage is parallel.
  *
  * Determinism contract: `sortCols` must be a TOTAL order (include a
  * unique tiebreaker). The two passes (count, rank) run over one cached
  * frame so the sampled range bounds are computed once; equal-key
  * straddling across a range boundary cannot reorder a total order.
  *
  * Null ordering: Spark's ascending sort puts NULLS FIRST, while DuckDB/
  * PostgreSQL default to NULLS LAST — so a nullable sort key ranks
  * differently across engines even under a total order. Callers comparing
  * cross-engine must filter nulls out or normalize with
  * `asc_nulls_last`/`desc_nulls_first` on BOTH sides; the gates here use
  * non-null keys, and [[Evaluation.aucExact]] filters null scores for
  * exactly this reason.
  *
  * Reference anchor: the reference pages every list endpoint by keyset
  * (logstore/driver/clickhouse/logstore.go:214-260) precisely because
  * OFFSET/global-rank is unbounded there; this operator is the analytics
  * complement — when a global rank IS the ask (percentile reports,
  * equi-depth binning), compute it scalably instead of refusing it.
  */
object Ranking {

  /** Append a 1-based global rank under `sortCols` (must be a total
    * order). `parts` bounds the range fan-out; the per-partition counts
    * (≤ `parts` longs) are the only driver state.
    *
    * The persist + localCheckpoint around the two passes is CORRECTNESS,
    * not caching: `RangePartitioner` samples its bounds per plan
    * compilation (seeded by RDD id), so the count pass and the rank pass
    * would otherwise see DIFFERENT partition boundaries and the prefix
    * offsets would be attributed to the wrong partitions. Pinning one
    * materialization makes both passes read the same assignment. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[Column], parts: Int = 32,
                      rankCol: String = "rank"): DataFrame =
    rankedPinned(df, sortCols, parts, rankCol)._1

  /** The checkpoint-then-unpersist pinning contract in ONE place:
    * materialize the ranked frame while `parted` is still persisted, then
    * release the cache. Returns (pinned ranked frame, total row count). */
  private def rankedPinned(df: DataFrame, sortCols: Seq[Column], parts: Int,
                           rankCol: String): (DataFrame, Long) = {
    val (parted, ranked, n) = rankedFrames(df, sortCols, parts, rankCol)
    try (ranked.localCheckpoint(), n)
    finally parted.unpersist(false)
  }

  /** Internal split of [[globalRowNumber]]: returns (pinned partitioned
    * frame, LAZY ranked frame, total row count — free from the offset
    * pass, so NTILE needs no extra scan). The ranked frame's offsets are
    * only valid while `parted` stays persisted — callers must
    * localCheckpoint before unpersisting (tests use the lazy half for
    * plan-shape assertions). */
  private[graft] def rankedFrames(df: DataFrame, sortCols: Seq[Column],
                                  parts: Int, rankCol: String): (DataFrame, DataFrame, Long) = {
    require(sortCols.nonEmpty, "globalRowNumber needs at least one sort column")
    // The in-partition sequence comes from monotonically_increasing_id
    // over the ALREADY-SORTED partition: mid = (partitionId << 33) +
    // row-order counter, so pid and sequence are bit fields of one
    // materialized column. A `Window.partitionBy(pid)` would compute the
    // same thing but costs a SECOND full shuffle (Spark can't see that
    // _pid ≡ physical partition) — at 100 TB that exchange dominates.
    // Bound: ≤ 2³³ rows per partition (size `parts` accordingly).
    val parted = df.repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("_mid", monotonically_increasing_id())
    parted.persist()
    val pid = shiftright(col("_mid"), 33).cast("int")
    val seq = col("_mid").bitwiseAND(lit((1L << 33) - 1))
    // pass 1: per-partition row counts → prefix offsets (driver-bounded:
    // one (pid, count) pair per partition, NOT per row)
    val counts = parted.groupBy(pid.as("_pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (p, n) => val o = acc; acc += n; (p, o) }
    val offMap = // empty input: typed dummy entry so analysis succeeds (no rows read it)
      if (offsets.isEmpty) map(lit(0), lit(0L))
      else map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*)
    // pass 2: offset + in-partition sequence — a pure projection over the
    // pinned frame: no window, no second exchange, no SinglePartition.
    val ranked = parted
      .withColumn(rankCol, element_at(offMap, pid) + seq + lit(1L))
      .drop("_mid")
    (parted, ranked, acc)
  }

  /** Global running (inclusive) prefix sum of a LONG column under a
    * total order — `sum(v) OVER (ORDER BY …)` without the
    * single-partition window, same decomposition as [[globalRowNumber]]:
    * range partition, in-partition window cumsum, per-partition sum
    * offsets through the driver (≤ `parts` longs). Longs only: a double
    * prefix sum is aggregation-order-dependent and would not be
    * engine-reproducible. */
  def globalRunningSum(df: DataFrame, sortCols: Seq[Column], value: Column,
                       outCol: String = "cum", parts: Int = 32): DataFrame = {
    require(sortCols.nonEmpty, "globalRunningSum needs at least one sort column")
    // nulls contribute 0 (folded at entry, not skipped SQL-style): an
    // all-null partition must yield offset 0, not a driver NPE, and the
    // running column must stay non-null for downstream arithmetic
    val parted = df.withColumn("_v", coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    parted.persist()
    try {
      val sums = parted.groupBy(col("_pid")).agg(sum(col("_v")).as("s"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val offsets = sums.map { case (p, s) => val o = acc; acc += s; (p, o) }
      val offMap =
        if (offsets.isEmpty) map(lit(0), lit(0L))
        else map(offsets.flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*)
      val w = Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      parted
        .withColumn(outCol, sum(col("_v")).over(w) + element_at(offMap, col("_pid")))
        .drop("_pid", "_v")
        .localCheckpoint() // same two-pass pinning contract as globalRowNumber
    } finally parted.unpersist(false)
  }

  /** SQL `NTILE(k)` semantics over a global order, scalably: bucket
    * 1..k, the first `n % k` buckets get `n/k + 1` rows, the rest
    * `n/k` — bit-identical to DuckDB/PostgreSQL `ntile(k) OVER (ORDER BY
    * sortCols)` when `sortCols` is total. */
  def ntile(df: DataFrame, k: Int, sortCols: Seq[Column],
            bucketCol: String = "bucket", parts: Int = 32): DataFrame = {
    require(k > 0, s"ntile needs k > 0, got $k")
    // n comes free from the rank pass's offset collection — no extra scan
    val (ranked, n) = rankedPinned(df, sortCols, parts, "_grank")
    val q = n / k
    val rem = n % k
    val threshold = (q + 1) * rem // ranks ≤ threshold land in the wide buckets
    val r = col("_grank")
    ranked.withColumn(bucketCol,
        when(r <= threshold, ((r - 1) / (q + 1)) + 1)
          .otherwise(lit(rem) + ((r - 1 - threshold) / math.max(q, 1L)) + 1)
          .cast("int"))
      .drop("_grank")
  }

  /** Equi-depth histogram of `valueCol`: k buckets of (near-)equal row
    * count with per-bucket count/min/max — the feature-discretization /
    * data-profiling primitive. `tiebreak` makes the order total so the
    * bucket boundaries are engine-reproducible. */
  def equidepthHistogram(df: DataFrame, valueCol: Column, k: Int,
                         tiebreak: Seq[Column], parts: Int = 32): DataFrame =
    ntile(df.select(valueCol.as("_v"), struct(tiebreak: _*).as("_tb")),
        k, Seq(col("_v"), col("_tb")), parts = parts)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("_v")).as("lo"), max(col("_v")).as("hi"))
      .orderBy(col("bucket"))

  /** The SKETCH path to equi-depth binning — when even one range
    * exchange + sort is too much (wide-fact 100 TB discretization), trade
    * exactness for a deterministic GK rank bound: boundaries come from
    * ONE mergeable quantile-sketch aggregate
    * ([[graft.plans.QuantileExprs]], ε worst-case rank error), bucket
    * assignment is then a pure codegen comparison against k−1 broadcast
    * literals — NO sort, NO range exchange, two scans total. Bucket
    * populations deviate from n/k by at most 2εn per boundary —
    * deterministic, any data order, any merge tree (gate
    * `equidepth_gk_check` pins it). Exact form: [[equidepthHistogram]]. */
  def equidepthApprox(df: DataFrame, valueCol: Column, k: Int,
                      eps: Double = 0.01): DataFrame = {
    require(k >= 2, s"equidepthApprox needs k >= 2, got $k")
    graft.plans.QuantileRegistry.install(df.sparkSession)
    // nulls are excluded OUTRIGHT: the GK aggregate skips them when
    // sketching boundaries, so letting them fall through the assignment
    // (where every `>= boundary` is null → bucket 1) would inflate the
    // first bucket past the 2εn contract the gate pins
    val v = df.select(valueCol.cast("double").as("_v"))
      .where(col("_v").isNotNull)
    val ps = (1 until k).map(_.toDouble / k)
    val sketch = v.agg(graft.plans.QuantileRegistry
      .gkAgg(col("_v"), eps).as("gk"))
    val bounds = sketch.select(graft.plans.QuantileRegistry
        .gkQuantiles(col("gk"), ps).as("q"))
      .head().getSeq[Double](0).toArray
    boundsHistogram(v, bounds)
  }

  /** Histogram of a prepared `(_v)` frame (nulls already excluded) against
    * fixed ascending boundaries: bucket b = 1 + #(boundaries ≤ value) —
    * boundary ties go right, a fixed rule with engine-free determinism
    * given the same boundaries. Pure codegen comparison against k−1
    * broadcast literals; unordered output (k rows — an orderBy would add
    * a range exchange to a plan whose point is having none). */
  private[graft] def boundsHistogram(v: DataFrame, bounds: Seq[Double]): DataFrame = {
    val bucket = bounds.foldLeft(lit(1)) { (acc, b) =>
      acc + when(col("_v") >= b, 1).otherwise(0)
    }
    v.withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("_v")).as("lo"), max(col("_v")).as("hi"))
  }

  /** INCREMENTAL equi-depth: boundaries read off MAINTAINED quantile-
    * rollup state ([[Sketches.updateQuantileRollup]] — one mergeable GK
    * sketch per rollup group, refreshed at O(batch) per commit), so the
    * boundary refresh never re-reads facts; the assignment pass is the
    * same k−1-literal codegen comparison over whatever fact slice the
    * caller provides. Retention composes naturally: the state is stored
    * at (e.g.) month grain, so dropping a month's state row FORGETS that
    * month — the merged boundaries afterwards describe exactly the
    * retained population (gate `incremental_equidepth_check` pins the
    * 2εn bound and the state-vs-facts row-count agreement after a
    * 3-batch + replay + retention-drop cycle).
    *
    * @return (histogram DataFrame (bucket, n, lo, hi), state row count —
    *         the incremental-consistency witness: must equal the
    *         non-null fact count of the same retained slice) */
  def equidepthFromState(spark: org.apache.spark.sql.SparkSession,
                         stateTable: String, facts: DataFrame,
                         valueCol: Column, k: Int): (DataFrame, Long) = {
    require(k >= 2, s"equidepthFromState needs k >= 2, got $k")
    val ps = (1 until k).map(_.toDouble / k)
    val row = Sketches.quantilesAcross(spark, stateTable, Nil, ps).head()
    val bounds = row.getSeq[Double](0)
    val nState = row.getLong(1)
    val v = facts.select(valueCol.cast("double").as("_v"))
      .where(col("_v").isNotNull)
    (boundsHistogram(v, bounds), nState)
  }

  /** GROUPED incremental equi-depth: per-dimension discretization (the
    * common feature case — one bucket scale per event_type / language /
    * source) from the SAME maintained rollup state, which already carries
    * its group columns. Boundaries per group come from one O(state)
    * merge ([[Sketches.quantilesAcross]] over `groupCols`); the
    * assignment pass broadcast-joins the (groups × k−1 boundaries)
    * dimension — driver-bounded by the group count, never the fact count
    * — onto the facts and folds the per-group boundary ARRAY in codegen
    * (`functions.aggregate`), so the fact scan stays one pass with no
    * sort and no range exchange, same as the global path.
    *
    * Output: one row per (group, bucket) — n/lo/hi plus the group's
    * state row count `n_state`, the per-group incremental-consistency
    * witness (must equal the group's non-null fact count). */
  def equidepthFromStateBy(spark: org.apache.spark.sql.SparkSession,
                           stateTable: String, groupCols: Seq[String],
                           facts: DataFrame, valueCol: Column,
                           k: Int): DataFrame = {
    require(k >= 2, s"equidepthFromStateBy needs k >= 2, got $k")
    require(groupCols.nonEmpty, "groupCols empty — use equidepthFromState")
    val ps = (1 until k).map(_.toDouble / k)
    val st = Sketches.quantilesAcross(spark, stateTable, groupCols, ps)
      .withColumnRenamed("quantiles", "_bounds")
      .withColumnRenamed("n_rows", "_n_state")
    val v = facts
      .select(groupCols.map(col) :+ valueCol.cast("double").as("_v"): _*)
      .where(col("_v").isNotNull)
    v.join(broadcast(st), groupCols)
      .withColumn("bucket",
        aggregate(col("_bounds"), lit(1),
          (acc, b) => acc + when(col("_v") >= b, 1).otherwise(0)).cast("int"))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"), min(col("_v")).as("lo"),
        max(col("_v")).as("hi"), first(col("_n_state")).as("n_state"))
  }
}
