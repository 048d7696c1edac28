package graft.operators

import java.time.Instant
import graft.functions.Buckets
import graft.functions.Buckets.Granularity
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-bucketed metrics over an append-only fact table.
  *
  * Re-expresses the reference metrics engine (hookdeck/outpost
  * `internal/logstore/chlogstore/metrics.go:82-429`, dense fill
  * `internal/logstore/bucket/fill.go:13-274`, rates
  * `internal/logstore/driver/rate.go:15-104`) as ONE declarative Spark plan:
  *
  *   filter(time range + dimension filters)
  *     → groupBy(bucketExpr, dims) agg(conditional counts…)   // partial+final, spillable
  *     → LEFT-join from (slots × observed-dim-combos)          // dense zero fill
  *     → withColumn(rate measures)                             // per-bucket calendar length
  *
  * Scale design:
  *   - the time-range predicate is mandatory (reference `metrics.go:139-142`)
  *     → partition pruning on a month-partitioned layout;
  *   - bucket slots are generated driver-side (hard-capped at 100 000,
  *     reference `bucket/bucket.go:10-14`) and BROADCAST to the join — the
  *     big fact side is never re-shuffled for the fill;
  *   - dim combos come from the aggregated (small) side, not a second scan
  *     of the fact table (mirrors `fill.go:74-114`: only observed combos are
  *     zero-filled, not the full dimension domain);
  *   - conditional counts use `count(when(...))` → single-pass hash agg with
  *     map-side partial aggregation, no distinct expansion.
  */
object Metrics {

  final case class Request(
      start: Instant,
      end: Instant,
      granularity: Granularity,
      measures: Seq[String],
      dimensions: Seq[String] = Nil,
      filters: Map[String, Seq[String]] = Map.empty,
      rowLimit: Int = 100000,
      maxGroups: Long = MaxRowsToGroupBy,
      broadcastGroupCap: Long = BroadcastGroupCap)

  /** Reference resource guard (`chlogstore/metrics.go:13`): a query whose
    * group count (slots × observed dim combos) exceeds this fails fast as a
    * CLIENT error instead of taking down the cluster job. */
  val MaxRowsToGroupBy: Long = 5000000L

  /** Above this many filled groups the zero-fill join stops broadcasting the
    * aggregated side and degrades to a shuffle join (a broadcast of millions
    * of groups is driver/executor OOM at 100× scale). */
  val BroadcastGroupCap: Long = 1000000L

  /** The reference surfaces the ClickHouse max_rows_to_group_by breach as a
    * client error (`chlogstore/metrics.go:13-25`); same contract here. */
  final class ResourceLimitExceeded(msg: String) extends RuntimeException(msg)

  final case class Result(df: DataFrame, truncated: Boolean,
                          cleanup: () => Unit = () => ())

  /** A measure = named aggregate expression (+ optional rate derivation). */
  final case class MeasureDef(agg: Column, rateOf: Option[String] = None)

  /** Measure catalog bound to the driver `events` schema
    * (event_id, ts, user_id, event_type, value, props). Mirrors the
    * reference's attempt-measure matrix (`chlogstore/metrics.go:352-383`)
    * with `status='failed'` ↦ `event_type='error'`. */
  def eventMeasures: Map[String, MeasureDef] = Map(
    "count" -> MeasureDef(count(lit(1))),
    "error_count" -> MeasureDef(count(when(col("event_type") === "error", 1))),
    "success_count" -> MeasureDef(count(when(col("event_type") =!= "error", 1))),
    "error_rate" -> MeasureDef(
      coalesce(count(when(col("event_type") === "error", 1)).cast("double") /
        nullif(count(lit(1)).cast("double"), lit(0.0)), lit(0.0))),
    "avg_value" -> MeasureDef(avg(col("value"))),
    "sum_value" -> MeasureDef(sum(col("value"))),
    "distinct_users" -> MeasureDef(countDistinct(col("user_id"))),
    "rate" -> MeasureDef(count(lit(1)), rateOf = Some("count"))
  )

  /** The reference's full attempt-measure matrix
    * (`chlogstore/metrics.go:352-383`), bound to the log-store schema
    * (attempt_id, status, manual, attempt_number, ...). All conditional
    * counts — single-pass, map-side-combinable. */
  def attemptMeasures: Map[String, MeasureDef] = Map(
    "count" -> MeasureDef(count(lit(1))),
    "successful_count" -> MeasureDef(count(when(col("status") === "success", 1))),
    "failed_count" -> MeasureDef(count(when(col("status") === "failed", 1))),
    "error_rate" -> MeasureDef(
      coalesce(count(when(col("status") === "failed", 1)).cast("double") /
        nullif(count(lit(1)).cast("double"), lit(0.0)), lit(0.0))),
    "first_attempt_count" -> MeasureDef(
      count(when(col("attempt_number") === 1 && !col("manual"), 1))),
    "retry_count" -> MeasureDef(count(when(col("attempt_number") > 1, 1))),
    "manual_retry_count" -> MeasureDef(count(when(col("manual"), 1))),
    "avg_attempt_number" -> MeasureDef(
      coalesce(sum(col("attempt_number")).cast("double") /
        nullif(count(lit(1)).cast("double"), lit(0.0)), lit(0.0))),
    "rate" -> MeasureDef(count(lit(1)), rateOf = Some("count")),
    "successful_rate" -> MeasureDef(count(when(col("status") === "success", 1)),
      rateOf = Some("successful_count")),
    "failed_rate" -> MeasureDef(count(when(col("status") === "failed", 1)),
      rateOf = Some("failed_count")))

  /** Per-unit maximum granularity values (reference
    * `internal/apirouter/metrics_handlers.go:90-97` clamps the API form). */
  private val MaxGranularityValue: Map[Buckets.Unit, Int] = Map(
    Buckets.Second -> 60, Buckets.Minute -> 60, Buckets.Hour -> 24,
    Buckets.Day -> 31, Buckets.Week -> 52, Buckets.Month -> 12)

  /** Request validation (reference `driver/metrics.go:19-24` + API
    * allowlists): unknown measures/dimensions and out-of-range
    * granularities fail fast with a client error, never a cluster job. */
  def validate(req: Request, catalog: Map[String, MeasureDef],
               dimensionAllowlist: Set[String]): Unit = {
    require(!req.start.isAfter(req.end), "start must be <= end")
    req.measures.foreach(m => require(catalog.contains(m), s"unknown measure: $m"))
    req.dimensions.foreach(d => require(dimensionAllowlist.contains(d), s"unknown dimension: $d"))
    require(req.granularity.value <= MaxGranularityValue(req.granularity.unit),
      s"granularity too coarse: ${req.granularity}")
  }

  /** Run a metrics request against a fact DataFrame with a `ts` timestamp
    * column. Dimension/filter names must be columns of `df`. */
  def query(spark: SparkSession, df: DataFrame, req: Request,
            catalog: Map[String, MeasureDef] = eventMeasures,
            tsName: String = "ts"): Result = {
    // bucket boundaries are UTC wall-clock arithmetic; Buckets.bucketExpr
    // is timezone-independent by construction (explicit-UTC month fields),
    // so no session-config mutation is needed here.
    val g = req.granularity
    val ts = col(tsName)

    // mandatory time range (partition-prunable) + dimension filters; when the
    // fact table carries the raw-nanos sort column, filter on IT so the range
    // reaches the parquet scan (see Tables.events scaladoc)
    val startTs = timestamp_millis(lit(req.start.toEpochMilli))
    val endTs = timestamp_millis(lit(req.end.toEpochMilli))
    var cur =
      if (tsName == "ts" && df.columns.contains("ts_ns"))
        df.filter(graft.core.Tables.tsRangeNs(req.start, req.end))
      else df.filter(ts >= startTs && ts < endTs)
    req.filters.foreach { case (c, vs) => cur = cur.filter(col(c).isin(vs: _*)) }

    // split rate measures from base aggregates; rates force their base dep
    // (reference driver/rate.go:15-33 EnrichMeasuresForRates)
    val (rateMs, baseMs) = req.measures.partition(m => catalog(m).rateOf.isDefined)
    val deps = rateMs.flatMap(m => catalog(m).rateOf)
    val aggMeasures = (baseMs ++ deps.filterNot(baseMs.contains)).distinct
    val aggCols = aggMeasures.map(m => catalog(m).agg.as(m))

    // group on the cheap integer bucket key; materialize the bucket
    // TIMESTAMP on the aggregated rows only (for month units the
    // materialization is per-row calendar construction — Buckets
    // .bucketKeyExpr scaladoc has the measured cost)
    val bucketKey = Buckets.bucketKeyExpr(ts, g).as("__bkey")
    val dimCols = req.dimensions.map(col)
    val grouped = cur.groupBy(bucketKey +: dimCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("bucket", Buckets.bucketFromKey(col("__bkey"), g))
      .drop("__bkey")

    // dense fill: driver-generated slots (capped) × observed dim combos;
    // over-cap ranges surface the reference's resource-limit client error
    // (bucket/bucket.go:10-14 ErrTooManyBuckets → driver.ErrResourceLimit)
    val slots =
      try Buckets.generateSlots(req.start, req.end, g)
      catch {
        case e: IllegalArgumentException => throw new ResourceLimitExceeded(e.getMessage)
      }
    import spark.implicits._
    val slotsDf = slots.map(i => new java.sql.Timestamp(i.toEpochMilli))
      .toDF("bucket")
    // the aggregated side is usually the small one (≤ slots × combos) →
    // broadcast it as the build side of the left-outer fill join. But
    // observed combos are NOT capped by construction (a high-cardinality
    // dimension can make slots×combos arbitrarily large), so: count combos
    // first (off the persisted aggregate — one fact scan total), apply the
    // reference's max-groups guard, and degrade to a shuffle fill join when
    // the group count is too big to broadcast safely.
    var cleanup: () => Unit = () => ()
    val filled =
      if (req.dimensions.isEmpty) {
        // groups = slots only, already capped at MaxBuckets
        slotsDf.join(broadcast(grouped), Seq("bucket"), "left")
      } else {
        val groupedP = grouped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cleanup = () => { groupedP.unpersist(); () }
        val combos = groupedP.select(req.dimensions.map(col): _*).distinct()
        val comboCount = combos.count()
        val totalGroups = comboCount * slots.size
        if (totalGroups > req.maxGroups) {
          cleanup()
          throw new ResourceLimitExceeded(
            s"metrics query would produce $totalGroups groups " +
              s"($comboCount dimension combinations x ${slots.size} buckets), " +
              s"over the ${req.maxGroups} limit — narrow the time range, " +
              "coarsen the granularity, or filter the dimension")
        }
        if (totalGroups <= req.broadcastGroupCap)
          slotsDf.crossJoin(broadcast(combos))
            .join(broadcast(groupedP), "bucket" +: req.dimensions, "left")
        else // shuffle fill: both sides repartition on the group key
          slotsDf.crossJoin(combos)
            .join(groupedP.hint("shuffle_hash"), "bucket" +: req.dimensions, "left")
      }
    val zeroFilled = aggMeasures.foldLeft(filled) { (d, m) =>
      d.withColumn(m, coalesce(col(m), lit(0)))
    }

    // derived rates: per-bucket true duration (months vary — rate.go:78-104)
    val bucketSec = Buckets.bucketSecondsExpr(col("bucket"), g)
    val withRates = rateMs.foldLeft(zeroFilled) { (d, m) =>
      val dep = catalog(m).rateOf.get
      d.withColumn(m, col(dep).cast("double") / bucketSec.cast("double"))
    }
    // drop auto-added deps the caller didn't ask for
    val wanted = ("bucket" +: req.dimensions) ++ req.measures
    val projected = withRates.select(wanted.map(col): _*)

    val ordered = projected.orderBy(("bucket" +: req.dimensions).map(col): _*)
    val probe = ordered.limit(req.rowLimit + 1)
    Result(probe, truncated = false, cleanup) // see run() for the materialized flag
  }

  /** No-granularity form (the reference's nil-granularity requests,
    * `chlogstore/metrics.go:120-137`): ONE row per observed dimension combo
    * totalled over the whole range — no time bucket, no zero fill (an empty
    * scan yields an empty result, not a zero row), rate measures divide by
    * the range's total seconds. Same measure catalog and filter semantics
    * as [[query]]. */
  def queryTotal(spark: SparkSession, df: DataFrame, req: Request,
                 catalog: Map[String, MeasureDef] = eventMeasures,
                 tsName: String = "ts"): DataFrame = {
    val ts = col(tsName)
    val startTs = timestamp_millis(lit(req.start.toEpochMilli))
    val endTs = timestamp_millis(lit(req.end.toEpochMilli))
    var cur =
      if (tsName == "ts" && df.columns.contains("ts_ns"))
        df.filter(graft.core.Tables.tsRangeNs(req.start, req.end))
      else df.filter(ts >= startTs && ts < endTs)
    req.filters.foreach { case (c, vs) => cur = cur.filter(col(c).isin(vs: _*)) }

    val (rateMs, baseMs) = req.measures.partition(m => catalog(m).rateOf.isDefined)
    val deps = rateMs.flatMap(m => catalog(m).rateOf)
    val aggMeasures = (baseMs ++ deps.filterNot(baseMs.contains)).distinct
    // carry a row-presence count so the empty-range case yields no rows
    val aggCols = aggMeasures.map(m => catalog(m).agg.as(m)) :+
      count(lit(1)).as("__present")
    val grouped =
      if (req.dimensions.isEmpty) cur.agg(aggCols.head, aggCols.tail: _*)
      else cur.groupBy(req.dimensions.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    val rangeSec = (req.end.toEpochMilli - req.start.toEpochMilli) / 1000.0
    val withRates = rateMs.foldLeft(grouped.filter(col("__present") > 0)) { (d, m) =>
      d.withColumn(m, col(catalog(m).rateOf.get).cast("double") / lit(rangeSec))
    }
    withRates.select((req.dimensions ++ req.measures).map(col): _*)
  }

  /** Materialized form with the reference's truncation semantics
    * (`chlogstore/metrics.go:565-568`): fetch rowLimit+1, report rowLimit
    * rows + a truncated flag instead of an unbounded result. */
  def run(spark: SparkSession, df: DataFrame, req: Request,
          catalog: Map[String, MeasureDef] = eventMeasures,
          tsName: String = "ts"): (Seq[org.apache.spark.sql.Row], Boolean) = {
    val res = query(spark, df, req, catalog, tsName)
    try {
      val probe = res.df.collect()
      (probe.take(req.rowLimit).toSeq, probe.length > req.rowLimit)
    } finally res.cleanup()
  }
}
