package graft.queries

import java.time.Instant
import graft.core.Tables
import graft.functions.Buckets.{Granularity, Month}
import graft.operators.Metrics
import graft.operators.Metrics.{MeasureDef, Request}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metrics-engine gate queries (SURVEY §2.4 A1-A13) over the `events` table.
  *
  * Each runs through [[graft.operators.Metrics.query]] — the same plan a
  * production metrics API call would build — then projects `bucket` to epoch
  * millis for the hash compare. Float measures are scaled-integer sums (see
  * [[graft.queries.Relational]] determinism note).
  */
object MetricsQueries {

  private val Jan1 = Instant.parse("2024-01-01T00:00:00Z")
  private val Jan31 = Instant.parse("2024-01-31T00:00:00Z")

  /** Deterministic measure catalog for the driver events schema. */
  private def catalog: Map[String, MeasureDef] = Map(
    "count" -> MeasureDef(count(lit(1))),
    "error_count" -> MeasureDef(count(when(col("event_type") === "error", 1))),
    "error_rate" -> MeasureDef(
      coalesce(count(when(col("event_type") === "error", 1)).cast("double") /
        nullif(count(lit(1)).cast("double"), lit(0.0)), lit(0.0))),
    "sum_value" -> MeasureDef(
      sum(round(col("value") * 100.0, 0).cast("long")).cast("double") / 100.0),
    "avg_value" -> MeasureDef(
      coalesce(sum(round(col("value") * 100.0, 0).cast("long")).cast("double") /
        (lit(100.0) * nullif(count(lit(1)).cast("double"), lit(0.0))), lit(0.0))),
    "rate" -> MeasureDef(count(lit(1)), rateOf = Some("count"))
  )

  private def run(s: SparkSession, dir: String, req: Request): DataFrame = {
    val res = Metrics.query(s, Tables.events(s, dir), req, catalog)
    val cols = (unix_millis(col("bucket")).as("bucket_ms") +:
      req.dimensions.map(col)) ++ req.measures.map(col)
    res.df.select(cols: _*)
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7 value=1 hour + A11 dense fill + A12 rate.
    "metrics_count_hourly" -> ((s, dir) =>
      run(s, dir, Request(Jan1, Jan31, Granularity.parse("1h"),
        measures = Seq("count", "rate")))),

    // A7 multi-unit (epoch-anchored 2-hour buckets).
    "metrics_2h_epoch" -> ((s, dir) =>
      run(s, dir, Request(Jan1, Jan31, Granularity.parse("2h"),
        measures = Seq("count", "error_count")))),

    // A7 Sunday-anchored weeks (1970-01-04 anchor).
    "metrics_weekly_sunday" -> ((s, dir) =>
      run(s, dir, Request(Jan1, Jan31, Granularity.parse("1w"),
        measures = Seq("count", "rate")))),

    // A7 calendar months + A12 calendar-length rate denominators (leap Feb).
    "metrics_monthly_rate" -> ((s, dir) =>
      run(s, dir, Request(Instant.parse("2023-11-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"), Granularity(1, Month),
        measures = Seq("count", "rate")))),

    // A8 dims + A3 conditional measures + P1 dimension filters.
    "metrics_daily_by_type" -> ((s, dir) =>
      run(s, dir, Request(Jan1, Jan31, Granularity.parse("1d"),
        measures = Seq("count", "sum_value", "avg_value"),
        dimensions = Seq("event_type"),
        filters = Map("event_type" -> Seq("click", "view", "purchase"))))),

    // A8 two dimensions (bucket × type × user bucketed coarse).
    "metrics_4d_by_type" -> ((s, dir) =>
      run(s, dir, Request(Jan1, Jan31, Granularity.parse("4d"),
        measures = Seq("count", "error_rate"),
        dimensions = Seq("event_type"))))
  )

  private val slotsHourly =
    "SELECT unnest(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31', INTERVAL 1 HOUR)) AS bucket"

  def oracles: Map[String, String] = Map(
    "metrics_count_hourly" ->
      s"""WITH slots AS ($slotsHourly),
        |agg AS (
        |  SELECT time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS bucket, count(*) AS cnt
        |  FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-01' AND ts::TIMESTAMP < TIMESTAMP '2024-01-31'
        |  GROUP BY 1)
        |SELECT epoch_ms(s.bucket) AS bucket_ms, coalesce(a.cnt, 0) AS count,
        |  coalesce(a.cnt, 0) / 3600.0 AS rate
        |FROM slots s LEFT JOIN agg a USING (bucket) ORDER BY bucket_ms""".stripMargin,
    "metrics_2h_epoch" ->
      """WITH slots AS (SELECT unnest(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31', INTERVAL 2 HOUR)) AS bucket),
        |agg AS (
        |  SELECT time_bucket(INTERVAL 2 HOUR, ts::TIMESTAMP, TIMESTAMP '1970-01-01') AS bucket,
        |    count(*) AS cnt, count(*) FILTER (WHERE event_type = 'error') AS errs
        |  FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-01' AND ts::TIMESTAMP < TIMESTAMP '2024-01-31'
        |  GROUP BY 1)
        |SELECT epoch_ms(s.bucket) AS bucket_ms, coalesce(a.cnt, 0) AS count,
        |  coalesce(a.errs, 0) AS error_count
        |FROM slots s LEFT JOIN agg a USING (bucket) ORDER BY bucket_ms""".stripMargin,
    "metrics_weekly_sunday" ->
      """WITH slots AS (SELECT unnest(range(TIMESTAMP '2023-12-31', TIMESTAMP '2024-01-31', INTERVAL 7 DAY)) AS bucket),
        |agg AS (
        |  SELECT time_bucket(INTERVAL 7 DAY, ts::TIMESTAMP, TIMESTAMP '1970-01-04') AS bucket, count(*) AS cnt
        |  FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-01' AND ts::TIMESTAMP < TIMESTAMP '2024-01-31'
        |  GROUP BY 1)
        |SELECT epoch_ms(s.bucket) AS bucket_ms, coalesce(a.cnt, 0) AS count,
        |  coalesce(a.cnt, 0) / 604800.0 AS rate
        |FROM slots s LEFT JOIN agg a USING (bucket) ORDER BY bucket_ms""".stripMargin,
    "metrics_monthly_rate" ->
      """WITH slots AS (SELECT unnest(range(TIMESTAMP '2023-11-01', TIMESTAMP '2024-03-01', INTERVAL 1 MONTH)) AS bucket),
        |agg AS (
        |  SELECT time_bucket(INTERVAL 1 MONTH, ts::TIMESTAMP) AS bucket, count(*) AS cnt
        |  FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2023-11-01' AND ts::TIMESTAMP < TIMESTAMP '2024-03-01'
        |  GROUP BY 1)
        |SELECT epoch_ms(s.bucket) AS bucket_ms, coalesce(a.cnt, 0) AS count,
        |  coalesce(a.cnt, 0) / (epoch(s.bucket + INTERVAL 1 MONTH) - epoch(s.bucket)) AS rate
        |FROM slots s LEFT JOIN agg a USING (bucket) ORDER BY bucket_ms""".stripMargin,
    "metrics_daily_by_type" ->
      """WITH agg AS (
        |  SELECT time_bucket(INTERVAL 1 DAY, ts::TIMESTAMP) AS bucket, event_type,
        |    count(*) AS cnt, sum(CAST(round(value*100.0) AS BIGINT)) AS cents
        |  FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-01' AND ts::TIMESTAMP < TIMESTAMP '2024-01-31'
        |    AND event_type IN ('click','view','purchase')
        |  GROUP BY 1, 2),
        |slots AS (SELECT unnest(range(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31', INTERVAL 1 DAY)) AS bucket),
        |combos AS (SELECT DISTINCT event_type FROM agg)
        |SELECT epoch_ms(s.bucket) AS bucket_ms, c.event_type,
        |  coalesce(a.cnt, 0) AS count,
        |  coalesce(CAST(a.cents AS DOUBLE) / 100.0, 0) AS sum_value,
        |  coalesce(CAST(a.cents AS DOUBLE) / (100.0 * a.cnt), 0) AS avg_value
        |FROM slots s CROSS JOIN combos c
        |LEFT JOIN agg a ON a.bucket = s.bucket AND a.event_type = c.event_type
        |ORDER BY bucket_ms, c.event_type""".stripMargin,
    "metrics_4d_by_type" ->
      """WITH agg AS (
        |  SELECT time_bucket(INTERVAL 4 DAY, ts::TIMESTAMP, TIMESTAMP '1970-01-01') AS bucket, event_type,
        |    count(*) AS cnt, count(*) FILTER (WHERE event_type = 'error') AS errs
        |  FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-01' AND ts::TIMESTAMP < TIMESTAMP '2024-01-31'
        |  GROUP BY 1, 2),
        |slots AS (SELECT unnest(range(TIMESTAMP '2023-12-29', TIMESTAMP '2024-01-31', INTERVAL 4 DAY)) AS bucket),
        |combos AS (SELECT DISTINCT event_type FROM agg)
        |SELECT epoch_ms(s.bucket) AS bucket_ms, c.event_type,
        |  coalesce(a.cnt, 0) AS count,
        |  coalesce(CAST(a.errs AS DOUBLE) / a.cnt, 0) AS error_rate
        |FROM slots s CROSS JOIN combos c
        |LEFT JOIN agg a ON a.bucket = s.bucket AND a.event_type = c.event_type
        |ORDER BY bucket_ms, c.event_type""".stripMargin
  )
}
