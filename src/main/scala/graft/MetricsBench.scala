package graft

import graft.functions.Buckets
import graft.operators.Metrics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.Instant

/** The reference engine's OWN metrics benchmark
  * (`cmd/bench/metrics/README.md`, `bench_test.go`, `ch/seed.sql`) replayed
  * against this engine at the reference's published scale: 10M events →
  * ~12.6M attempts (~22.6M rows), 2 tenants (90/10), 500 destinations,
  * 3 topics, evenly spread over January 2000, chained 1–4 attempts with
  * 0.5% permanent failures. Seeding replicates `ch/seed.sql`'s modulo
  * distribution EXACTLY (including its quirks — the `manual` flag of late
  * retries, `number % 10 = 9` under `WHERE number % 20 = 0`, is constant
  * false in the reference seed, so it is here too).
  *
  * Every case in the reference's event + attempt matrices runs through the
  * production `Metrics.query` / `Metrics.queryTotal` path. Methodology
  * matches `graft.Bench`: untimed warmup, cache cleared, timed cold pass,
  * median-of-3 on multi-second queries, raw run lists in the artifact.
  *
  * Usage: runMain graft.MetricsBench   (env: SPARK_GRAFT_MB_ROWS=10000000,
  * SPARK_GRAFT_MB_DIR=/tmp/graft_metrics_bench — the seed is reused across
  * runs when the row count matches).
  */
object MetricsBench {

  private val MonthMs = 2678400000L // Jan 2000 span, per seed.sql
  private val T0 = 946684800000L // 2000-01-01T00:00:00Z epoch ms

  /** events rows per seed.sql [1/7]. */
  private def seedEvents(spark: SparkSession, rows: Long): DataFrame =
    spark.range(rows).select(
      concat(lit("evt_"), col("id")).as("event_id"),
      when(col("id") % 10 === 0, "tenant_1").otherwise("tenant_0")
        .as("tenant_id"),
      concat(lit("dest_"), col("id") % 500).as("destination_id"),
      when(col("id") % 3 === 0, "order.created")
        .when(col("id") % 3 === 1, "order.updated")
        .otherwise("payment.received").as("topic"),
      (col("id") % 3 =!= 2).as("eligible_for_retry"),
      timestamp_millis(lit(T0) +
        expr(s"id * $MonthMs DIV $rows")).as("ts"))

  /** attempts rows per seed.sql [2/7]..[5/7]: attempt k over the events
    * whose previous attempt failed; status/code by the per-level modulo;
    * attempt_time = event_time + k seconds. */
  private def seedAttempts(spark: SparkSession, rows: Long): DataFrame = {
    // (attempt_number, subset modulus, failure modulus)
    val levels = Seq((1, 1L, 5L), (2, 5L, 20L), (3, 20L, 100L), (4, 100L, 200L))
    levels.map { case (k, subsetMod, failMod) =>
      val base = spark.range(rows).filter(col("id") % subsetMod === 0)
      val failed = col("id") % failMod === 0
      base.select(
        concat(lit("evt_"), col("id")).as("event_id"),
        when(col("id") % 10 === 0, "tenant_1").otherwise("tenant_0")
          .as("tenant_id"),
        concat(lit("dest_"), col("id") % 500).as("destination_id"),
        when(col("id") % 3 === 0, "order.created")
          .when(col("id") % 3 === 1, "order.updated")
          .otherwise("payment.received").as("topic"),
        (col("id") % 3 =!= 2).as("eligible_for_retry"),
        concat(lit("att_"), col("id"), lit(s"_${k - 1}")).as("attempt_id"),
        when(failed, "failed").otherwise("success").as("status"),
        timestamp_millis(lit(T0) +
          expr(s"id * $MonthMs DIV $rows") + lit(k * 1000L))
          .as("attempt_time"),
        when(!failed && col("id") % 2 === 0, "200")
          .when(!failed, "201")
          .when(col("id") % 2 === 0, "500")
          .otherwise("422").as("code"),
        (lit(k) >= 3 && col("id") % 10 === 9).as("manual"),
        lit(k).cast("int").as("attempt_number"))
    }.reduce(_.unionByName(_))
  }

  private def seed(spark: SparkSession, dir: String, rows: Long): Unit = {
    val marker = new java.io.File(dir, s"_SEEDED_$rows")
    if (marker.exists) return
    val root = new java.io.File(dir)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    if (root.exists) rm(root)
    // (time, id)-sorted runs across 32 files — the Logstore physical layout
    seedEvents(spark, rows)
      .repartitionByRange(32, col("ts"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events")
    seedAttempts(spark, rows)
      .repartitionByRange(32, col("attempt_time"))
      .sortWithinPartitions(col("attempt_time"), col("attempt_id"))
      .write.mode("overwrite").parquet(s"$dir/attempts")
    marker.createNewFile()
    ()
  }

  // ── the reference's case matrices (bench_test.go) ──────────────────────
  private val fullMonth = (Instant.parse("2000-01-01T00:00:00Z"),
    Instant.parse("2000-02-01T00:00:00Z"))
  private val oneDay = (Instant.parse("2000-01-15T00:00:00Z"),
    Instant.parse("2000-01-16T00:00:00Z"))
  private val oneWeek = (Instant.parse("2000-01-08T00:00:00Z"),
    Instant.parse("2000-01-15T00:00:00Z"))
  private val t0 = Map("tenant_id" -> Seq("tenant_0"))

  private def req(range: (Instant, Instant), g: Option[Buckets.Granularity],
                  measures: Seq[String], dims: Seq[String] = Nil,
                  filters: Map[String, Seq[String]] = t0): Metrics.Request =
    Metrics.Request(range._1, range._2,
      g.getOrElse(Buckets.Granularity(1, Buckets.Hour)), measures, dims,
      filters)

  private def h = Some(Buckets.Granularity(1, Buckets.Hour))
  private def d1 = Some(Buckets.Granularity(1, Buckets.Day))
  private def d2 = Some(Buckets.Granularity(2, Buckets.Day))
  private def w1 = Some(Buckets.Granularity(1, Buckets.Week))
  private def m1 = Some(Buckets.Granularity(1, Buckets.Month))

  /** (name, request, granular?) — granular=false routes to queryTotal
    * (the reference's nil-granularity form). */
  private val eventCases: Seq[(String, Metrics.Request, Boolean)] = Seq(
    ("CountAll", req(fullMonth, None, Seq("count")), false),
    ("RateAll", req(fullMonth, None, Seq("rate")), false),
    ("CountAndRate", req(fullMonth, None, Seq("count", "rate")), false),
    ("CountByTopic", req(fullMonth, None, Seq("count"), Seq("topic")), false),
    ("CountByDestination",
      req(fullMonth, None, Seq("count"), Seq("destination_id")), false),
    ("CountByTenant",
      req(fullMonth, None, Seq("count"), Seq("tenant_id"), Map.empty), false),
    ("Hourly_1Day", req(oneDay, h, Seq("count")), true),
    ("Hourly_1Week", req(oneWeek, h, Seq("count")), true),
    ("Daily_1Month", req(fullMonth, d1, Seq("count")), true),
    ("TwoDays_1Month", req(fullMonth, d2, Seq("count")), true),
    ("Weekly_1Month", req(fullMonth, w1, Seq("count")), true),
    ("Monthly_1Month", req(fullMonth, m1, Seq("count")), true),
    ("RateHourly_1Day", req(oneDay, h, Seq("rate")), true),
    ("FilterByTopic", req(fullMonth, None, Seq("count"),
      filters = t0 + ("topic" -> Seq("order.created"))), false),
    ("FilterByDestination", req(fullMonth, None, Seq("count"),
      filters = t0 + ("destination_id" -> Seq("dest_0"))), false),
    ("SmallTenant", req(fullMonth, d1, Seq("count"),
      filters = Map("tenant_id" -> Seq("tenant_1"))), true))

  private val allAttemptMeasures = Seq("count", "successful_count",
    "failed_count", "error_rate", "first_attempt_count", "retry_count",
    "manual_retry_count", "avg_attempt_number", "rate", "successful_rate",
    "failed_rate")

  private val attemptCases: Seq[(String, Metrics.Request, Boolean)] = Seq(
    ("CountAll", req(fullMonth, None, Seq("count")), false),
    ("RateAll", req(fullMonth, None, Seq("rate")), false),
    ("SuccessfulRate", req(fullMonth, None, Seq("successful_rate")), false),
    ("FailedRate", req(fullMonth, None, Seq("failed_rate")), false),
    ("CountByTopic", req(fullMonth, None, Seq("count"), Seq("topic")), false),
    ("CountByDestination",
      req(fullMonth, None, Seq("count"), Seq("destination_id")), false),
    ("CountByStatus", req(fullMonth, None, Seq("count"), Seq("status")), false),
    ("CountByCode", req(fullMonth, None, Seq("count"), Seq("code")), false),
    ("CountByAttemptNumber",
      req(fullMonth, None, Seq("count"), Seq("attempt_number")), false),
    ("Hourly_1Day", req(oneDay, h, Seq("count")), true),
    ("Hourly_1Week", req(oneWeek, h, Seq("count")), true),
    ("Daily_1Month", req(fullMonth, d1, Seq("count")), true),
    ("TwoDays_1Month", req(fullMonth, d2, Seq("count")), true),
    ("Weekly_1Month", req(fullMonth, w1, Seq("count")), true),
    ("AllMeasures", req(fullMonth, None, allAttemptMeasures), false),
    ("AllMeasures_Daily", req(fullMonth, d1, allAttemptMeasures), true),
    ("FilterByStatus", req(fullMonth, None, Seq("count"),
      filters = t0 + ("status" -> Seq("failed"))), false),
    ("FilterByCode", req(fullMonth, None, Seq("count"),
      filters = t0 + ("code" -> Seq("500"))), false),
    ("FilterByManual", req(fullMonth, None, Seq("count"),
      filters = t0 + ("manual" -> Seq("true"))), false),
    ("FilterByAttemptNumber", req(fullMonth, None, Seq("count"),
      filters = t0 + ("attempt_number" -> Seq("1"))), false),
    ("FilterByTopic", req(fullMonth, None, Seq("count"),
      filters = t0 + ("topic" -> Seq("order.created"))), false),
    ("MultiDimension", req(fullMonth, None, Seq("count"),
      Seq("topic", "destination_id", "status")), false),
    ("MultiFilter", req(fullMonth, None, Seq("count"),
      filters = t0 + ("status" -> Seq("failed"),
        "topic" -> Seq("order.created"))), false),
    ("SmallTenant", req(fullMonth, d1, Seq("count"),
      filters = Map("tenant_id" -> Seq("tenant_1"))), true))

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_MB_ROWS", "10000000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_MB_DIR", "/tmp/graft_metrics_bench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-metrics-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val seedT0 = System.nanoTime()
    seed(spark, dir, rows)
    val seedSec = (System.nanoTime() - seedT0) / 1e9

    val events = spark.read.parquet(s"$dir/events")
    val attempts = spark.read.parquet(s"$dir/attempts")
    val (nEvents, nAttempts) = (events.count(), attempts.count())

    def runCase(df: DataFrame, r: Metrics.Request, granular: Boolean,
                catalog: Map[String, Metrics.MeasureDef],
                tsName: String): Unit =
      if (granular) {
        val res = Metrics.query(spark, df, r, catalog, tsName)
        try res.df.write.format("noop").mode("overwrite").save()
        finally res.cleanup()
      } else
        Metrics.queryTotal(spark, df, r, catalog, tsName)
          .write.format("noop").mode("overwrite").save()

    def bench(df: DataFrame, cases: Seq[(String, Metrics.Request, Boolean)],
              catalog: Map[String, Metrics.MeasureDef],
              tsName: String): Seq[(String, Double, Seq[Double])] =
      cases.map { case (name, r, granular) =>
        def timed(): Double = {
          spark.catalog.clearCache()
          val t = System.nanoTime()
          runCase(df, r, granular, catalog, tsName)
          (System.nanoTime() - t) / 1e9
        }
        try runCase(df, r, granular, catalog, tsName) catch {
          case _: Throwable => ()
        } // warmup
        val first = timed()
        val runs =
          if (first > 2.0) Seq(first, timed(), timed()) else Seq(first)
        (name, runs.sorted.apply(runs.size / 2), runs)
      }

    val wallT0 = System.nanoTime()
    val ev = bench(events, eventCases, Metrics.eventMeasures, "ts")
    val at = bench(attempts, attemptCases, Metrics.attemptMeasures,
      "attempt_time")
    val wallSec = (System.nanoTime() - wallT0) / 1e9

    def js(rs: Seq[(String, Double, Seq[Double])]): String =
      rs.map { case (n, med, runs) =>
        "\"" + n + f"\":{" + f""""sec":$med%.3f,"runs":""" +
          runs.map(v => f"$v%.3f").mkString("[", ",", "]") + "}"
      }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"metrics_bench","rows_events":$nEvents,"rows_attempts":$nAttempts,"seed_sec":$seedSec%.1f,"wall_sec":$wallSec%.1f,"event_cases":${js(ev)},"attempt_cases":${js(at)},"total_event_sec":${ev.map(_._2).sum}%.3f,"total_attempt_sec":${at.map(_._2).sum}%.3f}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_MB_OUT", "METRICS_BENCH.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
