package graft

import graft.streaming.{Runner, Sinks}
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class RunnerSpec extends GraftSuite {

  test("full pipeline: ingest -> fanout -> deliver -> log table -> alert stream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft_runner").toString
    val destinations = Seq(
      Destination("d_ok", "t1", "mock", Seq("*"), None, disabled = false),
      Destination("d_down", "t1", "mock", Seq("order.*"), None, disabled = false)).toDS()
    val registry = new Sinks.Registry(Seq(
      Sinks.MockSink("mock", failDestinations = Set("d_down"))))

    val raw = MemoryStream[String]
    val running = Runner.start(spark, raw.toDF(), destinations, registry,
      logPath = s"$tmp/log", alertSinkName = "runner_alerts",
      checkpointRoot = s"$tmp/ckpt",
      alertCfg = graft.streaming.Alerts.Config(autoDisableCount = 2, thresholds = Seq(100)),
      traceTable = Some(s"$tmp/traces"))
    try {
      raw.addData((1 to 3).map(i =>
        s"""{"event_id":"e$i","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:0$i.000Z","data":{"n":$i}}"""))
      running.delivery.processAllAvailable()

      // the log table holds denormalized attempt outcomes, month-partitioned
      val log = spark.read.parquet(s"$tmp/log")
      assert(log.count() == 6) // 3 events × 2 matched destinations
      assert(log.filter(col("status") === "failed").count() == 3)
      assert(log.select("month").distinct().collect().map(_.getString(0)).toSeq == Seq("2024-01"))

      // trace spans rode the same micro-batch loop: receive + 2×match +
      // 2×deliver + 2×log per event, failed delivery status carried
      val t1 = graft.streaming.EventTrace
        .forEvent(spark, s"$tmp/traces", "e1").collect()
      assert(t1.map(_.getAs[String]("stage")).toSeq ==
        Seq("receive", "match", "match", "deliver", "deliver", "log", "log"),
        t1.map(_.getAs[String]("stage")).toSeq)
      assert(t1.exists(r => r.getAs[String]("stage") == "deliver" &&
        r.getAs[String]("destination_id") == "d_down" &&
        r.getAs[String]("status") == "failed"))

      // the alert query tails the log table and fires on the 2nd d_down failure
      running.alerts.processAllAvailable()
      val alerts = spark.sql("SELECT kind, destination_id, failure_count FROM runner_alerts")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(alerts == Set(("destination_disabled", "d_down", 2)))
    } finally running.stopAll()
  }

  test("latency rollup rides the delivery loop: per-destination quantile " +
      "state matches the attempt log's exact stamps") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_runner_lat").toString
    val destinations = Seq(
      Destination("d1", "t1", "mock", Seq("*"), None, disabled = false),
      Destination("d2", "t1", "mock", Seq("order.*"), None, disabled = false)).toDS()
    val registry = new Sinks.Registry(Seq(
      Sinks.MockSink("mock", wallClockAttempts = true)))
    val raw = MemoryStream[String]
    val rollup = s"$tmp/latency"
    val running = Runner.start(spark, raw.toDF(), destinations, registry,
      logPath = s"$tmp/log", alertSinkName = "runner_lat_alerts",
      checkpointRoot = s"$tmp/ckpt", latencyRollupTable = Some(rollup))
    try {
      (0 until 3).foreach { b => // several micro-batches -> several merges
        raw.addData((1 to 20).map(i =>
          s"""{"event_id":"b$b-e$i","tenant_id":"t1","topic":"order.created","event_time":"${new java.sql.Timestamp(System.currentTimeMillis()).toInstant}","data":{"n":$i}}"""))
        running.delivery.processAllAvailable()
      }
      // stored grain is (destination, event-time hour); the wall-clock
      // test spans at most two hour buckets — read per-destination via
      // the coarser-grain sketch merge (the exact query a dashboard runs)
      val state = graft.operators.Sketches.quantilesAcross(
          spark, rollup, Seq("destination_id"), Seq(0.5, 0.99))
        .collect().map(r => r.getString(0) -> (r.getLong(2), r.getSeq[Double](1)))
        .toMap
      assert(state.keySet == Set("d1", "d2"))
      // exact side: the attempt log's own latency stamps
      val log = spark.read.parquet(s"$tmp/log")
        .select(col("destination_id"),
          (unix_millis(col("attempt_time")) - unix_millis(col("event_time")))
            .cast("double").as("lat"))
      Seq("d1", "d2").foreach { d =>
        val lats = log.filter(col("destination_id") === d)
          .collect().map(_.getDouble(1)).sorted
        val (n, qs) = state(d)
        assert(n == lats.length, s"$d n_rows $n != logged ${lats.length}")
        Seq(0.5 -> qs(0), 0.99 -> qs(1)).foreach { case (p, est) =>
          val lt = lats.count(_ < est); val le = lats.count(_ <= est)
          assert(lt <= (p + 0.05) * n + 1 && le >= (p - 0.05) * n - 1,
            s"$d p$p=$est violates rank bound over ${lats.length} attempts")
        }
      }
    } finally running.stopAll()
  }

  test("retry loop: failed delivery -> scheduled retry -> redelivery succeeds") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft_retry").toString
    val destinations = Seq(
      Destination("d_ok", "t1", "mock", Seq("*"), None, disabled = false)).toDS()
    // e1 fails its first attempt, succeeds from the second; heartbeat
    // events (hb*) succeed immediately
    val registry = new Sinks.Registry(Seq(
      Sinks.MockSink("mock", failUntilAttempt = 2, failEvents = Set("e1"))))

    val raw = MemoryStream[String]
    // Runs on the DEFAULT scheduler — event-time since r6. The retry
    // clock is the log watermark, so the test drives it the way live
    // traffic does: each heartbeat delivery appends an outcome whose
    // attempt_time advances the watermark past e1's backoff.
    val running = Runner.start(spark, raw.toDF(), destinations, registry,
      logPath = s"$tmp/log", alertSinkName = "retry_alerts",
      checkpointRoot = s"$tmp/ckpt",
      alertCfg = graft.streaming.Alerts.Config(autoDisableCount = 100),
      retryPath = Some(s"$tmp/retry"),
      backoff = graft.core.Backoff(baseMillis = 1, factor = 2, maxRetries = 3),
      retryWatermarkDelay = "0 seconds",
      traceTable = Some(s"$tmp/traces"))
    try {
      raw.addData(
        """{"event_id":"e1","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:00Z","data":{"n":1}}""")
      running.delivery.processAllAvailable()

      // the retry query self-drives on its trigger; poll the observable
      // outcome (e1 attempt 2 success in the log) with a deadline,
      // feeding heartbeats so the watermark keeps moving
      def logState(): Set[(Int, String)] =
        try spark.read.parquet(s"$tmp/log")
          .filter(col("event_id") === "e1")
          .select("attempt_number", "status")
          .collect().map(r => (r.getInt(0), r.getString(1))).toSet
        catch { case _: Exception => Set.empty }
      val deadline = System.currentTimeMillis() + 60000
      var state = logState()
      var hb = 0
      while (state != Set((1, "failed"), (2, "success")) &&
          System.currentTimeMillis() < deadline) {
        hb += 1
        // attempt_time (the watermark column) mirrors event_time in
        // MockSink, so heartbeats carry strictly increasing event times
        val hbTime = java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(hb * 60L)
        raw.addData(
          s"""{"event_id":"hb$hb","tenant_id":"t1","topic":"order.created","event_time":"$hbTime","data":{"n":0}}""")
        Thread.sleep(500)
        running.delivery.processAllAvailable()
        state = logState()
      }
      assert(state == Set((1, "failed"), (2, "success")),
        s"expected fail-then-success for e1, got $state")

      // the retry crossed the trace table too: e1's trace carries BOTH
      // deliver spans (attempt 1 failed, attempt 2 success) and both log
      // spans, under one trace id
      val t1 = graft.streaming.EventTrace
        .forEvent(spark, s"$tmp/traces", "e1").collect()
      val delivers = t1.filter(_.getAs[String]("stage") == "deliver")
        .map(r => (r.getAs[Int]("attempt"), r.getAs[String]("status"))).toSet
      assert(delivers == Set((1, "failed"), (2, "success")),
        s"retry attempts missing from trace: ${t1.toSeq}")
      assert(t1.count(_.getAs[String]("stage") == "log") == 2)
      assert(t1.map(_.getAs[String]("trace_id")).distinct.length == 1)
    } finally running.stopAll()
  }

  test("event-time retry scheduler: history replay fires zero stale retries") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    val t0 = 1704067200000L // 2024-01-01T00:00Z
    def outcome(ev: String, att: Int, status: String, atMs: Long) =
      graft.streaming.Retry.Outcome(ev, "t1", "d1", att, status,
        eligible_for_retry = true, manual = false,
        new java.sql.Timestamp(t0), "order.created", "{}", Map.empty,
        new java.sql.Timestamp(atMs))

    val mem = MemoryStream[graft.streaming.Retry.Outcome]
    val tasks = graft.streaming.Retry.scheduleStreamEventTime(spark, mem.toDS(),
      graft.core.Backoff(baseMillis = 60000, factor = 1, maxRetries = 5))
    val q = tasks.writeStream.format("memory").outputMode("append")
      .queryName("replay_retries").start()
    try {
      def emitted(): Set[(String, Int)] =
        spark.sql("SELECT event_id, attempt FROM replay_retries")
          .collect().map(r => (r.getString(0), r.getInt(1))).toSet

      // REPLAY a day-old history: e1 failed then succeeded (resolved);
      // e2 failed and was never resolved. Batches arrive in log order.
      mem.addData(outcome("e1", 1, "failed", t0),
        outcome("e2", 1, "failed", t0 + 60000L))
      q.processAllAvailable()
      mem.addData(outcome("e1", 2, "success", t0 + 120000L))
      q.processAllAvailable()
      // the whole replay is in: the wall clock is ~2 years past every
      // backoff, but the event-time scheduler must have fired NOTHING —
      // e1 was resolved by its recorded success before the watermark
      // reached its fire_at, and e2's fire_at is still past the watermark
      assert(emitted() == Set.empty, s"stale retries fired: ${emitted()}")

      // live data arrives (an hour later in event time): the watermark
      // passes e2's fire_at and its — genuinely unresolved — retry fires
      // exactly once; e1 stays quiet
      var i = 0
      val deadline = System.currentTimeMillis() + 60000
      while (emitted().isEmpty && System.currentTimeMillis() < deadline) {
        mem.addData(outcome(s"live_$i", 1, "success", t0 + 3600000L + i * 60000L))
        q.processAllAvailable()
        i += 1
      }
      assert(emitted() == Set(("e2", 2)), s"got ${emitted()}")
    } finally q.stop()
  }

  test("streaming metrics: watermarked tumbling windows with conditional counts") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val mem = MemoryStream[Event]
    val agg = Runner.streamingMetrics(mem.toDF(), "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("stream_metrics")
      .outputMode("complete").start()
    try {
      def ev(id: String, topic: String, min: Int, eligible: Boolean) =
        Event(id, "t1", topic, eligible,
          new java.sql.Timestamp(1704067200000L + min * 60000L), Map.empty, "{}")
      mem.addData(ev("e1", "a", 5, true), ev("e2", "a", 30, false),
        ev("e3", "a", 70, true), ev("e4", "b", 10, true))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT unix_millis(bucket), topic, count, ineligible_count FROM stream_metrics")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(
        (1704067200000L, "a", 2L, 1L),
        (1704067200000L, "b", 1L, 0L),
        (1704070800000L, "a", 1L, 0L)))
    } finally q.stop()
  }

  test("streaming sessions: gap-merged, closed and emitted by the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val mem = MemoryStream[Event]
    val agg = Runner.streamingSessions(
      mem.toDF().withColumnRenamed("tenant_id", "user_id"),
      gap = "30 minutes", watermark = "0 seconds")
    // append mode: a session row emits exactly once, after the watermark
    // passes its close — the production contract (complete mode would
    // re-emit every session forever)
    val q = agg.writeStream.format("memory").queryName("stream_sessions")
      .outputMode("append").start()
    try {
      val t0 = 1704067200000L // 2024-01-01T00:00Z
      def ev(id: String, user: String, ms: Long) =
        Event(id, user, "a", true, new java.sql.Timestamp(ms), Map.empty, "{}")
      // u1: two events 10 min apart (one session), then a 2h-later event
      // (second session); u2: one event
      mem.addData(ev("e1", "u1", t0), ev("e2", "u1", t0 + 600000L),
        ev("e3", "u2", t0 + 300000L))
      q.processAllAvailable()
      mem.addData(ev("e4", "u1", t0 + 7200000L))
      q.processAllAvailable()
      // advance the watermark far past every session close
      mem.addData(ev("e5", "u3", t0 + 36000000L))
      q.processAllAvailable()
      val got = spark.sql(
        """SELECT user_id, unix_millis(session_start), unix_millis(session_end),
          |n_events FROM stream_sessions""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == Set(
        ("u1", t0, t0 + 600000L + 1800000L, 2L),            // merged pair + gap
        ("u2", t0 + 300000L, t0 + 300000L + 1800000L, 1L),
        ("u1", t0 + 7200000L, t0 + 7200000L + 1800000L, 1L)), got.toString)
    } finally q.stop()
  }

  test("streaming metrics at reference granularities: Sunday-anchored 1w buckets") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val mem = MemoryStream[Event]
    val agg = Runner.streamingMetricsAt(mem.toDF(),
      graft.functions.Buckets.Granularity.parse("1w"), "10 minutes")
    val q = agg.writeStream.format("memory").queryName("stream_metrics_1w")
      .outputMode("complete").start()
    try {
      // 2024-01-01 is a Monday: its 1w bucket starts Sunday 2023-12-31
      def ev(id: String, ms: Long) =
        Event(id, "t1", "a", true, new java.sql.Timestamp(ms), Map.empty, "{}")
      val mon = 1704067200000L // 2024-01-01T00:00Z
      mem.addData(ev("e1", mon), ev("e2", mon + 86400000L),
        ev("e3", mon + 7L * 86400000L))
      q.processAllAvailable()
      val got = spark.sql("SELECT unix_millis(bucket), count FROM stream_metrics_1w")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sun = 1703980800000L // 2023-12-31T00:00Z, a Sunday
      assert(got == Set((sun, 2L), (sun + 7L * 86400000L, 1L)),
        s"Sunday-anchored week buckets, got $got")
      assert(graft.functions.Buckets.truncate(
        java.time.Instant.ofEpochMilli(mon),
        graft.functions.Buckets.Granularity.parse("1w")).toEpochMilli == sun)
    } finally q.stop()
  }
}
