package graft.streaming

import graft.core.Backoff
import graft.streaming.Model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Wires the full delivery platform into running streaming queries
  * (reference service split `internal/services/builder.go:83-95` — api /
  * delivery / log services — collapsed into one Spark app with three
  * connected queries):
  *
  *   raw JSON ∪ retry-task stream
  *     → validate/default → broadcast match/fanout → sink registry
  *       (foreachBatch; outcomes DENORMALIZED with event columns — the
  *       reference's wide-attempts design — into the month-partitioned
  *       log store)                                                     [q1]
  *   log store (file stream)
  *     → stateful alert evaluation → alert sink                         [q2]
  *   log store (file stream)
  *     → stateful retry scheduler (keyed state + timers) → retry-task
  *       store, re-fetching each destination before re-delivery
  *       (messagehandler.go:439-475)                                    [q3]
  *
  * The log parquet table is the decoupling point, playing the reference's
  * log-MQ role with replayability for free: every downstream consumer
  * (alerting, retries, metrics, retraining feeds) tails it as a file stream
  * with its own checkpoint.
  */
object Runner {

  final case class Running(delivery: StreamingQuery,
                           alerts: StreamingQuery,
                           retries: Option[StreamingQuery]) {
    /** Drain the deterministic queries. The retry query is NOT awaited:
      * processing-time timers make `shouldRunAnotherBatch` permanently true
      * for its stateful operator, so `processAllAvailable` would never latch
      * — it self-drives on its trigger; callers poll observable state. */
    def processAllAvailable(): Unit = {
      delivery.processAllAvailable()
      alerts.processAllAvailable()
    }
    def stopAll(): Unit = { delivery.stop(); alerts.stop(); retries.foreach(_.stop()) }
  }

  val attemptSchema: StructType = StructType(Seq(
    StructField("attempt_id", StringType), StructField("event_id", StringType),
    StructField("tenant_id", StringType), StructField("destination_id", StringType),
    StructField("destination_type", StringType), StructField("attempt_number", IntegerType),
    StructField("manual", BooleanType), StructField("status", StringType),
    StructField("attempt_time", TimestampType), StructField("code", StringType)))

  /** Log rows = attempt columns + denormalized event columns (S4). */
  val logSchema: StructType = attemptSchema
    .add("event_time", TimestampType).add("topic", StringType)
    .add("data", StringType)
    .add("metadata", MapType(StringType, StringType))
    .add("eligible_for_retry", BooleanType)

  private val taskSchema: StructType = StructType(Seq(
    StructField("event_id", StringType), StructField("tenant_id", StringType),
    StructField("destination_id", StringType), StructField("attempt", IntegerType),
    StructField("manual", BooleanType), StructField("event_time", TimestampType),
    StructField("topic", StringType), StructField("data", StringType),
    StructField("metadata", MapType(StringType, StringType)),
    StructField("eligible_for_retry", BooleanType)))

  def start(spark: SparkSession,
            rawJson: DataFrame,
            destinations: Dataset[Destination],
            registry: Sinks.Registry,
            logPath: String,
            alertSinkName: String,
            checkpointRoot: String,
            alertCfg: Alerts.Config = Alerts.Config(),
            retryPath: Option[String] = None,
            backoff: Backoff = Backoff(),
            eventTimeRetries: Boolean = true,
            retryWatermarkDelay: String = "10 minutes",
            latencyRollupTable: Option[String] = None,
            traceTable: Option[String] = None,
            destinationsRefresh: Option[() => Dataset[Destination]] = None): Running = {
    import spark.implicits._
    new java.io.File(logPath).mkdirs()
    retryPath.foreach(p => new java.io.File(p).mkdirs())

    val destDf = destinations.toDF()

    // One micro-batch's delivery: tasks (already fanned out) → sinks →
    // denormalized log (+ optional rollup/trace consumers).
    def deliverBatch(batch: DataFrame, batchId: Long): Unit = {
        // outcomes come back DENORMALIZED with event columns (wide
        // attempts, S4 — the reference's LogEntry shape): the log sink
        // consumes them directly, with no join back onto the batch.
        //
        // Fast path — single pure-projection sink, no rollup consumer:
        // the outcome frame has exactly ONE reader (the log write), so
        // nothing is shared and nothing needs a persist or an emptiness
        // probe — the fanout computes exactly once, inside the write
        // job. ONE query execution per trigger is the paced-latency
        // lever: the persist+count shape paid two full executions
        // (fanout→cache, then cache→write) plus their scheduling, ~2×
        // the per-batch fixed cost. An all-filtered batch flows through
        // the same job and simply writes no files.
        if (registry.singlePure && latencyRollupTable.isEmpty &&
            traceTable.isEmpty)
          Pipeline.logSinkBatch(registry.deliverLazy(batch), logPath, batchId)
        else
        registry.deliverWith(batch) { outcomes0 =>
          // count, not isEmpty: same single job over the cached batch, and
          // the row count lets the log sink size its write width (2 files
          // for a normal micro-batch, 8 for replay-scale) — file-count
          // growth in the log directory is what every downstream listing
          // (alert/retry file streams, ad-hoc readers) pays for
          val rows = outcomes0.count()
          if (rows > 0) {
            // with the rollup OR trace consumer on, the outcome frame
            // feeds MULTIPLE consumers; pin it once so all see identical
            // attempt stamps (a lazy pure-projection outcome re-evaluates
            // wall-clock columns per action — the log, the sketch, and
            // the trace spans would disagree)
            val outcomes =
              if (latencyRollupTable.isDefined || traceTable.isDefined)
                outcomes0.localCheckpoint(true)
              else outcomes0
            // epoch id makes a post-failure micro-batch replay a no-op
            Pipeline.logSinkBatch(outcomes, logPath, batchId, rows = rows)
            // delivery-latency observability rides the SAME micro-batch
            // loop: GK quantile sketches at the metrics engine's grain —
            // (destination, event-time hour) — folded into a commit-log
            // rollup other sessions can query mid-stream (p50/p99 per
            // destination per hour without scanning the attempt log;
            // coarser grains by sketch merge). Its own epoch token -> the
            // two commits share the curation intakes' crash-window
            // argument: a replay after "log written, rollup not"
            // re-delivers nothing (log token no-ops) and the rollup
            // append proceeds; both idempotent.
            latencyRollupTable.foreach { t =>
              graft.operators.Sketches.updateQuantileRollup(
                outcomes
                  .withColumn("latency_ms",
                    (unix_millis(col("attempt_time")) -
                      unix_millis(col("event_time"))).cast("double"))
                  .withColumn("bucket_ts", date_trunc("hour", col("event_time"))),
                t, Seq("destination_id", "bucket_ts"), "latency_ms",
                new java.sql.Timestamp(System.currentTimeMillis()),
                token = Some(s"lat-$batchId"))
            }
            // per-event trace spans ride the same micro-batch loop
            // (reference eventtracer.go): receive+match from the task
            // batch, deliver+log from the outcomes — one token-idempotent
            // append per epoch; retries re-emitting receive/match spans
            // dedup by deterministic span id (EventTrace read repair)
            traceTable.foreach { t =>
              EventTrace.append(
                EventTrace.receiveSpans(batch.dropDuplicates("event_id"))
                  .unionByName(EventTrace.matchSpans(batch))
                  .unionByName(EventTrace.deliverSpans(outcomes))
                  // logged_at = the CARRIED attempt stamp, not wall clock:
                  // a log-span row re-emitted under a new token must be an
                  // EXACT duplicate (EventTrace read repair dedups by
                  // span_id and keeps an arbitrary row — identical rows
                  // make that choice immaterial). The deliver→log gap is
                  // sub-batch anyway; durability time is the epoch's.
                  .unionByName(EventTrace.logSpans(
                    outcomes.withColumn("logged_at", col("attempt_time")))),
                t, token = Some(s"trace-$batchId"))
            }
          }
        }
    }

    // q1: (fresh fanout ∪ due retries) → deliver → denormalized log.
    //
    // Two dimension-binding modes:
    //   - STATIC (default): the destination Dataset is analyzed into the
    //     streaming plan once — zero per-batch dimension cost, the right
    //     trade for a fixed fleet (every bench rides this path).
    //   - REFRESH (destinationsRefresh = Some(thunk)): the fanout runs
    //     INSIDE foreachBatch against thunk()'s CURRENT rows, so CRUD on
    //     the destination store steers the running query at micro-batch
    //     grain — the reference's live re-read of destination state
    //     (eventhandler.go fetches destinations per event). Retry tasks
    //     union in at the RAW level and re-match per batch, which also
    //     re-validates enabled∧topic∧filter before re-delivery
    //     (messagehandler.go:439-475 re-fetches; the manual-retry API
    //     applies the same ladder).
    val delivery = destinationsRefresh match {
      case Some(thunk) =>
        val freshEvents = Pipeline.validateAndDefault(rawJson)
          .withColumn("attempt", lit(1))
          .withColumn("manual", lit(false))
        val source = retryPath match {
          case Some(p) =>
            freshEvents.unionByName(
              spark.readStream.schema(taskSchema).parquet(p)
                .select(freshEvents.columns.map(col): _*))
          case None => freshEvents
        }
        source.writeStream
          .queryName("graft_delivery")
          .option("checkpointLocation", s"$checkpointRoot/delivery")
          .trigger(Trigger.ProcessingTime("100 milliseconds"))
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            deliverBatch(
              Pipeline.matchFanout(spark, batch, thunk()), batchId)
          }
          .start()
      case None =>
        val fresh = Pipeline.matchFanout(spark,
          Pipeline.validateAndDefault(rawJson), destinations)
        val tasks = retryPath match {
          case Some(p) =>
            // re-fetch destination state before re-delivery; disabled
            // dests drop
            val retries = spark.readStream.schema(taskSchema).parquet(p)
              .join(broadcast(destDf.filter(!col("disabled"))
                .select(col("destination_id"), col("dest_type"))),
                Seq("destination_id"))
              .select(fresh.columns.map(col): _*)
            fresh.unionByName(retries)
          case None => fresh
        }
        tasks.writeStream
          .queryName("graft_delivery")
          .option("checkpointLocation", s"$checkpointRoot/delivery")
          // ProcessingTime only RATE-LIMITS (no data → no batch), so a
          // short interval costs nothing idle and stops end-to-end
          // latency being dominated by trigger wait (measured: 1 s
          // trigger capped the stream bench at ~3.1k events/s; 100 ms
          // lifts the cap)
          .trigger(Trigger.ProcessingTime("100 milliseconds"))
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            deliverBatch(batch, batchId)
          }
          .start()
    }

    // q2: log → alerts
    val attemptsStream = spark.readStream
      .schema(logSchema.add("month", StringType))
      .option("maxFilesPerTrigger", "64")
      .parquet(logPath)
      .select(attemptSchema.map(f => col(f.name)): _*)
      .as[Attempt]
    val alerts = Alerts.evaluateStream(spark, attemptsStream, alertCfg)
      .writeStream
      .option("checkpointLocation", s"$checkpointRoot/alerts")
      // real trigger: with the default ASAP trigger this query re-lists
      // the whole log directory continuously; as the log grows to
      // thousands of files that listing runs on the driver and competes
      // with the delivery query's micro-batches (measured as paced-phase
      // p99 spikes). Alerting is a seconds-grain consumer — 500 ms
      // keeps its latency negligible at a tenth of the listing load.
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .format("memory").outputMode("append")
      .queryName(alertSinkName)
      .start()

    // q3: log → retry scheduler → retry-task store
    val retriesQ = retryPath.map { p =>
      val outcomes = spark.readStream
        .schema(logSchema.add("month", StringType))
        .parquet(logPath)
        .select(col("event_id"), col("tenant_id"), col("destination_id"),
          col("attempt_number"), col("status"), col("eligible_for_retry"),
          col("manual"), col("event_time"), col("topic"), col("data"),
          col("metadata"), col("attempt_time").as("outcome_time"))
        .as[Retry.Outcome]
      // event-time mode (the DEFAULT since r6): the retry clock is the log
      // stream's watermark. q3's input is the log DIRECTORY — on a fresh
      // checkpoint it rereads all existing log files, i.e. every restart
      // is a history replay — so the replay-safe scheduler is the correct
      // default, not just an option: the wall-clock variant would fire a
      // stale retry for every long-resolved failure in the log. Live
      // latency rides the watermark: every delivery attempt appends an
      // outcome, so under traffic the watermark tracks the wall clock to
      // within `retryWatermarkDelay` plus the idle gap.
      (if (eventTimeRetries)
        Retry.scheduleStreamEventTime(spark, outcomes, backoff, retryWatermarkDelay)
       else Retry.scheduleStream(spark, outcomes, backoff))
        .writeStream
        .queryName("graft_retries")
        // real trigger: the timer-bearing stateful op re-batches forever, so
        // an ASAP trigger would busy-loop
        .trigger(Trigger.ProcessingTime("500 milliseconds"))
        .option("checkpointLocation", s"$checkpointRoot/retries")
        .foreachBatch { (batch: Dataset[DeliveryTask], _: Long) =>
          if (!batch.isEmpty)
            batch.toDF()
              .withColumn("eligible_for_retry", lit(true))
              .select(taskSchema.map(f => col(f.name)): _*)
              .write.mode("append").parquet(p)
        }
        .start()
    }

    Running(delivery, alerts, retriesQ)
  }

  /** T10: continuous time-bucketed metrics over the event stream —
    * watermarked tumbling windows with conditional counts (the streaming
    * twin of the batch metrics engine). */
  /** Publish one MANUAL delivery task into the retry-task store — the
    * reference's `POST /retry` → DeliveryMQ publish
    * (`apirouter/retry_handlers.go:118-122`,
    * `models.NewManualDeliveryTask`). The task lands as one parquet file
    * in the same spool q1 tails, so the running delivery query picks it
    * up on its next trigger; [[Retry]]'s state machine already gives
    * manual attempts their reference semantics (replaces any pending
    * auto-retry, fires immediately). */
  def publishManualTask(spark: SparkSession, task: DeliveryTask,
                        retryPath: String): Unit = {
    import spark.implicits._
    new java.io.File(retryPath).mkdirs()
    Seq(task.copy(manual = true)).toDS().toDF()
      .withColumn("eligible_for_retry", lit(true))
      .select(taskSchema.map(f => col(f.name).cast(f.dataType)): _*)
      .write.mode("append").parquet(retryPath)
  }

  def streamingMetrics(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window), col("topic"))
      .agg(count(lit(1)).as("count"),
        count(when(col("eligible_for_retry") === false, 1)).as("ineligible_count"))
      .select(col("window.start").as("bucket"), col("topic"),
        col("count"), col("ineligible_count"))

  /** T9/T10: streaming sessionization — the event-time twin of the batch
    * gap-based sessionizer (gate `sessionize_30min`), on Spark's NATIVE
    * `session_window` so watermark advancement both closes sessions and
    * evicts their state: the stream runs forever in bounded memory, and
    * in append mode a session row emits exactly once, when the watermark
    * passes its close. Same semantics as the batch lag+running-sum form:
    * events within `gap` of each other merge into one session per key. */
  def streamingSessions(events: DataFrame, gap: String, watermark: String,
                        keyCol: String = "user_id",
                        tsCol: String = "event_time"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** [[streamingMetrics]] at the reference's exact bucket semantics: any
    * sub-month [[graft.functions.Buckets.Granularity]] maps LOSSLESSLY
    * onto Spark's native tumbling `window(ts, step, step, startOffset)` —
    * s/m/h/d buckets are epoch-anchored (Spark's window anchor is already
    * 1970-01-01T00:00Z) and week buckets shift the anchor by 3 days to
    * 1970-01-04 (a Sunday), matching `Buckets.truncate` bit for bit
    * (spec-pinned). Native windows, not a custom group key, so watermark
    * state eviction works and the stream runs forever in bounded memory.
    * Month buckets are calendar-variable and cannot be a fixed window —
    * rejected here; the batch Metrics engine covers them. */
  def streamingMetricsAt(events: DataFrame, g: graft.functions.Buckets.Granularity,
                         watermark: String): DataFrame = {
    require(g.unit != graft.functions.Buckets.Month,
      "month buckets are calendar-variable; use the batch Metrics engine")
    val step = s"${g.unit.seconds * g.value} seconds"
    val anchor = if (g.unit == graft.functions.Buckets.Week) "259200 seconds"
      else "0 seconds"
    events
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(
        col("event_time"), step, step, anchor), col("topic"))
      .agg(count(lit(1)).as("count"),
        count(when(col("eligible_for_retry") === false, 1)).as("ineligible_count"))
      .select(col("window.start").as("bucket"), col("topic"),
        col("count"), col("ineligible_count"))
  }
}
