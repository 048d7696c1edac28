package graft.streaming

import graft.streaming.Model._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Wires the full delivery platform into running streaming queries
  * (reference service split `internal/services/builder.go:83-95` — api /
  * delivery / log services — collapsed into one Spark app with two
  * connected queries + downstream consumers of the log table).
  *
  *   raw JSON stream
  *     → validate/default → broadcast match/fanout → sink registry
  *       (foreachBatch; outcomes logged to the month-partitioned store)  [q1]
  *   log store (file stream)
  *     → stateful alert evaluation → alert sink                          [q2]
  *
  * The log parquet table is the decoupling point, playing the reference's
  * log-MQ role with replayability for free: any number of downstream
  * consumers (alerting, metrics, retraining feeds) tail it as a file
  * stream with their own checkpoints.
  */
object Runner {

  final case class Running(delivery: StreamingQuery, alerts: StreamingQuery) {
    def processAllAvailable(): Unit = { delivery.processAllAvailable(); alerts.processAllAvailable() }
    def stopAll(): Unit = { delivery.stop(); alerts.stop() }
  }

  val attemptSchema: StructType = StructType(Seq(
    StructField("attempt_id", StringType), StructField("event_id", StringType),
    StructField("tenant_id", StringType), StructField("destination_id", StringType),
    StructField("destination_type", StringType), StructField("attempt_number", IntegerType),
    StructField("manual", BooleanType), StructField("status", StringType),
    StructField("attempt_time", TimestampType), StructField("code", StringType)))

  def start(spark: SparkSession,
            rawJson: DataFrame,
            destinations: Dataset[Destination],
            registry: Sinks.Registry,
            logPath: String,
            alertSinkName: String,
            checkpointRoot: String,
            alertCfg: Alerts.Config = Alerts.Config()): Running = {
    import spark.implicits._

    // q1: ingest → fanout → deliver → log
    val tasks = Pipeline.matchFanout(spark,
      Pipeline.validateAndDefault(rawJson), destinations)
    val delivery = tasks.writeStream
      .queryName("graft_delivery")
      .option("checkpointLocation", s"$checkpointRoot/delivery")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val outcomes = registry.deliver(batch)
          if (!outcomes.isEmpty)
            Pipeline.logSinkBatch(outcomes, logPath)
        }
      }
      .start()

    // q2: tail the log table → alert evaluation (own checkpoint = replayable)
    new java.io.File(logPath).mkdirs() // file stream source requires the dir
    val attemptsStream = spark.readStream
      .schema(attemptSchema.add("month", StringType))
      .option("maxFilesPerTrigger", "64")
      .parquet(logPath)
      .drop("month")
      .as[Attempt]
    val alerts = Alerts.evaluateStream(spark, attemptsStream, alertCfg)
      .writeStream
      .queryName("graft_alerts")
      .format("memory")
      .option("checkpointLocation", s"$checkpointRoot/alerts")
      .outputMode("append")
      .queryName(alertSinkName)
      .start()

    Running(delivery, alerts)
  }

  /** T10: continuous time-bucketed metrics over the event stream —
    * watermarked tumbling windows with conditional counts (the streaming
    * twin of the batch metrics engine). */
  def streamingMetrics(events: DataFrame, window: String, watermark: String): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("event_time"), window), col("topic"))
      .agg(count(lit(1)).as("count"),
        count(when(col("eligible_for_retry") === false, 1)).as("ineligible_count"))
      .select(col("window.start").as("bucket"), col("topic"),
        col("count"), col("ineligible_count"))
}
