package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.{CommitLog, Quality}

/** STREAMING DATA-QUALITY MONITOR: the declarative constraint suite
  * ([[graft.operators.Quality]]) evaluated per micro-batch, with one
  * verdict row per (epoch, constraint) appended to a commit-log table —
  * the deequ-on-a-stream shape. A degrading upstream shows up as a
  * violations time series the metrics layer can alert on, without any
  * second pass over the data (each epoch's suite shares one aggregate
  * over the batch the pipeline already holds).
  *
  * Contract mirrors the other intakes: token-idempotent per epoch (a
  * replayed foreachBatch epoch no-ops the commit), verdict rows carry
  * the epoch id and the batch row count, and the table is a normal
  * commit-log table (retention, compaction, change feed all apply).
  *
  * Constraint scope on a stream: [[Quality.Unique]] and
  * [[Quality.MaxPerGroup]] hold WITHIN the epoch (cross-epoch
  * uniqueness is the dedup ledger family's job);
  * [[Quality.RefIntegrity]] joins each batch against the (static or
  * slowly-refreshed) reference frame — the standard stream-static join
  * shape. */
object QualityStream {

  /** Start the monitor: evaluate `constraints` on every micro-batch of
    * `stream`, appending verdicts to `verdictTable`. */
  def monitor(stream: DataFrame, constraints: Seq[Quality.Constraint],
              verdictTable: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        monitorBatch(batch, batchId, constraints, verdictTable)
      }
      .start()

  /** One epoch of [[monitor]] (separable for direct testing and
    * foreachBatch reuse). Empty batches write nothing — no epoch spam
    * from idle triggers. */
  def monitorBatch(batch: DataFrame, batchId: Long,
                   constraints: Seq[Quality.Constraint],
                   verdictTable: String): Unit = {
    val cached = batch.persist()
    try {
      val rows = cached.count()
      if (rows == 0L) return
      val verdicts = Quality.check(cached, constraints)
        .withColumn("epoch", lit(batchId))
        .withColumn("rows_checked", lit(rows))
        .withColumn("checked_at", current_timestamp())
        .withColumn("verdict_id",
          concat_ws(":", lit(batchId), col("check_name")))
      CommitLog.append(verdicts, verdictTable,
        idCol = "verdict_id", tsCol = "checked_at",
        token = Some(s"dq-$batchId"))
      ()
    } finally { cached.unpersist(); () }
  }

  /** The verdict series for one constraint — the alerting readout:
    * (epoch, violations, passed, rows_checked) ordered by epoch. */
  def series(spark: SparkSession, verdictTable: String,
             checkName: String): DataFrame =
    CommitLog.scan(spark, verdictTable)
      .filter(col("check_name") === checkName)
      .select(col("epoch"), col("violations"), col("passed"),
        col("rows_checked"))
      .orderBy(col("epoch"))

  /** Epochs whose suite had ANY failing constraint, with the failing
    * check names — the page-the-operator view. */
  def failingEpochs(spark: SparkSession, verdictTable: String): DataFrame =
    CommitLog.scan(spark, verdictTable)
      .filter(col("passed") === 0)
      .groupBy(col("epoch"))
      .agg(sort_array(collect_list(col("check_name"))).as("failing_checks"),
        sum(col("violations")).as("total_violations"))
      .orderBy(col("epoch"))

  /** Failing verdicts as operational ALERT rows ([[Model.Alert]] shape):
    * data-quality pages ride the SAME opevents pipeline as delivery
    * alerts — [[Opevents.toOperationalEvents]] turns them into
    * `alert.quality.constraint_failure` events any sink can carry
    * (webhook out, the delivery pipeline itself, files). Mapping:
    * `destination_id` carries the CHECK name (the actionable unit),
    * `tenant_id` the monitor name, `failure_count` the violation count,
    * `at` the verdict stamp. One alert per failing (epoch, constraint). */
  def alerts(spark: SparkSession, verdictTable: String,
             monitor: String = "quality"): org.apache.spark.sql.Dataset[Model.Alert] = {
    import spark.implicits._
    CommitLog.scan(spark, verdictTable)
      .filter(col("passed") === 0)
      .select(
        lit(monitor).as("tenant_id"),
        col("check_name").as("destination_id"),
        lit("quality_failure").as("kind"),
        lit(100).as("threshold_pct"),
        col("violations").cast("int").as("failure_count"),
        col("checked_at").as("at"))
      .as[Model.Alert]
  }
}
