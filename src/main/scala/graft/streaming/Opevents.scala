package graft.streaming

import graft.streaming.Model._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** T8: operational events — alerts re-published as events on the operator's
  * own topics (reference `internal/opevents/event.go:9-16`,
  * `sink_http.go`/`sink_mq.go`). The output is a plain event stream, so any
  * sink (the delivery pipeline itself, Kafka, files) can carry it. */
object Opevents {

  /** Reference topic names for each alert kind; `quality_failure` is a
    * beyond-reference extension carrying [[QualityStream]] verdicts on
    * the same rails. */
  val TopicFor: Map[String, String] = Map(
    "consecutive_failure" -> "alert.destination.consecutive_failure",
    "destination_disabled" -> "alert.destination.disabled",
    "retries_exhausted" -> "alert.attempt.exhausted_retries",
    "quality_failure" -> "alert.quality.constraint_failure")

  def toOperationalEvents(alerts: Dataset[Alert]): DataFrame = {
    val topicExpr = TopicFor.foldLeft(lit("alert.unknown")) {
      case (acc, (kind, topic)) => when(col("kind") === kind, topic).otherwise(acc)
    }
    alerts.toDF().select(
      concat(lit("ope_"), col("tenant_id"), lit(":"), col("destination_id"),
        lit(":"), col("kind"), lit(":"), unix_millis(col("at"))).as("event_id"),
      col("tenant_id"),
      topicExpr.as("topic"),
      to_json(struct(col("destination_id"), col("threshold_pct"),
        col("failure_count"))).as("data"),
      col("at").as("event_time"))
  }
}
