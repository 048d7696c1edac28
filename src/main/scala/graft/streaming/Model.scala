package graft.streaming

import java.sql.Timestamp

/** Typed entities for the streaming pipeline (reference
  * hookdeck/outpost `internal/models/entities.go:18-140`, re-expressed as
  * Spark `Dataset[T]` case classes). */
object Model {

  final case class Event(
      event_id: String,
      tenant_id: String,
      topic: String,
      eligible_for_retry: Boolean,
      event_time: Timestamp,
      metadata: Map[String, String],
      data: String /* raw JSON payload */)

  final case class Destination(
      destination_id: String,
      tenant_id: String,
      dest_type: String,
      topics: Seq[String] /* glob patterns */,
      filter_json: Option[String] /* JSON filter schema, null = match all */,
      disabled: Boolean)

  /** One fanout edge: deliver `event` to `destination_id` as try #attempt.
    * Carries the event metadata so sinks can render delivery headers on
    * retries too (the reference re-fetches the full event per attempt). */
  final case class DeliveryTask(
      event_id: String,
      tenant_id: String,
      destination_id: String,
      attempt: Int,
      manual: Boolean,
      event_time: Timestamp,
      topic: String,
      data: String,
      metadata: Map[String, String] = Map.empty)

  final case class Attempt(
      attempt_id: String,
      event_id: String,
      tenant_id: String,
      destination_id: String,
      destination_type: String,
      attempt_number: Int,
      manual: Boolean,
      status: String /* success | failed */,
      attempt_time: Timestamp,
      code: String)

  final case class Alert(
      tenant_id: String,
      destination_id: String,
      kind: String /* consecutive_failure | destination_disabled | retries_exhausted */,
      threshold_pct: Int,
      failure_count: Int,
      at: Timestamp)
}
