package graft.streaming

import java.sql.Timestamp
import graft.core.Backoff
import graft.streaming.Model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Delayed-retry scheduling as a keyed stateful operator — the hardest
  * streaming piece (reference: `internal/deliverymq/retry.go`, schedule at
  * `deliverymq/messagehandler.go:354-434`, Redis-ZSET scheduler
  * `internal/scheduler/scheduler.go:25-40`). Structured Streaming has no
  * delayed-message primitive, so the schedule lives in keyed state with a
  * processing-time timer:
  *
  *   - key = event_id:destination_id (the reference's RetryID — one pending
  *     retry per edge; a manual retry REPLACES a pending auto-retry);
  *   - a failed attempt (eligible, under max) schedules fire_at = now +
  *     backoff(attempt#); a success CANCELS the pending retry;
  *   - when the timer fires, the state emits a DeliveryTask for attempt n+1
  *     and clears.
  *
  * Scale: state cardinality = in-flight (event, destination) edges with a
  * pending retry, each O(100B); timers are per-key, handled by the state
  * store. No shuffle beyond the initial key partition.
  */
object Retry {

  final case class Outcome(event_id: String, tenant_id: String,
                           destination_id: String, attempt_number: Int,
                           status: String, eligible_for_retry: Boolean,
                           manual: Boolean, event_time: Timestamp,
                           topic: String, data: String,
                           metadata: Map[String, String],
                           outcome_time: Timestamp)

  final case class PendingRetry(task: DeliveryTask, fireAtMillis: Long)

  /** Pure transition for one key: (pending, new outcomes, now) →
    * (pending', tasks due). Used by both the streaming wiring and tests. */
  def transition(backoff: Backoff, pending: Option[PendingRetry],
                 outcomes: Seq[Outcome], nowMillis: Long): (Option[PendingRetry], Seq[DeliveryTask]) = {
    var state = pending
    outcomes.sortBy(o => (o.outcome_time.getTime, o.attempt_number)).foreach { o =>
      if (o.status == "success") {
        state = None // cancel-on-success (messagehandler.go:255-270)
      } else if (o.manual) {
        // manual retry replaces any pending auto retry, fires immediately
        state = Some(PendingRetry(DeliveryTask(o.event_id, o.tenant_id,
          o.destination_id, o.attempt_number + 1, manual = true,
          o.event_time, o.topic, o.data, o.metadata), o.outcome_time.getTime))
      } else if (o.eligible_for_retry && !backoff.exhausted(o.attempt_number + 1)) {
        val fireAt = o.outcome_time.getTime + backoff.delayMillis(o.attempt_number)
        state = Some(PendingRetry(DeliveryTask(o.event_id, o.tenant_id,
          o.destination_id, o.attempt_number + 1, manual = false,
          o.event_time, o.topic, o.data, o.metadata), fireAt))
      }
      // ineligible / exhausted: drop (alerting handles exhaustion signal)
    }
    state match {
      case Some(p) if p.fireAtMillis <= nowMillis => (None, Seq(p.task))
      case s => (s, Nil)
    }
  }

  /** Streaming wiring: attempt outcomes → due DeliveryTasks. Uses
    * processing-time timers to wake keys whose backoff expired — the exact
    * analogue of the reference's wall-clock Redis-ZSET scheduler
    * (`scheduler.go:25-40`). Caveat inherited from that semantics: on a
    * HISTORY REPLAY (reprocessing a day of log files), every recorded
    * failure's backoff has long expired on the wall clock, so stale
    * retries fire immediately even though the log also contains the
    * success that resolved them. Use [[scheduleStreamEventTime]] when the
    * input may be replayed. */
  def scheduleStream(spark: SparkSession, outcomes: Dataset[Outcome],
                     backoff: Backoff = Backoff()): Dataset[DeliveryTask] = {
    import spark.implicits._
    outcomes
      .groupByKey(o => s"${o.event_id}:${o.destination_id}")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (key: String, it: Iterator[Outcome], gs: GroupState[PendingRetry]) => {
          val now = gs.getCurrentProcessingTimeMs()
          val (next, due) = transition(backoff, gs.getOption, it.toSeq, now)
          next match {
            case Some(p) =>
              gs.update(p)
              gs.setTimeoutDuration(math.max(p.fireAtMillis - now, 1L))
            case None => if (gs.exists) gs.remove()
          }
          due.iterator
        })
  }

  /** Replay-safe variant: the schedule runs on EVENT time. The retry clock
    * is the stream's watermark, so a pending retry fires only when the
    * watermark (data-derived, monotone) passes fire_at — never because the
    * wall clock moved. Reprocessing a day of history therefore schedules
    * zero live retries for chains the history already resolved: the
    * recorded success (or the recorded next attempt) reaches the key's
    * state before the watermark reaches its fire_at, cancelling or
    * replacing the pending entry exactly as the original run did. Only a
    * chain that ended the replay UNRESOLVED fires — once, when live data
    * advances the watermark past its backoff — which is the correct
    * pick-up-where-history-left-off semantics.
    *
    * Same [[transition]] function, same state shape; `now` is the
    * watermark instead of the wall clock, and timers are
    * `EventTimeTimeout` timestamps (clamped one ms past the current
    * watermark, which Spark requires of event-time timers). */
  def scheduleStreamEventTime(spark: SparkSession, outcomes: Dataset[Outcome],
                              backoff: Backoff = Backoff(),
                              watermarkDelay: String = "10 minutes"): Dataset[DeliveryTask] = {
    import spark.implicits._
    outcomes
      .withWatermark("outcome_time", watermarkDelay)
      .groupByKey(o => s"${o.event_id}:${o.destination_id}")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: String, it: Iterator[Outcome], gs: GroupState[PendingRetry]) => {
          val wm = gs.getCurrentWatermarkMs()
          val (next, due) = transition(backoff, gs.getOption, it.toSeq, wm)
          next match {
            case Some(p) =>
              gs.update(p)
              gs.setTimeoutTimestamp(math.max(p.fireAtMillis, wm + 1L))
            case None => if (gs.exists) gs.remove()
          }
          due.iterator
        })
  }
}
