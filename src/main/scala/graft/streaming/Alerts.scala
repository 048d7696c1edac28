package graft.streaming

import java.sql.Timestamp
import graft.streaming.Model._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Consecutive-failure alerting as a keyed stateful operator (reference
  * hookdeck/outpost `internal/alert/evaluator.go:119-157`,
  * `threshold.go:22-88`, `store.go:40-66`).
  *
  * Semantics:
  *   - state per (tenant_id, destination_id): the SET of failing attempt_ids
  *     (idempotent under redelivery — same attempt counted once), mirroring
  *     the reference's SADD/SCARD Redis set;
  *   - a success resets the set;
  *   - thresholds are percentages of `autoDisableCount` N: an alert fires on
  *     the EXACT crossing of ceil(pct·N/100) (≥ for the 100% threshold, which
  *     also emits destination_disabled);
  *   - retry exhaustion (attempt_number > maxRetries ∧ eligible) emits
  *     `retries_exhausted`, suppressed per destination within the state.
  *
  * Scale: state is per (tenant, destination) — cardinality = destinations
  * count (millions at most), each holding a bounded set (≤ N ids). The
  * stream shuffles once on the group key; with watermarking the store is
  * bounded. `mapGroupsWithState` keeps it on the state store (RocksDB in
  * production), not the heap.
  */
object Alerts {

  final case class Config(autoDisableCount: Int = 100,
                          thresholds: Seq[Int] = Seq(50, 70, 90, 100),
                          maxRetries: Int = 10)

  final case class AlertState(failingAttemptIds: Set[String],
                              exhaustedSignalled: Boolean)

  def thresholdFor(pct: Int, n: Int): Int = math.ceil(pct * n / 100.0).toInt

  /** Pure single-key transition: (state, new attempts) → (state', alerts). */
  def evaluate(cfg: Config, key: (String, String), attempts: Seq[Attempt],
               st: AlertState): (AlertState, Seq[Alert]) = {
    val (tenant, dest) = key
    var state = st
    val out = Seq.newBuilder[Alert]
    // deterministic order under redelivery: by time then id
    attempts.sortBy(a => (a.attempt_time.getTime, a.attempt_id)).foreach { a =>
      if (a.status == "success") {
        state = AlertState(Set.empty, exhaustedSignalled = false)
      } else {
        val before = state.failingAttemptIds.size
        val after = state.failingAttemptIds + a.attempt_id
        cfg.thresholds.foreach { pct =>
          val t = thresholdFor(pct, cfg.autoDisableCount)
          // fire on the exact crossing only (idempotent under redelivery)
          if (before < t && after.size >= t) {
            out += Alert(tenant, dest,
              if (pct >= 100) "destination_disabled" else "consecutive_failure",
              pct, after.size, a.attempt_time)
          }
        }
        state = state.copy(failingAttemptIds = after)
        if (a.attempt_number > cfg.maxRetries && !state.exhaustedSignalled) {
          out += Alert(tenant, dest, "retries_exhausted", 0, after.size, a.attempt_time)
          state = state.copy(exhaustedSignalled = true)
        }
      }
    }
    (state, out.result())
  }

  /** Streaming wiring: attempts stream → alert stream. */
  def evaluateStream(spark: SparkSession, attempts: Dataset[Attempt],
                     cfg: Config = Config()): Dataset[Alert] = {
    import spark.implicits._
    attempts
      .groupByKey(a => (a.tenant_id, a.destination_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, String), it: Iterator[Attempt], gs: GroupState[AlertState]) => {
          val st = gs.getOption.getOrElse(AlertState(Set.empty, exhaustedSignalled = false))
          val (next, alerts) = evaluate(cfg, key, it.toSeq, st)
          gs.update(next)
          alerts.iterator
        })
  }
}
