package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.streaming.StreamingQuery

/** Bounded restart-from-checkpoint recovery for long-running stateful
  * queries (VERDICT r13 task #2).
  *
  * ==The failure this recovers==
  * A micro-batch task thread that receives an INTERRUPT while an
  * `HDFSBackedStateStore` commit is mid-write surfaces as a
  * `CANNOT_COMMIT` query failure (the store refuses to publish a delta it
  * cannot prove complete — correct behavior). In a multi-query JVM,
  * interrupts reach healthy micro-batch threads from the outside: a
  * sibling query failing or stopping cancels shared job groups, and
  * local-mode task threads are pooled across queries. The r13 soak hit
  * this once in four 300 s runs; its drain DEADLINE (commit 28e3825) made
  * the wedge loud but did nothing about frequency.
  *
  * ==Why restart is the correct recovery==
  * The interrupted batch never committed: its offsets are in the offset
  * log but not the commit log, and the state store version it was
  * building was never published. Restarting the query from the SAME
  * checkpoint replays exactly that batch against exactly the pre-batch
  * state version — the recovery semantics the checkpoint protocol
  * exists to provide. It is sound only when every sink the query drives
  * is idempotent per batch (token-idempotent CommitLog appends, or
  * last-write-wins keyed by batchId); all soak sinks are, by
  * construction.
  *
  * ==Budget==
  * Restarts share one counter across the cooperating queries: recovery
  * hides TRANSIENT interrupts, and a query that keeps failing must
  * surface, not loop — a second consecutive failure of the same drain
  * throws regardless of remaining budget.
  */
object Recovery {

  /** One bounded drain attempt: `processAllAvailable` raced against a
    * deadline (a wedged stream must fail loudly, not hang the caller).
    * None = drained clean; Some(reason) = failed or exceeded. */
  def drainOnce(q: StreamingQuery, name: String, timeoutMs: Long): Option[String] = {
    val t = new Thread(() => try q.processAllAvailable() catch {
      case _: Throwable => () // surfaced via q.exception below
    })
    t.setDaemon(true); t.start(); t.join(timeoutMs)
    q.exception.map(e => s"$name stream failed: ${e.getMessage}")
      .orElse(if (t.isAlive) Some(s"$name drain exceeded ${timeoutMs}ms") else None)
  }

  /** A streaming query handle that survives one failure per drain by
    * rebuilding itself from its own checkpoint. `build` must start the
    * query with the SAME checkpoint location every time.
    *
    * @param budget shared restart allowance across cooperating queries */
  final class Restartable(val name: String, build: () => StreamingQuery,
                          budget: AtomicInteger) {
    @volatile private var q: StreamingQuery = build()

    def query: StreamingQuery = q

    /** Drain with a deadline; on failure, restart from the checkpoint and
      * drain again. A failure of the restarted query — or an exhausted
      * shared budget — throws. */
    def drain(timeoutMs: Long = 180000L): Unit =
      drainOnce(q, name, timeoutMs).foreach { why =>
        if (budget.decrementAndGet() < 0)
          throw new IllegalStateException(s"restart budget exhausted; last failure: $why")
        stop()
        q = build()
        drainOnce(q, name, timeoutMs).foreach(again =>
          throw new IllegalStateException(
            s"$name failed again after a checkpoint restart: $again (first: $why)"))
      }

    /** Best-effort stop (a wedged query's stop() can itself time out —
      * callers set `spark.sql.streaming.stopTimeout` so it cannot park
      * forever). */
    def stop(): Unit = try q.stop() catch { case _: Throwable => () }
  }
}
