package graft.streaming

import graft.operators.{CommitLog, JoinView, Scd2}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming join-view maintenance: a fact stream lands in its commit-log
  * table and the materialized `facts ⋈ dimension` view is brought up to
  * date, per micro-batch, inside ONE `foreachBatch` — the streaming face
  * of [[graft.operators.JoinView]].
  *
  * Effectively-once falls out of composing two idempotent halves: the
  * append carries a `jv-intake-<batchId>` token (a replayed epoch's
  * append no-ops) and `refresh` is cursor-driven (a replayed refresh
  * finds the `jvsync` token at the same heads and no-ops; a crash BETWEEN
  * append and refresh is healed by the next epoch's refresh, which reads
  * whatever range the cursor still owes). The dimension side may be
  * written concurrently by any other process — refresh picks up both
  * sides' deltas, and its OCC CAS serializes racing maintainers.
  */
object ViewStream {

  /** Stream `facts` into `leftTable` and keep `viewTable` =
    * leftTable ⋈ rightTable maintained per micro-batch. */
  def joinViewIntake(facts: DataFrame, leftTable: String, rightTable: String,
                     viewTable: String, spec: JoinView.Spec,
                     idCol: String, checkpoint: String): StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        joinViewBatch(batch, batchId, leftTable, rightTable, viewTable,
          spec, idCol)
      }
      .start()

  /** One micro-batch of [[joinViewIntake]] (separable for direct testing
    * and foreachBatch reuse). */
  def joinViewBatch(batch: DataFrame, batchId: Long, leftTable: String,
                    rightTable: String, viewTable: String,
                    spec: JoinView.Spec, idCol: String): Unit = {
    if (!batch.isEmpty) {
      CommitLog.append(batch, leftTable, idCol = idCol, tsCol = spec.tsCol,
        token = Some(s"jv-intake-$batchId"))
      ()
    }
    // refresh even on an empty batch: it also heals a previous epoch that
    // crashed between its append and its refresh
    if (CommitLog.snapshot(rightTable).files.nonEmpty ||
        CommitLog.snapshot(leftTable).version > 0) {
      JoinView.refresh(batch.sparkSession, leftTable, rightTable, viewTable,
        spec)
      ()
    }
  }

  /** Maintain an SCD2 dimension history from a stream of observations
    * (`key, ts, attrs…`). Each micro-batch is one change-detected,
    * token-idempotent [[Scd2.applyBatch]]; an all-unchanged epoch writes
    * nothing. Callers ensure one observation per key per epoch (pre-agg
    * to the latest in the stream if needed). */
  def scd2Intake(observations: DataFrame, table: String, keyCol: String,
                 tsCol: String, checkpoint: String): StreamingQuery =
    observations.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          Scd2.applyBatch(batch.sparkSession, batch, table, keyCol, tsCol,
            token = Some(s"scd2-intake-$batchId"))
          ()
        }
      }
      .start()
}
