package graft.streaming

import graft.operators.Sketches
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sketch-rollup maintenance: the [[graft.operators.Sketches]]
  * state tables fed per micro-batch from `foreachBatch` — live
  * distinct-count and latency/value-quantile observability over an event
  * stream, with state that stays O(groups) no matter how long the stream
  * runs (the stateful-aggregation alternative — a streaming
  * `approx_count_distinct`/percentile over unbounded keys — keeps raw
  * state in the state store and cannot be queried mid-stream by other
  * sessions; a commit-log rollup table can).
  *
  * Each micro-batch is one token-idempotent upsert (`rollup-<batchId>`),
  * so a replayed epoch after crash recovery is a no-op — the same
  * effectively-once contract as the curation intakes and the attempt
  * log. Readouts are the batch-side [[Sketches.estimates]] /
  * [[Sketches.quantiles]] / the `...Across` merges, against the SAME
  * table the stream maintains.
  */
object SketchStream {

  /** The shared intake shape: one foreachBatch stream whose every epoch
    * is a token-idempotent rollup update (empty epochs skip; a replayed
    * epoch no-ops on its token inside the update itself). The three
    * rollup families differ ONLY in the batch update they apply. */
  private def intake(facts: DataFrame, checkpoint: String)
                    (batchFn: (DataFrame, Long) => Unit): StreamingQuery =
    facts.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) => batchFn(batch, batchId) }
      .start()

  /** Maintain an HLL distinct-count rollup from a stream. */
  def distinctRollupIntake(facts: DataFrame, table: String,
                           groupCols: Seq[String], valueCol: String,
                           checkpoint: String): StreamingQuery =
    intake(facts, checkpoint)(distinctRollupBatch(_, _, table, groupCols, valueCol))

  /** One micro-batch of [[distinctRollupIntake]] (separable for direct
    * testing and foreachBatch reuse). */
  def distinctRollupBatch(batch: DataFrame, batchId: Long, table: String,
                          groupCols: Seq[String], valueCol: String): Unit = {
    if (batch.isEmpty) return
    Sketches.updateDistinctRollup(batch, table, groupCols, valueCol,
      new java.sql.Timestamp(System.currentTimeMillis()),
      token = Some(s"rollup-$batchId"))
  }

  /** Maintain a GK quantile rollup from a stream. */
  def quantileRollupIntake(facts: DataFrame, table: String,
                           groupCols: Seq[String], valueCol: String,
                           checkpoint: String): StreamingQuery =
    intake(facts, checkpoint)(quantileRollupBatch(_, _, table, groupCols, valueCol))

  /** One micro-batch of [[quantileRollupIntake]]. */
  def quantileRollupBatch(batch: DataFrame, batchId: Long, table: String,
                          groupCols: Seq[String], valueCol: String): Unit = {
    if (batch.isEmpty) return
    Sketches.updateQuantileRollup(batch, table, groupCols, valueCol,
      new java.sql.Timestamp(System.currentTimeMillis()),
      token = Some(s"rollup-$batchId"))
  }

  /** Maintain a Misra–Gries heavy-hitter rollup from a stream — the live
    * dominant-token/boilerplate detector; completes the streaming story
    * for the sketch family (distinct, quantile, top-k all intake-fed). */
  def topKRollupIntake(facts: DataFrame, table: String,
                       groupCols: Seq[String], itemCol: String,
                       checkpoint: String, k: Int = 64): StreamingQuery =
    intake(facts, checkpoint)(topKRollupBatch(_, _, table, groupCols, itemCol, k))

  /** One micro-batch of [[topKRollupIntake]]. */
  def topKRollupBatch(batch: DataFrame, batchId: Long, table: String,
                      groupCols: Seq[String], itemCol: String,
                      k: Int = 64): Unit = {
    if (batch.isEmpty) return
    Sketches.updateTopKRollup(batch, table, groupCols, itemCol,
      new java.sql.Timestamp(System.currentTimeMillis()), k = k,
      token = Some(s"rollup-$batchId"))
  }
}
