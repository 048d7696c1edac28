package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus intake: the curation funnel (`pretrain_pipeline`'s
  * front half) as a continuous pipeline, so documents can be cleaned
  * and deduplicated as they ARRIVE instead of in nightly batches.
  *
  *   raw document stream
  *     → content digest
  *     → `dropDuplicatesWithinWatermark(digest)` — streaming exact dedup
  *       with state the watermark EVICTS: the dedup window is explicit
  *       (duplicates arriving within `watermark` of each other collapse;
  *       an unbounded `dropDuplicates` would grow state forever — at
  *       corpus scale the ledger-based batch dedup
  *       ([[graft.operators.Dedup]] incremental form) handles history,
  *       this handles the stream)
  *     → quality gate + PII scrub (pure Column expressions, no state)
  *
  * Output is append-mode: one row per first-seen, quality-passing
  * document, ready for `writeStream.foreachBatch` into the corpus table.
  */
object CurationStream {

  def curate(docs: DataFrame, tsCol: String = "event_time",
             textCol: String = "text", watermark: String = "10 minutes",
             minQuality: Double = 0.5, minTokens: Int = 5): DataFrame =
    docs
      .withColumn("digest", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("digest")
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality &&
        TextFunctions.tokenCount(col(textCol)) >= minTokens)
      .withColumn(textCol, TextFunctions.piiScrub(col(textCol)))

  /** Streaming FUZZY dedup intake: drives
    * [[graft.operators.Dedup.incrementalMinhashBatch]] from foreachBatch so
    * near-duplicate VARIANTS (not just exact repeats — [[curate]]'s digest
    * window handles those) are filtered as they arrive, against everything
    * the stream has ever seen.
    *
    * Two [[graft.operators.CommitLog]] tables per intake:
    *   - `corpusTable` records EVERY document with its `kept` verdict —
    *     it is both the verification history (band candidates resolve
    *     their tokens here through a candidate-pruned semi join; dropped
    *     docs must stay resolvable, hence verdict rows rather than a
    *     kept-only table) and the auditable intake record. Consumers
    *     filter `kept`;
    *   - `ledgerTable` carries the content-free band keys.
    *
    * Both appends are token-idempotent on the micro-batch id. The two
    * commits are not atomic TOGETHER, but the crash window between them is
    * safe: a replay after "bands committed, corpus not" recomputes
    * identical verdicts — the band join excludes the batch's own ids from
    * the ledger side precisely so a half-committed replay cannot see
    * itself — then the bands append no-ops on its token and the corpus
    * append proceeds. Effectively-once, same contract as the attempt log.
    */
  def fuzzyIntake(docs: DataFrame, corpusTable: String, ledgerTable: String,
                  checkpoint: String, tsCol: String = "event_time",
                  idCol: String = "doc_id", textCol: String = "text",
                  threshold: Double = 0.8): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        fuzzyIntakeBatch(batch, batchId, corpusTable, ledgerTable,
          tsCol, idCol, textCol, threshold)
      }
      .start()

  /** One micro-batch of [[fuzzyIntake]] (separable for foreachBatch reuse
    * and direct testing). */
  def fuzzyIntakeBatch(batch: DataFrame, batchId: Long, corpusTable: String,
                       ledgerTable: String, tsCol: String, idCol: String,
                       textCol: String, threshold: Double): Unit = {
    import graft.operators.{CommitLog, Dedup}
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val history =
      if (CommitLog.snapshot(corpusTable).files.isEmpty)
        batch.select(col(idCol), col(textCol)).limit(0)
      else CommitLog.scan(spark, corpusTable).select(idCol, textCol)
    val verdicts = Dedup.incrementalMinhashBatch(
      batch, history, ledgerTable,
      new java.sql.Timestamp(System.currentTimeMillis()), threshold,
      token = Some(s"bands-$batchId"), idCol = idCol, textCol = textCol)
    CommitLog.append(verdicts, corpusTable, idCol = idCol, tsCol = tsCol,
      token = Some(s"corpus-$batchId"))
  }

  /** Streaming SEMANTIC dedup intake: the embedding-space sibling of
    * [[fuzzyIntake]], driving
    * [[graft.operators.Similarity.incrementalEmbeddingBatch]] from
    * foreachBatch — vectors arriving on a stream are filtered against
    * every vector the stream has ever seen via the hyperplane-bucket
    * ledger. Same two-table design and the same crash-window argument:
    * the ledger probe excludes the batch's own ids, so a replay after
    * "buckets committed, corpus not" recomputes identical verdicts and
    * both appends no-op on their tokens. */
  def embeddingIntake(vecs: DataFrame, corpusTable: String,
                      ledgerTable: String, checkpoint: String,
                      tsCol: String = "event_time", idCol: String = "vec_id",
                      vecCol: String = "embedding", threshold: Double = 0.9)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        embeddingIntakeBatch(batch, batchId, corpusTable, ledgerTable,
          tsCol, idCol, vecCol, threshold)
      }
      .start()

  /** One micro-batch of [[embeddingIntake]]. */
  def embeddingIntakeBatch(batch: DataFrame, batchId: Long,
                           corpusTable: String, ledgerTable: String,
                           tsCol: String, idCol: String, vecCol: String,
                           threshold: Double): Unit = {
    import graft.operators.{CommitLog, Similarity}
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val history =
      if (CommitLog.snapshot(corpusTable).files.isEmpty)
        batch.select(col(idCol), col(vecCol)).limit(0)
      else CommitLog.scan(spark, corpusTable).select(idCol, vecCol)
    val verdicts = Similarity.incrementalEmbeddingBatch(
      batch, history, ledgerTable,
      new java.sql.Timestamp(System.currentTimeMillis()), threshold,
      token = Some(s"buckets-$batchId"), idCol = idCol, vecCol = vecCol)
    CommitLog.append(verdicts, corpusTable, idCol = idCol, tsCol = tsCol,
      token = Some(s"corpus-$batchId"))
  }

  // -------------------------------------------------- trained scorer --

  /** TRAINED-classifier intake (r13 — VERDICT r12 task #6): score every
    * arriving document with [[graft.operators.QualityModel.scoreExpr]]
    * under frozen trained weights and keep/drop on the score sign —
    * the reference-shaped use of the gate-only `QualityModel`: the
    * distilled scorer runs IN the pipeline, not just in a gate.
    *
    * Each verdict row carries the quantized score `zq = floor(z·10⁶)`
    * (the engine-exact readout the AUC gate uses), the keep verdict, and
    * the TEACHER rule's verdict on the same row — so classifier-vs-
    * teacher parity is a query over the verdict table, not a separate
    * experiment. Appends are token-idempotent per micro-batch epoch
    * (same effectively-once contract as every other intake here). */
  def scoredIntake(docs: DataFrame, weights: Seq[Double],
                   verdictTable: String, checkpoint: String,
                   idCol: String = "doc_id")
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoredIntakeBatch(batch, batchId, weights, verdictTable, idCol)
      }
      .start()

  /** One micro-batch of [[scoredIntake]] (separable for foreachBatch
    * reuse, the `curation_scored_batch` gate, and direct testing). */
  def scoredIntakeBatch(batch: DataFrame, batchId: Long,
                        weights: Seq[Double], verdictTable: String,
                        idCol: String = "doc_id"): Unit = {
    import graft.operators.{CommitLog, QualityModel}
    // batch-grain commit: same execution scope as every ledger/rollup
    // append (AQE off, narrow digest-sized shuffles — the verdict rows
    // are ~40 B each); the session-width shuffle and adaptive re-planning
    // were pure per-commit overhead here (guide §2.4: remove exchanges
    // sized for data that isn't there)
    graft.core.Caching.narrowBatchScope(batch.sparkSession) {
      // plain if (no early return): a non-local return from a by-name
      // scope block rides NonLocalReturnControl through the scope's
      // try/finally — deprecated, Scala-3-hostile, and swallowed by any
      // future catch-all inside the scope helper
      if (!batch.isEmpty) {
        val feats = QualityModel.documentFeatures
        val scored = batch.select(
            col(idCol),
            lit(batchId).as("epoch"),
            floor(QualityModel.scoreExpr(feats, weights) * lit(1000000.0))
              .cast("long").as("zq"),
            QualityModel.documentQualityLabel.as("teacher"))
          .withColumn("kept", col("zq") >= 0L)
          .withColumn("scored_at", current_timestamp())
        CommitLog.append(scored, verdictTable, idCol = idCol,
          tsCol = "scored_at", token = Some(s"score-$batchId"))
      }
    }
    ()
  }

  /** Per-epoch accounting over the scored-verdict table: scored / kept /
    * dropped / teacher-agreement counts, ordered by epoch. */
  def scoredSeries(spark: org.apache.spark.sql.SparkSession,
                   verdictTable: String): DataFrame =
    graft.operators.CommitLog.scan(spark, verdictTable)
      .groupBy(col("epoch"))
      .agg(count(lit(1)).as("scored"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("dropped"),
        sum(when(col("kept") === col("teacher"), 1L).otherwise(0L))
          .as("teacher_agree"))
      .orderBy(col("epoch"))

  /** Epochs whose drop share exceeds `maxDropPct`, as operational ALERT
    * rows on the SAME opevents rails as delivery and data-quality alerts
    * ([[Opevents.toOperationalEvents]] → `alert.quality.constraint_failure`
    * events): a classifier suddenly rejecting half a batch is a page,
    * same as a failing constraint. `destination_id` carries the epoch
    * (the actionable unit), `failure_count` the dropped-row count. */
  def scoredAlerts(spark: org.apache.spark.sql.SparkSession,
                   verdictTable: String, maxDropPct: Int = 50)
      : org.apache.spark.sql.Dataset[Model.Alert] = {
    import spark.implicits._
    scoredSeries(spark, verdictTable)
      .filter(col("dropped") * 100L > col("scored") * maxDropPct)
      .select(
        lit("quality-classifier").as("tenant_id"),
        concat(lit("epoch-"), col("epoch")).as("destination_id"),
        lit("quality_failure").as("kind"),
        lit(maxDropPct).as("threshold_pct"),
        col("dropped").cast("int").as("failure_count"),
        current_timestamp().as("at"))
      .as[Model.Alert]
  }
}
