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
}
