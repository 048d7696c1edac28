package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING DIMENSION (type 2) maintenance over the commit log:
  * a dimension-history table where every attribute change opens a new
  * version row (`valid_from`, `valid_to`, `is_current`) and closes the
  * prior one — the warehouse-standard way to keep a join-able history of
  * a mutable dimension (the reference's destination registry is exactly
  * such a dimension; its store keeps only the latest row, this keeps them
  * all and makes any as-of enrichment a range predicate).
  *
  * Batch application is ONE [[CommitLog.upsertBatch]] commit:
  *   - change detection compares an md5 attr-hash (stored on every row,
  *     so later batches never recompute history hashes) — unchanged keys
  *     write NOTHING;
  *   - changed/new keys contribute an opened version (`valid_to` null,
  *     current) and, for changed keys, the prior version re-written
  *     closed (`valid_to` = batch ts, not current) — same surrogate id
  *     `key@valid_from`, so the upsert replaces it in place.
  *
  * 100 TB shape: the current-version probe is a broadcast semi join of
  * the batch's keys onto the history scan (history streams, batch
  * broadcasts), and upsertBatch rewrites only files holding touched rows.
  * Unchanged keys and closed history months are never rewritten. Batches
  * are token-idempotent like every other log consumer.
  *
  * Contract: one observation per key per batch (callers pre-dedupe to
  * the latest); batch timestamps advance monotonically per key.
  */
object Scd2 {

  private def surrogate(keyCol: String) =
    concat_ws("@", col(keyCol), unix_micros(col("valid_from")))

  /** The full version history (all columns, including bookkeeping). */
  def readHistory(spark: SparkSession, table: String): DataFrame =
    CommitLog.scan(spark, table)

  /** ON-DISK FORMAT BREAK (one-shot repair, mirrors
    * [[Sketches.migrateRollupIds]]): the change hash `_h` format moved to
    * sorted attribute order + ignoreNullFields=false. `_h` is persisted on
    * every history row and compared against new-format batch hashes, so a
    * pre-upgrade table whose attributes weren't already sorted (or which
    * has null attributes) would see every key as "changed" on its first
    * post-upgrade batch — spurious version rows, falsely closed currents.
    * `_h` is a pure function of the stored attribute columns, so this
    * recomputes it in place: one scan tags stale rows, and only files
    * holding one are rewritten (upsertBatch file-targeting); clean tables
    * return 0 without writing. Run once per pre-upgrade table, before the
    * first new-format [[applyBatch]]. Returns the number of rows repaired. */
  def migrateHashes(spark: SparkSession, table: String, keyCol: String): Long = {
    val snap = CommitLog.snapshot(table)
    if (snap.files.isEmpty) return 0L
    val hist = readHistory(spark, table)
    val book = Set("_h", "_vid", "valid_from", "valid_to", "is_current", "month")
    val attrCols = hist.columns
      .filterNot(c => book.contains(c) || c == keyCol).toSeq.sorted
    val recomputed = hist.withColumn("_h_new",
      md5(to_json(struct(attrCols.map(col): _*),
        Map("ignoreNullFields" -> "false"))))
    val stale = recomputed.filter(!(col("_h") <=> col("_h_new")))
      .withColumn("_h", col("_h_new")).drop("_h_new", "month")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = stale.count()
      if (n == 0L) return 0L
      CommitLog.upsertBatch(stale, table, idCol = "_vid", tsCol = "valid_from",
        token = Some(s"scd2-hash-migrate-${snap.version}"))
      n
    } finally { stale.unpersist(); () }
  }

  /** Apply one batch of `(key, ts, attrs…)` observations. Returns the
    * committed version of the history table. */
  def applyBatch(spark: SparkSession, batch: DataFrame, table: String,
                 keyCol: String, tsCol: String,
                 token: Option[String] = None): Long = {
    // The change hash must be stable across batches that present the same
    // attributes in a DIFFERENT column order, and must keep nulls (to_json
    // drops null fields by default, which would alias {a:null,b:1} with
    // {b:1}) — sort the struct fields and pin ignoreNullFields=false, same
    // as Sketches.updateRollup's rollup_id.
    val attrCols = batch.columns.filterNot(c => c == keyCol || c == tsCol)
      .toSeq.sorted
    val b = batch
      .withColumn("_h", md5(to_json(struct(attrCols.map(col): _*),
        Map("ignoreNullFields" -> "false"))))
      .select(Seq(col(keyCol), col(tsCol).as("_ts"), col("_h")) ++
        attrCols.map(col): _*)

    val empty = CommitLog.snapshot(table).files.isEmpty
    // current versions of only the touched keys: batch keys broadcast,
    // history streams through the semi join
    val current =
      if (empty) None
      else Some(CommitLog.scan(spark, table)
        .filter(col("is_current"))
        .join(broadcast(b.select(col(keyCol))), Seq(keyCol), "left_semi"))

    val opened0 = b
      .withColumn("valid_from", col("_ts"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
      .drop("_ts")
    val (opened, closed) = current match {
      case None => (opened0, None)
      case Some(cur) =>
        val curKeyed = cur.select(col(keyCol), col("_h").as("_cur_h"),
          col("valid_from").as("_cur_from"))
        val joined = opened0.join(broadcast(curKeyed), Seq(keyCol), "left")
        // unchanged keys drop out entirely — no version, no rewrite
        val op = joined
          .filter(col("_cur_h").isNull || col("_cur_h") =!= col("_h"))
          .drop("_cur_h", "_cur_from")
        // prior versions of changed keys, re-written closed at the batch ts
        val cl = cur.join(
            broadcast(op.select(col(keyCol), col("valid_from").as("_new_from"))),
            Seq(keyCol))
          .withColumn("valid_to", col("_new_from"))
          .withColumn("is_current", lit(false))
          .drop("_new_from")
        (op, Some(cl))
    }
    val upsert = closed.fold(opened)(cl => opened.unionByName(
        cl.select(opened.columns.map(col): _*)))
      .withColumn("_vid", surrogate(keyCol))
    // an all-unchanged batch writes NOTHING — not even a version bump
    // (the emptiness probe is one action over a batch-sized frame)
    if (upsert.isEmpty) CommitLog.snapshot(table).version
    else CommitLog.upsertBatch(upsert, table,
      idCol = "_vid", tsCol = "valid_from", token = token)
  }
}
