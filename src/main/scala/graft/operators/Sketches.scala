package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental DISTINCT-COUNT rollups as mergeable HLL sketch columns on
  * the commit log — the warehouse "sketch table" pattern (Snowflake /
  * BigQuery HLL rollups, Druid datasketches) on an open ledger.
  *
  * Why sketches and not `countDistinct`: an EXACT distinct over a growing
  * fact store is not incrementally maintainable — every refresh re-shuffles
  * all history on the distinct key (at 100 TB, the whole corpus, every
  * time). An HLL sketch is an associative, commutative, idempotent-union
  * summary: the rollup table holds one ~2^lgK-byte sketch per group, a new
  * batch costs O(batch + touched groups), and any coarser grain — distinct
  * users per quarter, per year, global — is a sketch UNION over the stored
  * rows, with NO pass over facts. Spark ships the Apache DataSketches HLL
  * family natively (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`, codegen'd TypedImperativeAggregates), so the
  * whole operator is a declarative plan; relative error is the standard
  * HLL bound (~1.04/√2^lgK ≈ 0.8 % at the default lgK=14).
  *
  * Table schema: group columns + (sketch BINARY, n_rows LONG — exact
  * row accounting maintained alongside the sketch, updated_at, rollup_id).
  * State updates ride [[CommitLog.upsertBatch]]: only files containing
  * touched groups rewrite, and an idempotency token makes replayed
  * batches no-ops (the same effectively-once contract as the ledgers).
  */
object Sketches {

  /** Fold one fact batch into the rollup table: sketch the batch per
    * group, UNION with the stored sketches of the touched groups only
    * (broadcast semi join — untouched groups are never read twice, let
    * alone rewritten), and upsert the merged rows in one token-idempotent
    * commit.
    *
    * @param groupCols rollup grain (e.g. month, event_type)
    * @param valueCol  the distinct-counted key (int/long/string/binary)
    */
  def updateDistinctRollup(batch: DataFrame, table: String,
                           groupCols: Seq[String], valueCol: String,
                           at: java.sql.Timestamp, lgK: Int = 14,
                           token: Option[String] = None): Unit = {
    // `month` is the commit log's partition column (derived from
    // updated_at) and resurfaces on every scan — a group column with a
    // reserved name would be silently shadowed by it
    val reserved = Set("month", "rollup_id", "updated_at", "sketch", "n_rows")
    require(groupCols.forall(c => !reserved.contains(c)),
      s"group columns may not use reserved names ${reserved.mkString(", ")}")
    val spark = batch.sparkSession
    graft.core.Caching.narrowBatchScope(spark) {
      val gcols = groupCols.map(col)
      val bs = batch.groupBy(gcols: _*)
        .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"),
          count(col(valueCol)).as("n_rows"))
      val snap = CommitLog.snapshot(table)
      val all =
        if (snap.files.isEmpty) bs
        else CommitLog.scan(spark, table)
          .select(gcols :+ col("sketch") :+ col("n_rows"): _*)
          // touched groups only: the rollup table streams through a
          // broadcast semi join on the batch's (small) group set
          .join(broadcast(bs.select(gcols: _*)), groupCols, "left_semi")
          .unionByName(bs)
      val merged = all.groupBy(gcols: _*)
        .agg(expr("hll_union_agg(sketch, true)").as("sketch"),
          sum(col("n_rows")).as("n_rows"))
        .withColumn("rollup_id", concat_ws("", gcols: _*))
        .withColumn("updated_at", lit(at))
      CommitLog.upsertBatch(merged, table,
        idCol = "rollup_id", tsCol = "updated_at", token = token)
      ()
    }
  }

  /** Rollup state at its stored grain: group columns + exact `n_rows` +
    * `distinct_est` from the sketch. */
  def estimates(spark: SparkSession, table: String,
                groupCols: Seq[String]): DataFrame =
    CommitLog.scan(spark, table).select(
      groupCols.map(col) :+ col("n_rows") :+
        expr("hll_sketch_estimate(sketch)").as("distinct_est"): _*)

  /** Re-aggregate to a COARSER grain with a sketch union — the operation
    * exact distinct counts cannot do without re-reading facts: distinct
    * over any subset of group columns, straight from the state table.
    * `overCols` empty → one global row. */
  def estimateAcross(spark: SparkSession, table: String,
                     overCols: Seq[String]): DataFrame = {
    val base = CommitLog.scan(spark, table)
    val agg = Seq(expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
        .as("distinct_est"),
      sum(col("n_rows")).as("n_rows"))
    if (overCols.isEmpty) base.agg(agg.head, agg.tail: _*)
    else base.groupBy(overCols.map(col): _*).agg(agg.head, agg.tail: _*)
  }
}
