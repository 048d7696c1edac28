package graft.operators

import java.nio.file.{Files, Paths}
import graft.functions.Buckets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental VIEW MAINTENANCE over the commit-log change feed: keep a
  * bucketed aggregate table (count + sum per time bucket × dimensions) in
  * sync with a fact table WITHOUT rescanning it — the consumer side of
  * [[CommitLog.changesBetween]], and the engine's answer to "refresh the
  * dashboard after tonight's ingest" at 100 TB.
  *
  * Refresh mechanics:
  *   1. the sync cursor is the latest `aggsync-<from>-<to>` commit TOKEN
  *      in the aggregate table's own log — progress lives in the log,
  *      atomic with the merge commit it describes (no side file, no
  *      double-apply crash window: a replayed refresh hits the token and
  *      no-ops);
  *   2. deltas = change feed (cursor, factHead]: inserts count +1/+value,
  *      retention deletes count −1/−value — one aggregate over changed
  *      rows only;
  *   3. merge touches ONLY months containing changed buckets: current agg
  *      rows for those months union the deltas, re-aggregate, zero-count
  *      groups drop out, and the result commits as a replace of exactly
  *      those months' files. A year-old month's aggregate file is never
  *      rewritten, read, or even listed.
  *
  * Compaction entries in the fact log contribute no deltas (the feed is
  * silent for them) but still advance the cursor with a data-less commit,
  * so repeated refreshes never rescan them.
  */
object IncrementalAgg {

  /** What to maintain: count(*) and sum(valueCol) per
    * (bucket(tsCol, granularity), dims...). Use an integer-scaled value
    * column (e.g. cents) when exact cross-engine sums matter — the
    * determinism note in `queries/Relational.scala` applies to any
    * float sum. */
  final case class Spec(tsCol: String, valueCol: String,
                        dims: Seq[String], granularity: String = "1d")

  private val SyncPrefix = "aggsync-"

  /** Fact-table version the aggregate has applied (0 = nothing yet). */
  def syncedVersion(aggTable: String): Long =
    CommitLog.latestToken(aggTable, SyncPrefix)
      .map(_.stripPrefix(SyncPrefix).split("-").last.toLong)
      .getOrElse(0L)

  /** The maintained aggregate: (bucket_ts, dims..., count, sum_value). */
  def readAgg(spark: SparkSession, aggTable: String): DataFrame =
    CommitLog.scan(spark, aggTable)

  /** Apply fact changes (syncedVersion, factHead] to the aggregate table.
    * Returns the new synced version. Idempotent: a crashed-and-replayed
    * refresh no-ops on its token. */
  def refresh(spark: SparkSession, factTable: String, aggTable: String,
              spec: Spec): Long = {
    val head = CommitLog.snapshot(factTable).version
    val from = syncedVersion(aggTable)
    if (head <= from) return from
    val token = s"$SyncPrefix$from-$head"
    val g = Buckets.Granularity.parse(spec.granularity)

    CommitLog.changesBetweenIfAny(spark, factTable, from, head) match {
      case None =>
        // compactions only: advance the cursor with a data-less commit
        try CommitLog.commit(aggTable, "append", Nil, token = Some(token))
        catch { case _: CommitLog.AlreadyApplied => () }
        head
      case Some(feed) =>
        val sign = when(col("_change_type") === "insert", lit(1L))
          .otherwise(lit(-1L))
        val keys = col("bucket_ts") +: spec.dims.map(col)
        val deltas = feed
          .withColumn("bucket_ts", Buckets.bucketExpr(col(spec.tsCol), g))
          .groupBy(keys: _*)
          .agg(sum(sign).as("count"),
            sum(sign * col(spec.valueCol)).as("sum_value"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val monthOf = date_format(Buckets.utcFields(col("bucket_ts")), "yyyy-MM")
        val months = deltas.select(monthOf.as("m")).distinct()
          .collect().map(_.getString(0)).toSet

        val oldFiles = CommitLog.snapshot(aggTable).files
          .filter(f => months.contains(f.month))
        val current =
          if (oldFiles.isEmpty) deltas.limit(0)
          else spark.read
            .option("basePath", Paths.get(aggTable, "data").toString)
            .parquet(oldFiles.map(f => Paths.get(aggTable).resolve(f.path).toString): _*)
            .select(deltas.columns.map(col): _*)
        val merged = current.unionByName(deltas)
          .groupBy(keys: _*)
          .agg(sum(col("count")).as("count"), sum(col("sum_value")).as("sum_value"))
          .filter(col("count") =!= 0)

        val staging = Files.createTempDirectory(
          { Files.createDirectories(Paths.get(aggTable)); Paths.get(aggTable) },
          ".stage-")
        merged.withColumn("month", monthOf)
          .repartition(col("month"))
          .sortWithinPartitions(col("bucket_ts"))
          .write.mode("overwrite").partitionBy("month").parquet(staging.toString)
        deltas.unpersist()
        val adds = CommitLog.moveStaged(staging, aggTable)
        try CommitLog.commit(aggTable, "compact", adds,
          removes = oldFiles.map(_.path), token = Some(token))
        catch {
          case _: CommitLog.AlreadyApplied => // replayed refresh: discard
            adds.foreach(a =>
              Files.deleteIfExists(Paths.get(aggTable).resolve(a.path)))
        }
        head
    }
  }
}
