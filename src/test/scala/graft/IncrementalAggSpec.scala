package graft

import graft.operators.{CommitLog, IncrementalAgg}
import org.apache.spark.sql.functions._

/** Incremental view maintenance: correctness against recompute at every
  * step, month-pruned rewrites, delete application, replay idempotency. */
class IncrementalAggSpec extends GraftSuite {

  private def batch(ids: Range, month: String, etype: String) = {
    val spark2 = spark
    import spark2.implicits._
    ids.map(i => (s"e$i",
        java.sql.Timestamp.valueOf(s"$month-${10 + i % 3} 08:00:00"),
        etype, (i % 7 + 1).toLong))
      .toDF("event_id", "ts", "event_type", "cents")
  }

  private def aggRows(agg: String): Set[(Long, String, Long, Long)] =
    IncrementalAgg.readAgg(spark, agg)
      .select(unix_millis(col("bucket_ts")), col("event_type"),
        col("count"), col("sum_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def recompute(fact: String): Set[(Long, String, Long, Long)] =
    CommitLog.scan(spark, fact)
      .groupBy(date_trunc("DAY", col("ts")).as("b"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1),
        r.getLong(2), r.getLong(3)))
      .toSet

  test("refresh equals recompute at every step; only changed months rewrite; deletes decrement") {
    val base = java.nio.file.Files.createTempDirectory("graft_iagg_spec")
    val (fact, agg) = (s"$base/fact", s"$base/agg")
    val spec = IncrementalAgg.Spec("ts", "cents", Seq("event_type"), "1d")

    CommitLog.append(batch(0 until 40, "2024-01", "click"), fact, "event_id", "ts")
    CommitLog.append(batch(100 until 130, "2024-02", "view"), fact, "event_id", "ts")
    val v1 = IncrementalAgg.refresh(spark, fact, agg, spec)
    assert(v1 == 2 && IncrementalAgg.syncedVersion(agg) == 2)
    assert(aggRows(agg) == recompute(fact))

    // only February changes: January's aggregate file must not be touched
    val janFilesBefore = CommitLog.snapshot(agg).files
      .filter(_.month == "2024-01").map(_.path).toSet
    CommitLog.append(batch(200 until 220, "2024-02", "view"), fact, "event_id", "ts")
    IncrementalAgg.refresh(spark, fact, agg, spec)
    val janFilesAfter = CommitLog.snapshot(agg).files
      .filter(_.month == "2024-01").map(_.path).toSet
    assert(janFilesBefore == janFilesAfter,
      "an unchanged month's aggregate file was rewritten")
    assert(aggRows(agg) == recompute(fact))

    // a no-logical-change range (compaction) advances the cursor only
    CommitLog.compactMonth(spark, fact, "2024-02", "event_id", "ts")
    val vAfterCompact = IncrementalAgg.refresh(spark, fact, agg, spec)
    assert(vAfterCompact == CommitLog.snapshot(fact).version)
    assert(aggRows(agg) == recompute(fact))

    // retention: January disappears from the fact table; the refresh
    // DECREMENTS it out of the aggregate
    CommitLog.dropMonthsBefore(fact, keepFromMonth = "2024-02")
    IncrementalAgg.refresh(spark, fact, agg, spec)
    assert(aggRows(agg) == recompute(fact))
    assert(aggRows(agg).forall(_._2 == "view"), "January (click) must be gone")

    // replayed refresh is a no-op (cursor current, token protection)
    val before = aggRows(agg)
    IncrementalAgg.refresh(spark, fact, agg, spec)
    assert(aggRows(agg) == before)

    // row-level erasure (deleteWhere) reaches the aggregate through the
    // feed's delete+reinsert representation
    assert(CommitLog.deleteWhere(spark, fact, col("cents") >= 5,
      "event_id", "ts") > 0)
    IncrementalAgg.refresh(spark, fact, agg, spec)
    assert(aggRows(agg) == recompute(fact))
  }
}
