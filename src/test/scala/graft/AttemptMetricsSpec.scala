package graft

import java.sql.Timestamp
import java.time.Instant
import graft.functions.Buckets.Granularity
import graft.operators.Metrics
import graft.streaming.Pipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Port of the reference's metrics-data-correctness shape
  * (`internal/logstore/drivertest/metrics_data_correctness.go`): a
  * deterministic hand-computed attempts dataset driven through the full
  * measure matrix. */
class AttemptMetricsSpec extends GraftSuite {

  private def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)

  // hour 0: a1 ok(first), a2 fail(first), a3 fail(retry#2), a4 ok(manual#3)
  // hour 1: a5 fail(first)
  // hour 2: empty (dense fill must emit zeros)
  private def attempts = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("a1", "success", false, 1, ts(5)),
      ("a2", "failed", false, 1, ts(15)),
      ("a3", "failed", false, 2, ts(25)),
      ("a4", "success", true, 3, ts(35)),
      ("a5", "failed", false, 1, ts(75)))
      .toDF("attempt_id", "status", "manual", "attempt_number", "ts")
  }

  test("full attempt measure matrix over a deterministic dataset") {
    val req = Metrics.Request(
      Instant.parse("2024-01-01T00:00:00Z"), Instant.parse("2024-01-01T03:00:00Z"),
      Granularity.parse("1h"),
      measures = Seq("count", "successful_count", "failed_count", "error_rate",
        "first_attempt_count", "retry_count", "manual_retry_count",
        "avg_attempt_number", "rate", "failed_rate"))
    val rows = Metrics.query(spark, attempts, req, Metrics.attemptMeasures).df
      .collect()
    assert(rows.length == 3)
    def row(i: Int) = rows(i)
    // hour 0
    assert(row(0).getAs[Long]("count") == 4)
    assert(row(0).getAs[Long]("successful_count") == 2)
    assert(row(0).getAs[Long]("failed_count") == 2)
    assert(row(0).getAs[Double]("error_rate") == 0.5)
    assert(row(0).getAs[Long]("first_attempt_count") == 2) // a1, a2
    assert(row(0).getAs[Long]("retry_count") == 2)         // a3, a4
    assert(row(0).getAs[Long]("manual_retry_count") == 1)  // a4
    assert(row(0).getAs[Double]("avg_attempt_number") == 7.0 / 4)
    assert(row(0).getAs[Double]("rate") == 4.0 / 3600)
    assert(row(0).getAs[Double]("failed_rate") == 2.0 / 3600)
    // hour 1
    assert(row(1).getAs[Long]("count") == 1)
    assert(row(1).getAs[Double]("error_rate") == 1.0)
    // hour 2: dense-filled zeros
    assert(row(2).getAs[Long]("count") == 0)
    assert(row(2).getAs[Double]("error_rate") == 0.0)
    assert(row(2).getAs[Double]("rate") == 0.0)
  }

  test("publish-side streaming dedup (T2): duplicate event ids collapse") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "event_time", "data")
    val deduped = Pipeline.dedupPublishes(events, "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(("e1", ts(0), "a"), ("e1", ts(1), "a-dup"), ("e2", ts(2), "b"))
      q.processAllAvailable()
      mem.addData(("e1", ts(3), "a-redelivery"), ("e3", ts(4), "c"))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_out").collect().map(_.getString(0)).sorted
      assert(ids.toSeq == Seq("e1", "e2", "e3"))
    } finally q.stop()
  }
}
