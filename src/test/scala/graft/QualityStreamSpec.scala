package graft

import graft.streaming.QualityStream
import graft.operators.Quality._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming quality monitor: per-epoch verdict rows with exact
  * violation counts, replay idempotency, empty-epoch suppression, and
  * the series / failing-epochs readouts. */
class QualityStreamSpec extends GraftSuite {

  test("per-epoch verdicts: planted defects count exactly; replays " +
      "no-op; empty epochs write nothing; readouts aggregate") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    val base = java.nio.file.Files
      .createTempDirectory("graft_dqstream").toString
    val table = s"$base/verdicts"
    val suite = Seq(
      NotNull("id.not_null", "id"),
      FailsWhen("amount.positive", col("amount") <= 0.0),
      MaxPerGroup("acct.cap2", Seq("account"), 2L))

    val in = MemoryStream[(Option[Long], String, Double)]
    val stream = in.toDF().toDF("id", "account", "amount")
    val q = QualityStream.monitor(stream, suite, table, s"$base/ckpt")
    try {
      // epoch 0: clean
      in.addData((Some(1L), "a1", 5.0), (Some(2L), "a2", 6.0))
      q.processAllAvailable()
      // epoch 1: one null id, one negative amount, a1 oversized (3 rows)
      in.addData((Some(3L), "a1", 1.0), (Some(4L), "a1", -2.0),
        (Some(5L), "a1", 3.0), (Option.empty[Long], "a2", 1.0))
      q.processAllAvailable()
    } finally q.stop()

    val all = graft.operators.CommitLog.scan(spark, table)
      .select("epoch", "check_name", "violations", "passed", "rows_checked")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getInt(3), r.getLong(4))).toMap
    assert(all.size == 6, s"expected 2 epochs x 3 checks, got ${all.keySet}")
    assert(all((0L, "id.not_null")) == ((0L, 1, 2L)))
    assert(all((0L, "amount.positive")) == ((0L, 1, 2L)))
    assert(all((0L, "acct.cap2")) == ((0L, 1, 2L)))
    assert(all((1L, "id.not_null")) == ((1L, 0, 4L)))
    assert(all((1L, "amount.positive")) == ((1L, 0, 4L)))
    assert(all((1L, "acct.cap2")) == ((1L, 0, 4L)))

    // replayed epoch: same token → no-op, still 6 verdict rows
    val replayBatch = Seq((Some(9L), "a9", 1.0)).toDF("id", "account", "amount")
    QualityStream.monitorBatch(replayBatch, 1L, suite, table)
    assert(graft.operators.CommitLog.scan(spark, table).count() == 6)

    // empty epoch writes nothing (no epoch-2 rows, no version bump)
    val v = graft.operators.CommitLog.snapshot(table).version
    QualityStream.monitorBatch(replayBatch.limit(0), 2L, suite, table)
    assert(graft.operators.CommitLog.snapshot(table).version == v)

    // series readout for one constraint
    val series = QualityStream.series(spark, table, "amount.positive")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(series.toSeq == Seq((0L, 0L, 1), (1L, 1L, 0)))

    // failing-epochs readout: only epoch 1, with its three failing checks
    val failing = QualityStream.failingEpochs(spark, table).collect()
    assert(failing.length == 1)
    assert(failing.head.getLong(0) == 1L)
    assert(failing.head.getSeq[String](1) ==
      Seq("acct.cap2", "amount.positive", "id.not_null"))
    assert(failing.head.getLong(2) == 3L)

    // failing verdicts as operational alerts on the opevents rails:
    // one alert per failing (epoch, constraint), check name as the
    // actionable unit, violation count carried through — and
    // toOperationalEvents maps them onto the quality alert topic with
    // the verdict data in the payload
    val alerts = QualityStream.alerts(spark, table, monitor = "m1")
    val arows = alerts.collect()
      .map(a => (a.tenant_id, a.destination_id, a.kind, a.failure_count))
    assert(arows.toSet == Set(
      ("m1", "id.not_null", "quality_failure", 1),
      ("m1", "amount.positive", "quality_failure", 1),
      ("m1", "acct.cap2", "quality_failure", 1)), arows.toSeq)
    val ops = graft.streaming.Opevents.toOperationalEvents(alerts)
      .collect().map(r => (r.getAs[String]("topic"),
        r.getAs[String]("tenant_id"), r.getAs[String]("data")))
    assert(ops.length == 3)
    assert(ops.forall(_._1 == "alert.quality.constraint_failure"), ops.toSeq)
    assert(ops.forall(_._2 == "m1"))
    val cap = ops.find(_._3.contains("acct.cap2")).get
    val data = graft.functions.JsonMatch.parse(cap._3)
    assert(data.get("destination_id").asText == "acct.cap2")
    assert(data.get("failure_count").asInt == 1)
  }
}
