package graft

import graft.streaming.{Runner, Sinks}
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stop/start-from-checkpoint durability: the delivery query resumes from
  * its real checkpoint (same source, no reprocessing), and the alert
  * consumer — whose memory sink cannot recover a checkpoint by design —
  * rebuilds its cumulative per-destination state by replaying the log
  * directory, exactly as a redeployed alert service would. */
class RunnerRestartSpec extends GraftSuite {

  test("pipeline restart: exactly-once log accounting and cumulative alert state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val destinations = Seq(
      Destination("d_ok", "t1", "mock", Seq("*"), None, disabled = false),
      Destination("d_down", "t1", "mock", Seq("order.*"), None, disabled = false)).toDS()
    def registry = new Sinks.Registry(Seq(
      Sinks.MockSink("mock", failDestinations = Set("d_down"))))
    // disable on the 3rd consecutive failure — the 2 pre-restart failures
    // must survive the restart for the post-restart failure to trip it
    val cfg = graft.streaming.Alerts.Config(autoDisableCount = 3, thresholds = Seq(100))
    val raw = MemoryStream[String]
    def ev(i: Int) =
      s"""{"event_id":"e$i","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:0$i.000Z","data":{"n":$i}}"""

    // ---- phase 1: two events, then a clean stop -----------------------
    val run1 = Runner.start(spark, raw.toDF(), destinations, registry,
      logPath = s"$tmp/log", alertSinkName = "restart_alerts",
      checkpointRoot = s"$tmp/ckpt", alertCfg = cfg)
    try {
      raw.addData(ev(1), ev(2))
      run1.processAllAvailable()
      assert(spark.read.parquet(s"$tmp/log").count() == 4) // 2 events × 2 dests
      assert(spark.sql("SELECT * FROM restart_alerts").count() == 0)
    } finally run1.stopAll()

    // the memory sink cannot recover its checkpoint (Spark refuses) — a
    // redeployed alert consumer starts fresh and REPLAYS the log dir,
    // which is the Runner's documented restart semantics for q2/q3
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala.foreach(rmrf)
      java.nio.file.Files.deleteIfExists(p); ()
    }
    rmrf(java.nio.file.Paths.get(s"$tmp/ckpt/alerts"))

    // ---- phase 2: restart everything, one more failing event ----------
    val run2 = Runner.start(spark, raw.toDF(), destinations, registry,
      logPath = s"$tmp/log", alertSinkName = "restart_alerts",
      checkpointRoot = s"$tmp/ckpt", alertCfg = cfg)
    try {
      raw.addData(ev(3))
      run2.processAllAvailable()

      // exactly-once across the restart: 3 events × 2 destinations, no
      // replayed attempt, every attempt id unique
      val log = spark.read.parquet(s"$tmp/log")
      assert(log.count() == 6, "delivery restart reprocessed or dropped a batch")
      assert(log.select("attempt_id").distinct().count() == 6)
      assert(log.filter(col("status") === "failed").count() == 3)

      // cumulative state: the 3rd d_down failure (1 post-restart) trips
      // the auto-disable with the full count — state rebuilt, not reset
      val alerts = spark.sql(
        "SELECT kind, destination_id, failure_count FROM restart_alerts")
        .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(alerts == Set(("destination_disabled", "d_down", 3)), alerts)
    } finally run2.stopAll()
  }
}
