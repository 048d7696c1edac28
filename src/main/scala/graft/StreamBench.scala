package graft

import java.sql.Timestamp
import graft.streaming.{Runner, Sinks}
import graft.streaming.Model.Destination
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** End-to-end streaming load test: raw JSON events → validate → broadcast
  * match/fanout (topic globs + JSON filters) → delivery sinks →
  * denormalized month-partitioned log, all as the ONE Runner DAG.
  *
  * Two-phase shape, mirroring the reference's loadtest
  * (`loadtest/config/scenarios/events-throughput/basic.json`: a sustained
  * publish window, then a verification pass):
  *
  *   1. THROUGHPUT — publish `n` events stamped with wall-clock publish
  *      time, measure sustained publish→deliver→log events/s after an
  *      untimed warmup batch (first-batch codegen, broadcast build,
  *      parquet writer init — one-time costs every steady-state engine
  *      has amortized; the reference measures after ramp too).
  *   2. VERIFICATION — exact per-destination attempt accounting against
  *      the combinatorial expectation, plus per-stage latency percentiles
  *      read from the three wall-clock stamps each attempt carries:
  *      event publish time → delivery (`attempt_time`, stamped by the
  *      sink) → log write (`logged_at`, stamped by the log sink).
  *
  * Usage: `runMain graft.StreamBench [nEvents]` — prints one JSON line.
  * [[run]] is also embedded in [[Bench]] so the per-round BENCH artifact
  * carries the streaming numbers.
  */
object StreamBench {

  /** Run the two-phase load test on an existing session; returns the JSON
    * object (no trailing newline) for embedding. */
  def run(spark: SparkSession, n: Int): String = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft_streambench").toString
    // d_all matches everything; d_orders only order.* (2 of 3 topics are
    // order.*) → expected attempts = n + ceil(2n/3); d_big adds a JSON
    // filter so the fanout pays the evaluator too
    val dests = Seq(
      Destination("d_all", "t1", "mock", Seq("*"), None, disabled = false),
      Destination("d_orders", "t1", "mock", Seq("order.*"), None, disabled = false),
      Destination("d_big", "t1", "mock", Seq("*"),
        Some("""{"data":{"amount":{"$gte":500}}}"""), disabled = false)).toDS()
    val registry = new Sinks.Registry(Seq(
      Sinks.MockSink("mock", wallClockAttempts = true)))

    val mem = MemoryStream[String]
    val running = Runner.start(spark, mem.toDF(), dests, registry,
      logPath = s"$tmp/log", alertSinkName = "sb_alerts",
      checkpointRoot = s"$tmp/chk")

    val topics = Seq("order.created", "order.updated", "user.created")
    // event_time = wall clock at publish: stage-1 stamp of the latency probe
    def eventJson(prefix: String)(i: Int): String =
      s"""{"event_id":"$prefix$i","tenant_id":"t1","topic":"${topics(i % 3)}",""" +
        s""""event_time":"${new Timestamp(System.currentTimeMillis()).toInstant}","data":{"amount":${i % 1000}}}"""
    def expectedFor(count: Int): Long = {
      val orderEvents = (0 until count).count(i => i % 3 != 2)
      val bigEvents = (0 until count).count(_ % 1000 >= 500)
      count.toLong + orderEvents + bigEvents
    }
    def logged(): Long =
      try spark.read.schema(Runner.logSchema.add("month",
          org.apache.spark.sql.types.StringType))
        .parquet(s"$tmp/log").count()
      catch { case _: Exception => 0L }

    try {
      // ---- phase 1: throughput -------------------------------------
      val nWarm = 2000
      mem.addData((0 until nWarm).map(eventJson("w")))
      val warmDeadline = System.currentTimeMillis() + 60000
      while (logged() < expectedFor(nWarm) &&
          System.currentTimeMillis() < warmDeadline) Thread.sleep(100)
      val base0 = logged()

      val expected = expectedFor(n)
      val t0 = System.nanoTime()
      // paced publish (the reference loadtest publishes over a window, not
      // as one burst): 5k chunks every 50 ms spread the load across many
      // micro-batches so the stage stamps profile real batch boundaries
      // instead of one giant first batch
      (0 until n).grouped(5000).foreach { b =>
        mem.addData(b.map(eventJson("e"))); Thread.sleep(50)
      }
      val deadline = System.currentTimeMillis() + 180000
      var done = logged() - base0
      while (done < expected && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); done = logged() - base0
      }
      val sec = (System.nanoTime() - t0) / 1e9

      // ---- phase 2: verification -----------------------------------
      // exact per-destination accounting against the combinatorial model
      val log = spark.read.parquet(s"$tmp/log")
        .filter(col("event_id").startsWith("e"))
      val perDest = log.groupBy("destination_id").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expectedPerDest = Map(
        "d_all" -> n.toLong,
        "d_orders" -> (0 until n).count(i => i % 3 != 2).toLong,
        "d_big" -> (0 until n).count(_ % 1000 >= 500).toLong)
      val accountingExact = perDest == expectedPerDest &&
        log.count() == expected &&
        log.select("attempt_id").distinct().count() == expected

      // per-stage latency percentiles from the three wall-clock stamps
      val lat = log.select(
        (unix_millis(col("attempt_time")) - unix_millis(col("event_time")))
          .as("publish_to_deliver"),
        (unix_millis(col("logged_at")) - unix_millis(col("attempt_time")))
          .as("deliver_to_log"),
        (unix_millis(col("logged_at")) - unix_millis(col("event_time")))
          .as("end_to_end"))
      val stages = Seq("publish_to_deliver", "deliver_to_log", "end_to_end")
      val pcts = lat.select(stages.flatMap(s => Seq(
        expr(s"percentile($s, 0.5)").as(s"${s}_p50"),
        expr(s"percentile($s, 0.99)").as(s"${s}_p99"))): _*).head()
      val stageJson = stages.zipWithIndex.map { case (s, i) =>
        s""""$s":{"p50_ms":${pcts.getDouble(2 * i).round},"p99_ms":${pcts.getDouble(2 * i + 1).round}}"""
      }.mkString("{", ",", "}")

      s"""{"metric":"stream_throughput","unit":"events/sec",""" +
        s""""value":${(n / sec).round},"events":$n,"attempts_logged":$done,""" +
        s""""attempts_expected":$expected,"accounting_exact":$accountingExact,""" +
        s""""per_destination":${expectedPerDest.keys.toSeq.sorted.map(d =>
            s""""$d":${perDest.getOrElse(d, 0L)}""").mkString("{", ",", "}")},""" +
        s""""stages":$stageJson,"wall_sec":${math.round(sec * 1000) / 1000.0}}"""
    } finally running.stopAll()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(60000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val json = run(spark, n)
    println(json)
    spark.stop()
    if (!json.contains(""""accounting_exact":true""")) sys.exit(1)
  }
}
