package graft

import java.sql.Timestamp
import graft.streaming.{Runner, Sinks}
import graft.streaming.Model.Destination
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end streaming throughput bench: raw JSON events → validate →
  * broadcast match/fanout (topic globs + JSON filters) → delivery sinks →
  * denormalized month-partitioned log, all as the ONE Runner DAG.
  *
  * The reference's load-test anchor is 100 events/s sustained for 30 s
  * (`loadtest/config/scenarios/events-throughput/basic.json`); this measures
  * the same publish→deliver→log path and prints one JSON line with the
  * achieved events/s. Usage: `runMain graft.StreamBench [nEvents]`.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
    val registry = new Sinks.Registry(Seq(Sinks.MockSink("mock")))

    val mem = MemoryStream[String]
    val running = Runner.start(spark, mem.toDF(), dests, registry,
      logPath = s"$tmp/log", alertSinkName = "sb_alerts",
      checkpointRoot = s"$tmp/chk")

    val topics = Seq("order.created", "order.updated", "user.created")
    val base = 1704067200000L
    def eventJson(prefix: String)(i: Int): String =
      s"""{"event_id":"$prefix$i","tenant_id":"t1","topic":"${topics(i % 3)}",""" +
        s""""event_time":"${new Timestamp(base + i).toInstant}","data":{"amount":${i % 1000}}}"""
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

    // Untimed warmup batch through the same DAG: first-batch codegen,
    // broadcast build and parquet writer init are one-time costs every
    // steady-state engine has amortized — the same per-query untimed
    // warmup pass Bench.scala gives the batch queries (and the reference's
    // loadtest measures its sustained window after ramp, not from cold).
    val nWarm = 2000
    mem.addData((0 until nWarm).map(eventJson("w")))
    val warmDeadline = System.currentTimeMillis() + 60000
    while (logged() < expectedFor(nWarm) &&
        System.currentTimeMillis() < warmDeadline) Thread.sleep(100)
    val base0 = logged()

    val expected = expectedFor(n)
    val t0 = System.nanoTime()
    (0 until n).grouped(5000).foreach(b => mem.addData(b.map(eventJson("e"))))
    val deadline = System.currentTimeMillis() + 180000
    var done = logged() - base0
    while (done < expected && System.currentTimeMillis() < deadline) {
      Thread.sleep(100); done = logged() - base0
    }
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"metric":"stream_throughput","unit":"events/sec",""" +
      s""""value":${(n / sec).round},"events":$n,"attempts_logged":$done,""" +
      s""""attempts_expected":$expected,"wall_sec":${math.round(sec * 1000) / 1000.0}}""")
    running.stopAll()
    spark.stop()
    if (done < expected) sys.exit(1)
  }
}
