package graft.tools

import java.sql.Timestamp
import graft.streaming.{Runner, Sinks}
import graft.streaming.Model.Destination
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Diagnostic: run the StreamBench paced operating point and dump each
  * micro-batch's StreamingQueryProgress duration breakdown (addBatch,
  * getBatch, queryPlanning, walCommit, ...) so latency work targets the
  * real per-trigger cost instead of guesses. Not part of any gate.
  *
  * Usage: `runMain graft.tools.StreamProbe [seconds] [rate]`
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val secs = args.headOption.map(_.toInt).getOrElse(15)
    val rate = args.lift(1).map(_.toInt).getOrElse(9000)
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master("local[32]")
      .appName("graft-stream-probe")
      // the streaming app's session: stateful-query state partitions
      // latch from shuffle.partitions at stream start — size to the key
      // cardinality (3 destinations here), not the analytics default
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_SHUF", "8"))
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("GRAFT_CKSUM", "false"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // stage-grain timing: wall duration + summed task time per stage, so a
    // slow micro-batch decomposes into map-vs-write-vs-overhead
    val stageLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = for {s <- i.submissionTime; e <- i.completionTime} yield e - s
        stageLines.add(s"stage=${i.stageId} tasks=${i.numTasks} " +
          s"wallMs=${wall.getOrElse(-1L)} " +
          s"taskTimeMs=${i.taskMetrics.executorRunTime} " +
          s"name=${i.name.take(70)}")
      }
    })

    val tmp = java.nio.file.Files.createTempDirectory("graft_streamprobe").toString
    val dests = Seq(
      Destination("d_all", "t1", "mock", Seq("*"), None, disabled = false),
      Destination("d_orders", "t1", "mock", Seq("order.*"), None, disabled = false),
      Destination("d_big", "t1", "mock", Seq("*"),
        Some("""{"data":{"amount":{"$gte":500}}}"""), disabled = false)).toDS()
    val registry = new Sinks.Registry(Seq(
      Sinks.MockSink("mock", wallClockAttempts = true)))
    val mem = MemoryStream[String]
    val running = Runner.start(spark, mem.toDF(), dests, registry,
      logPath = s"$tmp/log", alertSinkName = "sp_alerts",
      checkpointRoot = s"$tmp/chk")
    val topics = Seq("order.created", "order.updated", "user.created")
    def eventJson(i: Int): String =
      s"""{"event_id":"p$i","tenant_id":"t1","topic":"${topics(i % 3)}",""" +
        s""""event_time":"${new Timestamp(System.currentTimeMillis()).toInstant}","data":{"amount":${i % 1000}}}"""
    try {
      // warmup
      mem.addData((0 until 2000).map(i => eventJson(i)))
      running.delivery.processAllAvailable()
      val nTotal = secs * rate
      val chunk = rate / 10
      (0 until nTotal).grouped(chunk).foreach { b =>
        val tickEnd = System.nanoTime() + 100000000L
        mem.addData(b.map(eventJson))
        val left = (tickEnd - System.nanoTime()) / 1000000L
        if (left > 0) Thread.sleep(left)
      }
      running.delivery.processAllAvailable()
      println("=== stages ===")
      stageLines.forEach(l => println(l))
      println("=== delivery progress (one line per micro-batch) ===")
      running.delivery.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"triggerMs=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} latestOffset=${d.get("latestOffset")} " +
          s"planning=${d.get("queryPlanning")} walCommit=${d.get("walCommit")} " +
          s"commitOffsets=${d.get("commitOffsets")}")
      }
    } finally { running.stopAll(); spark.stop() }
  }
}
