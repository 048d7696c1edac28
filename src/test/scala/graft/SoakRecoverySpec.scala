package graft

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

import graft.streaming.{CurationStream, Recovery}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Restart-from-checkpoint recovery under an INDUCED interrupt — the
  * reproduction + recovery pinning for the r13 soak wedge (one in four
  * 300 s runs: a micro-batch thread interrupted mid
  * `HDFSBackedStateStore` commit → `CANNOT_COMMIT` → a stream neither
  * progressing nor terminated). [[Recovery.Restartable]] is the exact
  * code `StreamBench.soakRun` drains through, so this spec pins the
  * soak's recovery path, not a lookalike.
  *
  * The interrupt is delivered straight to the stream execution thread
  * (the same signal a failing sibling query's job-group cancellation
  * delivers in a multi-query JVM). Wherever it lands — mid-commit,
  * mid-planning, or in the trigger wait — `StreamExecution` treats an
  * interrupt without a stop() request as fatal and terminates with an
  * exception, which is precisely the state the r13 soak could not get
  * out of. The assertions: the drain consumes a restart instead of throwing,
  * and accounting stays EXACT — the replayed batch re-reads the same
  * offsets against the same pre-batch state version, and the
  * batchId-keyed sink is last-write-wins, so nothing double-counts.
  */
class SoakRecoverySpec extends GraftSuite {

  test("an interrupted stateful stream restarts from its checkpoint with exact accounting") {
    val ss = spark
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    import ss.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_recovery")
    spark.conf.set("spark.sql.streaming.stopTimeout", "30000")
    val mem = MemoryStream[(Long, Timestamp, String)]
    val batches =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    val budget = new AtomicInteger(3)
    val ts = new Timestamp(1704067200000L)
    val q = new Recovery.Restartable("digest", () =>
      CurationStream.curate(
          mem.toDF().toDF("doc_id", "event_time", "text"),
          minQuality = 0.0, minTokens = 1, watermark = "2 minutes")
        .writeStream.option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          batches.put(id, b.count()); ()
        }.start(), budget)
    try {
      mem.addData((0 until 200).map(i => (i.toLong, ts, s"healthy doc $i")))
      q.drain(timeoutMs = 120000L)
      assert(budget.get() == 3, "the healthy drain must not consume a restart")

      // induce the wedge's trigger: an interrupt reaching the stream
      // execution thread from outside (not via stop())
      val runId = q.query.runId.toString
      import scala.jdk.CollectionConverters._
      val streamThread = Thread.getAllStackTraces.keySet.asScala.find(t =>
        t.getName.contains("stream execution thread") && t.getName.contains(runId))
      assert(streamThread.nonEmpty, s"no stream execution thread for runId $runId")
      mem.addData((200 until 400).map(i => (i.toLong, ts, s"healthy doc $i")))
      streamThread.get.interrupt()

      q.drain(timeoutMs = 120000L) // fails once, rebuilds from ckpt, replays
      assert(budget.get() < 3, "the interrupt must have consumed a restart")
      val total = batches.values().asScala.map(_.longValue()).sum
      assert(total == 400L,
        s"exactly-once accounting broke across the restart: $total != 400")
    } finally q.stop()
  }
}
