package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Stream-stream interval join (T-coverage widening): two live streams
  * correlated on a key within a bounded event-time window — Structured
  * Streaming's stateful join with watermarks on BOTH sides so state
  * evicts as event time advances. */
class StreamJoinSpec extends GraftSuite {

  private def ts(sec: Int) =
    new java.sql.Timestamp(1704067200000L + sec * 1000L) // 2024-01-01 +s

  test("stream-stream interval join: in-window pairs emit exactly once, " +
      "out-of-window never; state is bounded by the watermark") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val attempts = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val callbacks = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = TemporalJoins.streamIntervalJoin(
      attempts.toDF().toDF("id", "ts", "dest"),
      callbacks.toDF().toDF("id", "ts", "status"),
      keyCol = "id", leftTs = "ts", rightTs = "ts",
      windowMillis = 60000L, delayMillis = 10000L)
    val q = joined
      .select(col("id"), col("dest"), col("j_status"))
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      // attempt 1 gets its callback 30 s later (in window); attempt 2's
      // callback lands 120 s later (outside the 60 s bound); attempt 3
      // never hears back
      attempts.addData((1L, ts(0), "d1"), (2L, ts(0), "d2"), (3L, ts(0), "d3"))
      callbacks.addData((1L, ts(30), "ok"))
      q.processAllAvailable()
      callbacks.addData((2L, ts(120), "late"))
      q.processAllAvailable()
      val got = spark.sql("SELECT id, dest, j_status FROM ssj_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got == Set((1L, "d1", "ok")), s"unexpected join output: $got")

      // join order independence: a callback arriving BEFORE its attempt
      // (right side buffered in state) still pairs
      callbacks.addData((7L, ts(150), "early"))
      q.processAllAvailable()
      attempts.addData((7L, ts(140), "d7"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM ssj_out WHERE id = 7").head.getLong(0) == 1L)

      // watermark-bounded state: push event time far forward on both
      // sides, give the watermark a batch to commit, and the state store
      // must shed the long-expired rows rather than accreting forever
      attempts.addData((100L, ts(4000), "d100"))
      callbacks.addData((100L, ts(4001), "ok"))
      q.processAllAvailable()
      attempts.addData((101L, ts(4100), "d101"))
      callbacks.addData((101L, ts(4101), "ok"))
      q.processAllAvailable()
      q.processAllAvailable()
      val state = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq).map(_.numRowsTotal).sum
      assert(state <= 8,
        s"state store holds $state rows — watermark eviction not happening")
    } finally q.stop()
  }

  test("streamJoinRun bench point: exact in/out-of-window accounting and " +
      "watermark eviction at 5k pairs") {
    val json = graft.StreamBench.streamJoinRun(spark, 5000)
    assert(json.contains("\"accounting_exact\":true"), json)
    assert(json.contains("\"state_evicted\":true"), json)
  }

  test("pointLookupRun micro-bench: blooms typically prune hits to <=2 " +
      "files and misses to 0, out of a multi-file table") {
    val json = graft.Bench.pointLookupRun(spark, sf)
    def intOf(k: String) = ("\"" + k + "\":(\\d+)").r.findFirstMatchIn(json)
      .map(_.group(1).toInt).getOrElse(99)
    assert(intOf("files_total") >= 9, json)
    // typical pruning is the MEDIAN pin: an id lives in exactly one file,
    // so a hit touches 1 (occasionally 2 with a bloom false positive) and
    // a miss 0. The MAX pins are deliberately loose: each of the ~17
    // other files' 1%-fpp blooms can fire, so a probe touching a 3rd
    // file is an expected tail event, not a defect.
    assert(intOf("hit_files_med") >= 1 && intOf("hit_files_med") <= 2, json)
    assert(intOf("miss_files_med") == 0, json)
    assert(intOf("hit_files_max") <= 4, json)
    assert(intOf("miss_files_max") <= 3, json)
  }
}
