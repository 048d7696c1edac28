package graft

import graft.streaming.{KafkaMockServer, KafkaWire, KafkaWireConnHolder, KafkaWireSink, Sinks}
import org.apache.spark.sql.functions._

/** Wire-level Kafka round-trip with NO broker and NO client library: the
  * real renderer's record rows are produced over a real TCP socket
  * speaking the public Kafka protocol (ApiVersions + Metadata + Produce
  * with record-batch v2) to an in-process broker fake that VERIFIES the
  * CRC32C of every batch — closing the 10/10 sink transport matrix. */
class KafkaWireSpec extends GraftSuite {

  private def ts(s: Int) = new java.sql.Timestamp(s * 1000L)

  private def tasks = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("e1", "t1", "d1", 1, false, ts(10), "order.created",
        """{"user":"u7","n":1}""", Map("trace" -> "abc"), true),
      // unicode + embedded quotes: the exact-byte part of the contract
      ("e2", "t1", "d1", 1, false, ts(11), "order.updated",
        """{"name":"zoé \"the® builder\"","π":3.14159}""",
        Map.empty[String, String], true),
      ("e3", "t2", "d2", 2, true, ts(12), "user.deleted",
        """{"id":42}""", Map("source" -> "replay"), true))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry")
  }

  test("varint/zigzag codec round-trips the record-batch interior " +
      "encoding across the signed range") {
    val vals = Seq(0L, 1L, -1L, 63L, 64L, -64L, -65L, 300L, -300L,
      Int.MaxValue.toLong, Int.MinValue.toLong, Long.MaxValue, Long.MinValue)
    vals.foreach { v =>
      val bos = new java.io.ByteArrayOutputStream()
      KafkaWire.writeVarLong(new java.io.DataOutputStream(bos), v)
      val back = KafkaWire.readVarLong(
        java.nio.ByteBuffer.wrap(bos.toByteArray))
      assert(back == v, s"varlong $v -> $back")
    }
  }

  test("renderer rows round-trip a real socket: exact key/value bytes, " +
      "headers, hash partition routing, CRC verified broker-side") {
    val server = KafkaMockServer.start(Map("orders" -> 3))
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_kafkawire").toString
      Sinks.KafkaSink("orders", "", spoolDir = spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      assert(KafkaWire.deliver(records, "127.0.0.1", server.port) == 3L)

      import scala.jdk.CollectionConverters._
      val got = server.received.asScala.toSeq
      assert(got.size == 3)
      assert(server.corruptBatches.get() == 0L)
      val byValue = got.map(r => new String(r.value, "UTF-8") -> r).toMap
      // exact bytes: payloads arrive byte-identical, unicode included
      assert(byValue.contains("""{"user":"u7","n":1}"""))
      assert(byValue.contains("""{"name":"zoé \"the® builder\"","π":3.14159}"""))
      assert(byValue.contains("""{"id":42}"""))
      // key = partition key template fallback -> event id (destkafka.go:236)
      assert(new String(byValue("""{"id":42}""").key, "UTF-8") == "e3")
      // headers carry metadata + content-type (destkafka.go:242-246)
      val h1 = byValue("""{"user":"u7","n":1}""").headers
      assert(h1("content-type") == "application/json")
      assert(h1("trace") == "abc")
      // routing matches the reference's kafka.Hash balancer: FNV-1a
      // positive-modulo over the key bytes
      got.foreach { r =>
        assert(r.partition == KafkaWire.fnv1aPartition(r.key, 3),
          s"record ${new String(r.key, "UTF-8")} on wrong partition")
      }
      // per-partition offsets are dense from 0 (the fake is a real log)
      got.groupBy(r => (r.topic, r.partition)).foreach { case (_, rs) =>
        assert(rs.map(_.baseOffset).sorted == (0L until rs.size).toSeq)
      }
    } finally server.stop()
  }

  test("Fetch round-trips produced records: CRC-verified batches, offsets, " +
      "mid-offset resume, per-partition isolation") {
    val server = KafkaMockServer.start(Map("orders" -> 2))
    val conn = new KafkaWireConnHolder("127.0.0.1", server.port, 5000)
    try {
      def rec(i: Int): KafkaWire.Rec =
        (s"k$i".getBytes("UTF-8"), s"v$i-payload".getBytes("UTF-8"),
          Seq("h" -> s"m$i".getBytes("UTF-8"), "null-h" -> null))
      val recs = (0 until 12).map(rec)
      // two produce rounds so partitions hold MULTIPLE batches each
      assert(conn.produceMany("orders", recs.take(6)).toOption.get.forall(_ == 0))
      assert(conn.produceMany("orders", recs.drop(6)).toOption.get.forall(_ == 0))
      val partOf = recs.map { case (k, _, _) =>
        KafkaWire.fnv1aPartition(k, 2)
      }
      (0 until 2).foreach { p =>
        val sent = recs.zip(partOf).filter(_._2 == p).map(_._1)
        val Right((hw, got)) = conn.fetchFrom("orders", p, 0L)
        assert(hw == sent.size.toLong, s"partition $p watermark $hw")
        assert(got.map(_._1) == sent.indices.map(_.toLong),
          s"partition $p offsets not contiguous from 0: ${got.map(_._1)}")
        // byte-exact round trip in produce order (hash routing preserves
        // per-partition input order; the broker assigned ascending offsets)
        got.map(_._2).zip(sent).foreach { case ((gk, gv, gh), (sk, sv, sh)) =>
          assert(java.util.Arrays.equals(gk, sk) &&
            java.util.Arrays.equals(gv, sv))
          assert(gh.map(_._1) == sh.map(_._1))
          gh.zip(sh).foreach { case ((_, gb), (_, sb)) =>
            assert((gb == null && sb == null) || java.util.Arrays.equals(gb, sb))
          }
        }
        // resume mid-stream: fetching from offset 2 returns exactly the
        // suffix even when offset 2 sits inside a retained batch
        if (sent.size > 3) {
          val Right((_, tail)) = conn.fetchFrom("orders", p, 2L)
          assert(tail.map(_._1) == (2L until sent.size.toLong))
        }
      }
      // unknown partition surfaces the protocol error, not an empty list
      assert(conn.fetchFrom("orders", 7, 0L) == Left(3))
    } finally { conn.close(); server.stop() }
  }

  test("corrupted CRC32C is rejected with CORRUPT_MESSAGE and stores " +
      "nothing: the broker-side verification is real") {
    val server = KafkaMockServer.start(Map("orders" -> 1))
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_kafkawire_crc").toString
      Sinks.KafkaSink("orders", "", spoolDir = spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      val e = intercept[Exception] {
        KafkaWire.deliver(records, "127.0.0.1", server.port,
          corruptCrc = true)
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("corrupt_message")),
        s"expected corrupt_message, got: ${chain(e).mkString(" | ")}")
      assert(server.corruptBatches.get() > 0L)
      assert(server.received.size == 0)
      // the same connection path delivers clean afterwards
      assert(KafkaWire.deliver(records, "127.0.0.1", server.port) == 3L)
      assert(server.received.size == 3)
    } finally server.stop()
  }

  test("unknown topic is UNKNOWN_TOPIC_OR_PARTITION end to end") {
    val server = KafkaMockServer.start(Map("orders" -> 1))
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_kafkawire_unk").toString
      Sinks.KafkaSink("nope", "", spoolDir = spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      val e = intercept[Exception] {
        KafkaWire.deliver(records, "127.0.0.1", server.port)
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(m => m.contains("metadata error 3") ||
        m.contains("topic_not_found")),
        s"expected unknown-topic, got: ${chain(e).mkString(" | ")}")
      assert(server.received.size == 0)
    } finally server.stop()
  }

  test("batched KafkaWireSink: one Produce per chunk with multi-record " +
      "batches per partition; partition-level branching; 10x fewer " +
      "requests than per-record") {
    val server = KafkaMockServer.start(Map("orders" -> 3))
    try {
      val spark2 = spark
      import spark2.implicits._
      val many = (0 until 40).map { i =>
        (s"be$i", "t1", "d1", 1, false, ts(i), "order.created",
          s"""{"i":$i}""", Map.empty[String, String], true)
      }.toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry")
        .coalesce(1)
      val out = KafkaWireSink("orders", "127.0.0.1", server.port,
        batchSize = 10).publish(many)
        .select("status", "code").collect()
      assert(out.length == 40 && out.forall(_.getString(0) == "success"))
      assert(server.received.size == 40)
      // ceil(40/10) = 4 Produce requests (vs 40 per-record)
      assert(server.produceRequests.get() == 4L,
        s"produce requests: ${server.produceRequests.get()}")
      import scala.jdk.CollectionConverters._
      // hash routing holds inside multi-record batches, offsets dense
      server.received.asScala.foreach { r =>
        assert(r.partition == KafkaWire.fnv1aPartition(r.key, 3))
      }
      server.received.asScala.groupBy(_.partition).foreach { case (_, rs) =>
        assert(rs.map(_.baseOffset).toSeq.sorted == (0L until rs.size).toSeq)
      }
      // unknown topic through the batched path: every record in the
      // chunk fails with the topic error, no exception
      val bad = KafkaWireSink("nope", "127.0.0.1", server.port,
        batchSize = 10).publish(many.limit(12))
        .select("status", "code").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(bad.length == 12 &&
        bad.forall(_ == ("failed", "topic_not_found")), bad.toSeq)
    } finally server.stop()
  }

  test("KafkaWireSink delivers INSIDE the streaming loop: ingest -> " +
      "fanout -> Kafka wire -> attempt log, with per-record branching") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val server = KafkaMockServer.start(Map("events" -> 2))
    try {
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_kafkaloop").toString
      val destinations = Seq(graft.streaming.Model.Destination(
        "d_kafka", "t1", "kafka", Seq("*"), None, disabled = false)).toDS()
      val registry = new Sinks.Registry(Seq(
        KafkaWireSink("events", "127.0.0.1", server.port)))
      val raw = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val running = graft.streaming.Runner.start(spark, raw.toDF(),
        destinations, registry, logPath = s"$tmp/log",
        alertSinkName = "kafka_loop_alerts", checkpointRoot = s"$tmp/ckpt")
      try {
        raw.addData((1 to 3).map(i =>
          s"""{"event_id":"ke$i","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:0$i.000Z","data":{"n":$i}}"""))
        running.delivery.processAllAvailable()
      } finally running.stopAll()

      // the wire really carried them: 3 records in the broker store
      import scala.jdk.CollectionConverters._
      assert(server.received.size == 3)
      assert(server.received.asScala
        .map(r => new String(r.value, "UTF-8")).toSet ==
        Set("""{"n":1}""", """{"n":2}""", """{"n":3}"""))
      // key = event id (empty template fallback); routed by FNV-1a mod 2
      server.received.asScala.foreach { r =>
        assert(r.partition == KafkaWire.fnv1aPartition(r.key, 2))
        // headers carry the layered delivery metadata
        assert(r.headers("content-type") == "application/json")
        assert(r.headers("topic") == "order.created")
        assert(r.headers.contains("event-id"))
      }
      // and the attempt log shows three successes with the wire's code
      val log = spark.read.parquet(s"$tmp/log")
      assert(log.count() == 3)
      assert(log.filter(col("status") === "success").count() == 3)
      assert(log.filter(col("code") === "OK").count() == 3)

      // per-record failure branching: an unknown topic turns into FAILED
      // attempts with the reference's error class, never an exception
      val bad = KafkaWireSink("nope", "127.0.0.1", server.port)
        .publish(tasks)
        .select("status", "code").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(bad.length == 3 &&
        bad.forall(_ == ("failed", "topic_not_found")), bad.toSeq)
      // unreachable broker -> connection-class failures
      val dead = KafkaWireSink("events", "127.0.0.1", 1)
        .publish(tasks)
        .select("status", "code").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(dead.forall(o => o._1 == "failed" &&
        (o._2 == "connection_refused" || o._2 == "kafka_error" ||
          o._2 == "timeout")), dead.toSeq)
    } finally server.stop()
  }
}
