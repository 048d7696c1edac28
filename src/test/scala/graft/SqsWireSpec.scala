package graft

import graft.streaming.{Sinks, SqsMockServer, SqsWire}
import org.apache.spark.sql.functions._

/** Wire-level SQS round-trip with NO broker and NO SDK: the real
  * renderer's spool rows are POSTed over a real TCP socket speaking the
  * public SQS JSON-1.0 protocol to an in-process SQS fake (the
  * reference's destinationmockserver pattern, `internal/
  * destinationmockserver/`), asserting exact bytes on both ends plus the
  * SDK-style MD5 integrity echoes. */
class SqsWireSpec extends GraftSuite {

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

  test("renderer rows round-trip a real socket: exact bodies, merged " +
      "metadata attribute, verified MD5 echoes") {
    val server = SqsMockServer.start()
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_sqswire").toString
      val queueUrl = s"${server.endpoint}123456789/orders"
      Sinks.SqsSink(queueUrl, spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      assert(SqsWire.deliver(records, server.endpoint) == 3L)

      val got = server.received
      assert(got.size == 3)
      import scala.jdk.CollectionConverters._
      val byBody = got.asScala.map(r => r.body -> r).toMap
      // exact bytes: the payload string arrives byte-identical, unicode
      // and escapes included
      assert(byBody.contains("""{"user":"u7","n":1}"""))
      assert(byBody.contains("""{"name":"zoé \"the® builder\"","π":3.14159}"""))
      assert(byBody.contains("""{"id":42}"""))
      got.asScala.foreach(r => assert(r.queueUrl == queueUrl))

      // the single String 'metadata' attribute carries the merged
      // system+event metadata (destawssqs.go:137-155, basepublisher
      // layering): system fields present, event metadata wins
      val m1 = graft.functions.JsonMatch.parse(
        byBody("""{"user":"u7","n":1}""").attributes("metadata"))
      assert(m1.get("event-id").asText == "e1")
      assert(m1.get("topic").asText == "order.created")
      assert(m1.get("trace").asText == "abc")
      assert(m1.has("timestamp"))
      val m3 = graft.functions.JsonMatch.parse(
        byBody("""{"id":42}""").attributes("metadata"))
      assert(m3.get("source").asText == "replay")
    } finally server.stop()
  }

  test("SqsHttpSink delivers INSIDE the streaming loop: ingest -> fanout " +
      "-> SQS wire -> attempt log, with per-record failure branching") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val server = SqsMockServer.start()
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft_sqsloop").toString
      val queueUrl = s"${server.endpoint}123/orders"
      val destinations = Seq(graft.streaming.Model.Destination(
        "d_sqs", "t1", "aws_sqs", Seq("*"), None, disabled = false)).toDS()
      val registry = new Sinks.Registry(Seq(
        graft.streaming.SqsHttpSink(queueUrl, server.endpoint)))
      val raw = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val running = graft.streaming.Runner.start(spark, raw.toDF(),
        destinations, registry, logPath = s"$tmp/log",
        alertSinkName = "sqs_loop_alerts", checkpointRoot = s"$tmp/ckpt")
      try {
        raw.addData((1 to 3).map(i =>
          s"""{"event_id":"se$i","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:0$i.000Z","data":{"n":$i}}"""))
        running.delivery.processAllAvailable()
      } finally running.stopAll()

      // the wire really carried them: 3 messages in the mock store
      import scala.jdk.CollectionConverters._
      assert(server.received.size == 3)
      assert(server.received.asScala.map(_.body).toSet ==
        Set("""{"n":1}""", """{"n":2}""", """{"n":3}"""))
      // and the attempt log shows three successes with the wire's code
      val log = spark.read.parquet(s"$tmp/log")
      assert(log.count() == 3)
      assert(log.filter(org.apache.spark.sql.functions.col("status") === "success").count() == 3)

      // per-record failure branching: a corrupt-MD5 endpoint turns into
      // FAILED attempts (feeding retries), never an exception
      val corrupt = SqsMockServer.start(corruptMd5 = true)
      try {
        val out = graft.streaming.SqsHttpSink(
            s"${corrupt.endpoint}q", corrupt.endpoint).publish(tasks)
          .select("status", "code").collect()
          .map(r => (r.getString(0), r.getString(1)))
        assert(out.length == 3 &&
          out.forall(_ == ("failed", "md5_mismatch")), out.toSeq)
      } finally corrupt.stop()
      // unreachable endpoint → connection_error outcomes
      val dead = graft.streaming.SqsHttpSink(
          "http://127.0.0.1:1/q", "http://127.0.0.1:1/").publish(tasks)
        .select("status", "code").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(dead.forall(o => o._1 == "failed" &&
        (o._2 == "connection_error" || o._2 == "timeout")), dead.toSeq)
    } finally server.stop()
  }

  test("protocol validation: wrong target and missing body are rejected; " +
      "a corrupted MD5 echo fails the delivery (the verification is real)") {
    val server = SqsMockServer.start()
    try {
      // hand-rolled bad requests straight at the socket
      val client = java.net.http.HttpClient.newHttpClient()
      def post(target: String, body: String): Int = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(server.endpoint))
          .header("Content-Type", "application/x-amz-json-1.0")
          .header("X-Amz-Target", target)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofString()).statusCode()
      assert(post("AmazonSQS.DeleteQueue", """{"QueueUrl":"q"}""") == 400)
      assert(post("AmazonSQS.SendMessage", """{"QueueUrl":"q"}""") == 400)
      // rejected requests are never stored
      assert(server.received.size == 0)
    } finally server.stop()

    val corrupt = SqsMockServer.start(corruptMd5 = true)
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_sqswire_bad").toString
      Sinks.SqsSink(s"${corrupt.endpoint}q", spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      val e = intercept[Exception] {
        SqsWire.deliver(records, corrupt.endpoint)
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("MD5OfMessageBody")),
        s"expected an MD5 failure, got: ${chain(e).mkString(" | ")}")
    } finally corrupt.stop()
  }
}
