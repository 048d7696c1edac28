package graft

import graft.streaming.{HookdeckMockServer, HttpWire, S3MockServer, Sinks}
import scala.jdk.CollectionConverters._

/** Hookdeck + S3 wire round-trips (streaming/HttpWire.scala). The
  * Hookdeck mock verifies the HMAC signature server-side with the shared
  * token — the round-trip proves the signing chain; the S3 mock verifies
  * Content-MD5 and echoes the ETag the client re-checks. */
class HttpWireSpec extends GraftSuite {

  private def ts(s: Int) = new java.sql.Timestamp(s * 1000L)

  private def tasks = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("e1", "t1", "d1", 1, false, ts(10), "order.created",
        """{"user":"u7","π":3.14}""", Map("trace" -> "abc"), true),
      ("e2", "t1", "d1", 1, false, ts(11), "order.updated",
        """{"id":42}""", Map.empty[String, String], true))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry")
  }

  test("hookdeck: the mock ACCEPTS only a valid HMAC — rendered rows " +
      "round-trip, a wrong-token server rejects them") {
    // token = base64("id:rest"); the FULL token string signs
    val token = java.util.Base64.getEncoder
      .encodeToString("tok_1:secretpart".getBytes("UTF-8"))
    val server = HookdeckMockServer.start(token)
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_hkwire").toString
      Sinks.HookdeckSink(token, spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      assert(HttpWire.deliverHookdeck(records, server.endpoint) == 2L)

      val got = server.received.asScala
      assert(got.size == 2 && got.forall(_.tokenId == "tok_1"))
      val bodies = got.map(_.body).toSet
      assert(bodies == Set("""{"user":"u7","π":3.14}""", """{"id":42}"""))
      val e1 = got.find(_.body.contains("u7")).get
      assert(e1.headers("x-outpost-event-id") == "e1")
      assert(e1.headers("x-outpost-topic") == "order.created")
      assert(e1.headers("x-outpost-trace") == "abc")

      // a server holding a DIFFERENT token rejects the same records: the
      // 401 proves the mock's verification is real, not a formality
      val wrong = HookdeckMockServer.start(java.util.Base64.getEncoder
        .encodeToString("tok_1:othersecret".getBytes("UTF-8")))
      try {
        val e = intercept[Exception] {
          HttpWire.deliverHookdeck(records, wrong.endpoint)
        }
        def chain(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
        assert(chain(e).exists(_.contains("401")), chain(e).mkString(" | "))
        assert(wrong.received.isEmpty)
      } finally wrong.stop()
    } finally server.stop()
  }

  test("s3: templated keys PUT with verified Content-MD5 and re-checked " +
      "ETag; a corrupt-etag server fails the delivery") {
    val server = S3MockServer.start()
    try {
      val sink = Sinks.ObjectStoreSink("/unused",
        keyTemplate = "{time.date}/{topic}/{event_id}.json")
      val objects = sink.objects(tasks)
      assert(HttpWire.deliverS3(objects, server.endpoint, "bkt1") == 2L)

      val got = server.received.asScala
      assert(got.size == 2 && got.forall(_.bucket == "bkt1"))
      val byKey = got.map(r => r.key -> new String(r.body, "UTF-8")).toMap
      assert(byKey == Map(
        "1970-01-01/order.created/e1.json" -> """{"user":"u7","π":3.14}""",
        "1970-01-01/order.updated/e2.json" -> """{"id":42}"""), byKey)

      val corrupt = S3MockServer.start(corruptEtag = true)
      try {
        val e = intercept[Exception] {
          HttpWire.deliverS3(objects, corrupt.endpoint, "bkt1")
        }
        def chain(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
        assert(chain(e).exists(_.contains("ETag mismatch")),
          chain(e).mkString(" | "))
      } finally corrupt.stop()
    } finally server.stop()
  }
}
