package graft

import graft.streaming.{AmqpMockServer, AmqpWire, Sinks}
import scala.jdk.CollectionConverters._

/** AMQP 0-9-1 round-trip over a real socket: the RabbitMQ renderer's
  * spool rows published frame-by-frame (handshake, Basic.Publish,
  * content header with property flags + field table, body) into a mock
  * broker that parses the actual frames. Asserts the exact bytes on the
  * broker side: routing key = event topic, content type, merged-metadata
  * headers, body. */
class AmqpWireSpec extends GraftSuite {

  private def ts(s: Int) = new java.sql.Timestamp(s * 1000L)

  private def tasks = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("e1", "t1", "d1", 1, false, ts(10), "order.created",
        """{"user":"u7","π":3.14}""", Map("trace" -> "abc"), true),
      ("e2", "t1", "d1", 1, false, ts(11), "order.updated",
        """{"id":42}""", Map.empty[String, String], true),
      ("e3", "t2", "d2", 2, true, ts(12), "user.deleted",
        """{"id":43}""", Map("source" -> "replay"), true))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry")
  }

  test("renderer rows publish over real AMQP frames: routing keys, " +
      "content type, header table, exact bodies") {
    val server = AmqpMockServer.start()
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_amqpwire").toString
      Sinks.RabbitMqSink("ex1", spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      assert(AmqpWire.deliver(records, "127.0.0.1", server.port) == 3L)

      // the broker-side store is the assertion surface: these bytes
      // crossed a socket as real frames
      val got = server.received.asScala
      assert(got.size == 3)
      assert(got.forall(_.exchange == "ex1"))
      assert(got.forall(_.contentType == "application/json"))
      val byKey = got.map(r => r.routingKey -> r).toMap
      // routing key is the EVENT TOPIC (destrabbitmq.go:134-170)
      assert(byKey.keySet == Set("order.created", "order.updated", "user.deleted"))
      assert(new String(byKey("order.created").body, "UTF-8") ==
        """{"user":"u7","π":3.14}""")
      assert(new String(byKey("order.updated").body, "UTF-8") == """{"id":42}""")
      // headers carry the merged system+event metadata
      val h1 = byKey("order.created").headers
      assert(h1("event-id") == "e1" && h1("topic") == "order.created" &&
        h1("trace") == "abc" && h1.contains("timestamp"))
      val h3 = byKey("user.deleted").headers
      assert(h3("source") == "replay" && h3("event-id") == "e3")
    } finally server.stop()
  }

  test("empty body publishes cleanly; a non-AMQP client is dropped " +
      "without poisoning the broker") {
    val server = AmqpMockServer.start()
    try {
      // garbage preamble on a raw socket: connection dies, server lives
      val s = new java.net.Socket("127.0.0.1", server.port)
      s.getOutputStream.write("HTTP/1.1 GET /".getBytes("US-ASCII"))
      s.getOutputStream.flush()
      s.close()

      val spark2 = spark
      import spark2.implicits._
      val spool = java.nio.file.Files
        .createTempDirectory("graft_amqpwire0").toString
      val empty = Seq(("e9", "t1", "d1", 1, false, ts(9), "ping", "",
          Map.empty[String, String], true))
        .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
          "event_time", "topic", "data", "metadata", "eligible_for_retry")
      Sinks.RabbitMqSink("ex1", spool).publish(empty).collect()
      assert(AmqpWire.deliver(spark.read.parquet(spool),
        "127.0.0.1", server.port) == 1L)
      val got = server.received.asScala
      assert(got.size == 1 && got.head.body.isEmpty &&
        got.head.routingKey == "ping")
    } finally server.stop()
  }
}
