package graft

import graft.streaming.{Amqp10MockServer, Amqp10Wire, Sinks}
import scala.jdk.CollectionConverters._

/** AMQP 1.0 round-trip for the Service Bus sink: real described-type
  * frames (open/begin/attach, credit flow, settled transfers with
  * application-properties + data sections) over a real socket into a
  * strictly-parsing mock. */
class Amqp10WireSpec extends GraftSuite {

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

  test("renderer rows transfer over real AMQP 1.0 frames: queue target, " +
      "application properties, exact bodies") {
    val server = Amqp10MockServer.start()
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_amqp10").toString
      Sinks.ServiceBusSink("orders-q", spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      assert(Amqp10Wire.deliver(records, "127.0.0.1", server.port) == 3L)

      val got = server.received.asScala
      assert(got.size == 3)
      assert(got.forall(_.queue == "orders-q"))
      val byBody = got.map(r => new String(r.body, "UTF-8") -> r).toMap
      assert(byBody.keySet == Set("""{"user":"u7","π":3.14}""",
        """{"id":42}""", """{"id":43}"""))
      // application properties = the merged system+event metadata
      // (destazureservicebus.go:127-142)
      val p1 = byBody("""{"user":"u7","π":3.14}""").properties
      assert(p1("event-id") == "e1" && p1("topic") == "order.created" &&
        p1("trace") == "abc" && p1.contains("timestamp"))
      assert(byBody("""{"id":43}""").properties("source") == "replay")
    } finally server.stop()
  }

  test("flow control is real: a 2-credit receiver stops the 3rd transfer") {
    val server = Amqp10MockServer.start(linkCredit = 2L)
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_amqp10c").toString
      Sinks.ServiceBusSink("q2", spool).publish(tasks).collect()
      val records = spark.read.parquet(spool).coalesce(1)
      val e = intercept[Exception] {
        Amqp10Wire.deliver(records, "127.0.0.1", server.port)
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("link credit exhausted")),
        chain(e).mkString(" | "))
      // the two credited transfers landed before the stop
      assert(server.received.size == 2)
    } finally server.stop()
  }
}
