package graft

import graft.streaming.{CloudWire, KinesisMockServer, PubSubMockServer, Sinks}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Pub/Sub + Kinesis wire round-trips (streaming/CloudWire.scala):
  * renderer spool rows cross a real socket speaking each provider's
  * public protocol; exact payload bytes and metadata assert on the mock
  * side, response contracts (id arity, shard routing) on the client. */
class CloudWireSpec extends GraftSuite {

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

  test("PubSub: base64 data survives byte-exact; attributes carry the " +
      "merged metadata; one messageId per message") {
    val server = PubSubMockServer.start()
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_pswire").toString
      Sinks.PubSubSink("top1", spool).publish(tasks).collect()
      val records = spark.read.parquet(spool)
      assert(CloudWire.deliverPubSub(records, server.endpoint, "proj7") == 3L)

      val got = server.received.asScala
      assert(got.size == 3)
      got.foreach { r =>
        assert(r.project == "proj7" && r.topic == "top1")
      }
      val bodies = got.map(r => new String(r.data, "UTF-8")).toSet
      assert(bodies == Set("""{"user":"u7","π":3.14}""",
        """{"id":42}""", """{"id":43}"""))
      val e1 = got.find(r =>
        new String(r.data, "UTF-8") == """{"user":"u7","π":3.14}""").get
      assert(e1.attributes("event-id") == "e1")
      assert(e1.attributes("topic") == "order.created")
      assert(e1.attributes("trace") == "abc")

      // protocol validation: empty messages rejected
      val client = java.net.http.HttpClient.newHttpClient()
      val bad = client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"${server.endpoint}/v1/projects/p/topics/t:publish"))
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString("""{"messages":[]}"""))
        .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 400)
      assert(got.size == 3)
    } finally server.stop()
  }

  test("Kinesis: PutRecord round-trip — JMESPath partition keys route " +
      "same-key to same-shard, payload bytes exact") {
    val server = KinesisMockServer.start()
    try {
      val spool = java.nio.file.Files
        .createTempDirectory("graft_kinwire").toString
      // partition key from the payload's `user` (JMESPath template) with
      // event-id fallback — the renderer's contract
      Sinks.KinesisSink("stream1", spool, partitionKeyTemplate = "user")
        .publish(tasks).collect()
      val records = spark.read.parquet(spool)
      assert(CloudWire.deliverKinesis(records, server.endpoint) == 3L)

      val got = server.received.asScala
      assert(got.size == 3 && got.forall(_.stream == "stream1"))
      val byKey = got.groupBy(_.partitionKey)
      // e1 keyed by payload user u7; e2/e3 fall back to event ids
      assert(byKey.keySet == Set("u7", "e2", "e3"))
      assert(new String(byKey("u7").head.data, "UTF-8") ==
        """{"user":"u7","π":3.14}""")

      // same key → same shard (md5 routing): deliver e1 again
      CloudWire.deliverKinesis(records.filter(col("partition_key") === "u7"),
        server.endpoint)
      val shards = server.received.asScala
        .filter(_.partitionKey == "u7").map(_.shardId).toSet
      assert(shards.size == 1, s"same key split across shards: $shards")

      // unknown target rejected
      val client = java.net.http.HttpClient.newHttpClient()
      val bad = client.send(java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(server.endpoint))
        .header("Content-Type", "application/x-amz-json-1.1")
        .header("X-Amz-Target", "Kinesis_20131202.DeleteStream")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString("{}"))
        .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 400)
    } finally server.stop()
  }
}
