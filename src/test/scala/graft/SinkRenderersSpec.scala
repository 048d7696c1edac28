package graft

import graft.streaming.Sinks
import org.apache.spark.sql.functions._

/** Per-provider record-shape fixtures for the round-3 sink renderers
  * (reference `internal/destregistry/providers/`): each test pins the exact
  * fields the provider's Format() would put on the wire. */
class SinkRenderersSpec extends GraftSuite {

  private def ts(s: Int) = new java.sql.Timestamp(s * 1000L)

  private def tasks = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      ("e1", "t1", "d1", 1, false, ts(10), "order.created", """{"user":"u7","n":1}""",
        Map("trace" -> "abc"), true))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry")
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  test("SQS: body + single String metadata attribute (destawssqs.go:137-155)") {
    val dir = tmp("sqs")
    val out = Sinks.SqsSink("https://sqs.local/q1", dir).publish(tasks).collect()
    assert(out.length == 1 && out.head.getAs[String]("destination_type") == "aws_sqs")
    val rec = spark.read.parquet(dir).head()
    assert(rec.getAs[String]("queue_url") == "https://sqs.local/q1")
    assert(rec.getAs[String]("message_body") == """{"user":"u7","n":1}""")
    val attrs = rec.getMap[String, String](rec.fieldIndex("message_attributes"))
    val meta = graft.functions.JsonMatch.parse(attrs("metadata"))
    // system fields + event metadata merged, event wins (basepublisher.go:67-94)
    assert(meta.get("event-id").asText == "e1")
    assert(meta.get("topic").asText == "order.created")
    assert(meta.get("trace").asText == "abc")
    assert(meta.has("timestamp"))
  }

  test("Kinesis: partition key from JMESPath template, raw data (destawskinesis.go:186-249)") {
    val dir = tmp("kinesis")
    Sinks.KinesisSink("stream1", dir, partitionKeyTemplate = "user").publish(tasks).collect()
    val rec = spark.read.parquet(dir).head()
    assert(rec.getAs[String]("stream_name") == "stream1")
    assert(rec.getAs[String]("partition_key") == "u7")
    assert(new String(rec.getAs[Array[Byte]]("record_data"), "UTF-8") == """{"user":"u7","n":1}""")

    // fallback to event id when the template misses (partitionkey.go:30-38)
    val dir2 = tmp("kinesis2")
    Sinks.KinesisSink("stream1", dir2, partitionKeyTemplate = "absent_key").publish(tasks).collect()
    assert(spark.read.parquet(dir2).head().getAs[String]("partition_key") == "e1")

    // metadataInPayload: {"metadata":…,"data":<raw spliced>} envelope
    val dir3 = tmp("kinesis3")
    Sinks.KinesisSink("stream1", dir3, metadataInPayload = true).publish(tasks).collect()
    val env = graft.functions.JsonMatch.parse(
      new String(spark.read.parquet(dir3).head().getAs[Array[Byte]]("record_data"), "UTF-8"))
    assert(env.get("data").get("user").asText == "u7")
    assert(env.get("metadata").get("event-id").asText == "e1")
  }

  test("PubSub: data bytes + string attributes (destgcppubsub.go:160-176)") {
    val dir = tmp("pubsub")
    Sinks.PubSubSink("top1", dir).publish(tasks).collect()
    val rec = spark.read.parquet(dir).head()
    assert(rec.getAs[String]("pubsub_topic") == "top1")
    assert(new String(rec.getAs[Array[Byte]]("message_data"), "UTF-8").contains("\"u7\""))
    val attrs = rec.getMap[String, String](rec.fieldIndex("attributes"))
    assert(attrs("event-id") == "e1" && attrs("trace") == "abc")
  }

  test("RabbitMQ: exchange + topic routing key + headers (destrabbitmq.go:134-170)") {
    val dir = tmp("rabbit")
    Sinks.RabbitMqSink("ex1", dir).publish(tasks).collect()
    val rec = spark.read.parquet(dir).head()
    assert(rec.getAs[String]("exchange") == "ex1")
    assert(rec.getAs[String]("routing_key") == "order.created")
    assert(rec.getAs[String]("content_type") == "application/json")
    assert(rec.getMap[String, String](rec.fieldIndex("headers"))("topic") == "order.created")
  }

  test("ServiceBus: body + application properties (destazureservicebus.go:127-142)") {
    val dir = tmp("sbus")
    Sinks.ServiceBusSink("q1", dir,
      deliveryMetadata = Map("env" -> "prod")).publish(tasks).collect()
    val rec = spark.read.parquet(dir).head()
    assert(rec.getAs[String]("queue_name") == "q1")
    val props = rec.getMap[String, String](rec.fieldIndex("application_properties"))
    // priority: system < delivery < event
    assert(props("env") == "prod" && props("trace") == "abc" && props("event-id") == "e1")
  }

  test("Hookdeck: token-derived URL, v0 signature over body, x-outpost headers (hookdeck.go:108-135)") {
    val token = java.util.Base64.getEncoder.encodeToString("src_123:whsec_abc".getBytes("UTF-8"))
    val dir = tmp("hookdeck")
    Sinks.HookdeckSink(token, dir).publish(tasks).collect()
    val rec = spark.read.parquet(dir).head()
    assert(rec.getAs[String]("url") == "https://hkdk.events/src_123")
    val body = rec.getAs[String]("body")
    // signature = v0= + base64(HMAC-SHA256(FULL original token, body))
    val expected = "v0=" + graft.functions.Crypto.hmacBase64(
      "HmacSHA256", token.getBytes("UTF-8"), body.getBytes("UTF-8"))
    assert(rec.getAs[String]("signature") == expected)
    val headers = rec.getMap[String, String](rec.fieldIndex("headers"))
    assert(headers("content-type") == "application/json")
    assert(headers("x-outpost-event-id") == "e1")
    assert(headers("x-outpost-trace") == "abc")
  }

  test("Hookdeck token parse rejects malformed tokens") {
    assertThrows[IllegalArgumentException](Sinks.HookdeckSink.parseToken("not-base64!!"))
    val noColon = java.util.Base64.getEncoder.encodeToString("nocolon".getBytes("UTF-8"))
    assertThrows[IllegalArgumentException](Sinks.HookdeckSink.parseToken(noColon))
  }
}
