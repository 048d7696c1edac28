package graft

import graft.streaming.{KinesisHttpSink, KinesisMockServer, PubSubHttpSink,
  PubSubMockServer, SqsHttpSink, SqsMockServer}
import org.apache.spark.sql.functions._

/** Batched delivery legs (SendMessageBatch / PutRecords / batched
  * Pub/Sub publish) against the wire mocks: full-success,
  * partial-failure, and malformed-batch coverage, with the request
  * accounting that motivates batching — at 100× fanout the request
  * count is the delivery throughput ceiling, and each batch op divides
  * it by its cap while per-record results keep attempt accounting
  * exact. */
class BatchDeliverySpec extends GraftSuite {

  private def ts(s: Int) = new java.sql.Timestamp(s * 1000L)

  /** `n` tasks on one Spark partition (deterministic chunking); every
    * 5th task is marked (event id `bad*`, body contains FAIL) for the
    * per-record failure-injection modes. */
  private def tasks(n: Int) = {
    val spark2 = spark
    import spark2.implicits._
    (0 until n).map { i =>
      val bad = i % 5 == 4
      val eid = if (bad) s"bad$i" else s"e$i"
      val data = if (bad) s"""{"i":$i,"mark":"FAIL"}""" else s"""{"i":$i}"""
      (eid, "t1", "d1", 1, false, ts(i), "order.created", data,
        Map("trace" -> s"tr$i"), true)
    }.toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
      "event_time", "topic", "data", "metadata", "eligible_for_retry")
      .coalesce(1)
  }

  // ---------------- SQS SendMessageBatch ----------------

  test("SQS batch: full success — 23 tasks in 3 requests, per-entry MD5 " +
      "verified, bodies land exactly") {
    val server = SqsMockServer.start()
    try {
      val out = SqsHttpSink(s"${server.endpoint}123/q", server.endpoint,
        batchSize = 10).publish(tasks(23))
        .select("status", "code").collect()
      assert(out.length == 23 && out.forall(_.getString(0) == "success"))
      assert(server.received.size == 23)
      // ceil(23/10) = 3 requests — the 10× reduction evidence
      assert(server.requests.get() == 3L, s"requests=${server.requests.get()}")
      import scala.jdk.CollectionConverters._
      assert(server.received.asScala.map(_.body).toSet
        .contains("""{"i":0}"""))
    } finally server.stop()
  }

  test("SQS batch: partial failure — injected per-entry failures become " +
      "their own failed attempts; same-call successes still succeed") {
    val server = SqsMockServer.start(failBodiesContaining = Some("FAIL"))
    try {
      val out = SqsHttpSink(s"${server.endpoint}123/q", server.endpoint,
        batchSize = 10).publish(tasks(20))
        .select("event_id", "status", "code").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val (bad, good) = out.partition(_._1.startsWith("bad"))
      assert(bad.length == 4 &&
        bad.forall(o => o._2 == "failed" && o._3 == "InternalError"), bad.toSeq)
      assert(good.length == 16 && good.forall(_._2 == "success"), good.toSeq)
      // failed entries are stored NOWHERE
      assert(server.received.size == 16)
      assert(server.requests.get() == 2L)
    } finally server.stop()
  }

  test("SQS batch: corrupted MD5 echoes fail every entry (the per-entry " +
      "verification is real); malformed batches are whole-call 400s") {
    val corrupt = SqsMockServer.start(corruptMd5 = true)
    try {
      val out = SqsHttpSink(s"${corrupt.endpoint}q", corrupt.endpoint,
        batchSize = 10).publish(tasks(5))
        .select("status", "code").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(out.length == 5 && out.forall(_ == ("failed", "md5_mismatch")),
        out.toSeq)
    } finally corrupt.stop()

    val server = SqsMockServer.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(body: String): (Int, String) = {
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(server.endpoint))
            .header("Content-Type", "application/x-amz-json-1.0")
            .header("X-Amz-Target", "AmazonSQS.SendMessageBatch")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      def entries(ids: Seq[String]): String = ids.map(i =>
        s"""{"Id":"$i","MessageBody":"b$i"}""").mkString("[", ",", "]")
      // >10 entries
      val (c1, b1) = post(s"""{"QueueUrl":"q","Entries":${
        entries((0 to 10).map(_.toString))}}""")
      assert(c1 == 400 && b1.contains("TooManyEntriesInBatchRequest"))
      // duplicate ids
      val (c2, b2) = post(s"""{"QueueUrl":"q","Entries":${
        entries(Seq("0", "0"))}}""")
      assert(c2 == 400 && b2.contains("BatchEntryIdsNotDistinct"))
      // empty batch
      val (c3, b3) = post("""{"QueueUrl":"q","Entries":[]}""")
      assert(c3 == 400 && b3.contains("EmptyBatchRequest"))
      // rejected calls store nothing
      assert(server.received.size == 0)
    } finally server.stop()
  }

  test("SQS single-record path unchanged: batchSize=1 still sends " +
      "per-record SendMessage") {
    val server = SqsMockServer.start()
    try {
      val out = SqsHttpSink(s"${server.endpoint}q", server.endpoint)
        .publish(tasks(4)).select("status").collect()
      assert(out.length == 4 && out.forall(_.getString(0) == "success"))
      assert(server.requests.get() == 4L) // one request per record
    } finally server.stop()
  }

  // ---------------- Kinesis PutRecords ----------------

  test("Kinesis PutRecords: full success — one request for 23 records, " +
      "md5 shard routing, payload bytes exact") {
    val server = KinesisMockServer.start()
    try {
      val out = KinesisHttpSink("s1", server.endpoint, batchSize = 100)
        .publish(tasks(23)).select("status", "code").collect()
      assert(out.length == 23 && out.forall(_.getString(0) == "success"))
      assert(server.received.size == 23)
      assert(server.requests.get() == 1L, s"requests=${server.requests.get()}")
      import scala.jdk.CollectionConverters._
      val got = server.received.asScala.toSeq
      // partition key = event id (empty template fallback); same key →
      // same md5 shard as the single-record op
      got.foreach { r =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(r.partitionKey.getBytes("UTF-8"))
        val bucket = math.floorMod(
          java.nio.ByteBuffer.wrap(h).getLong, 4L).toInt
        assert(r.shardId == f"shardId-$bucket%012d")
      }
      assert(got.map(r => new String(r.data, "UTF-8")).toSet
        .contains("""{"i":0}"""))
    } finally server.stop()
  }

  test("Kinesis PutRecords: partial failure — per-record ErrorCode maps " +
      "to its own failed attempt; successes in the same call succeed") {
    val server = KinesisMockServer.start(failKeysContaining = Some("bad"))
    try {
      val out = KinesisHttpSink("s1", server.endpoint, batchSize = 100)
        .publish(tasks(20))
        .select("event_id", "status", "code").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val (bad, good) = out.partition(_._1.startsWith("bad"))
      assert(bad.length == 4 && bad.forall(o => o._2 == "failed" &&
        o._3 == "ProvisionedThroughputExceededException"), bad.toSeq)
      assert(good.length == 16 && good.forall(_._2 == "success"))
      assert(server.received.size == 16)
      assert(server.requests.get() == 1L)
    } finally server.stop()
  }

  test("Kinesis PutRecords: malformed batches are whole-call errors; " +
      "metadata envelope renders when configured") {
    val server = KinesisMockServer.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(body: String): (Int, String) = {
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(server.endpoint))
            .header("Content-Type", "application/x-amz-json-1.1")
            .header("X-Amz-Target", "Kinesis_20131202.PutRecords")
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
            .build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), resp.body())
      }
      // empty records / missing stream
      assert(post("""{"StreamName":"s1","Records":[]}""")._1 == 400)
      assert(post("""{"Records":[{"PartitionKey":"k","Data":"aGk="}]}""")._1 == 400)
      // >500 records
      val many = (0 until 501).map(i =>
        s"""{"PartitionKey":"k$i","Data":"aGk="}""").mkString("[", ",", "]")
      assert(post(s"""{"StreamName":"s1","Records":$many}""")._1 == 400)
      assert(server.received.size == 0)

      // metadata-in-payload envelope: {"metadata":…,"data":<raw>}
      KinesisHttpSink("s1", server.endpoint, metadataInPayload = true,
        batchSize = 100).publish(tasks(2)).collect()
      import scala.jdk.CollectionConverters._
      val bodies = server.received.asScala.map(r => new String(r.data, "UTF-8"))
      assert(bodies.forall(b => b.startsWith("""{"metadata":""") &&
        b.contains(""""data":{"i":""")), bodies.toSeq)
    } finally server.stop()
  }

  // ---------------- Pub/Sub batched publish ----------------

  test("Pub/Sub batch: full success — 23 messages in 3 requests with " +
      "attributes; an id-per-message response is enforced") {
    val server = PubSubMockServer.start()
    try {
      val out = PubSubHttpSink("topic1", server.endpoint, batchSize = 10)
        .publish(tasks(23)).select("status").collect()
      assert(out.length == 23 && out.forall(_.getString(0) == "success"))
      assert(server.received.size == 23)
      assert(server.requests.get() == 3L, s"requests=${server.requests.get()}")
      import scala.jdk.CollectionConverters._
      val got = server.received.asScala.toSeq
      assert(got.forall(_.topic == "topic1"))
      // attributes carry the layered delivery metadata
      val first = got.find(r =>
        new String(r.data, "UTF-8") == """{"i":0}""").get
      assert(first.attributes("event-id") == "e0")
      assert(first.attributes("topic") == "order.created")
    } finally server.stop()
  }

  test("Pub/Sub batch: a failed publish call fails exactly its chunk " +
      "(publish is atomic per request — no per-message results)") {
    val server = PubSubMockServer.start(failTopics = Set("throttled"))
    try {
      val out = PubSubHttpSink("throttled", server.endpoint, batchSize = 10)
        .publish(tasks(20)).select("status", "code").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(out.length == 20 && out.forall(_ == ("failed", "429")), out.toSeq)
      assert(server.received.size == 0)
      // the healthy topic on the same server still succeeds
      val ok = PubSubHttpSink("fine", server.endpoint, batchSize = 10)
        .publish(tasks(5)).select("status").collect()
      assert(ok.forall(_.getString(0) == "success"))
    } finally server.stop()
  }
}
