package graft.streaming

import org.apache.spark.sql.DataFrame

/** Wire-level round-trips for the GCP Pub/Sub and AWS Kinesis sinks —
  * the [[SqsWire]] pattern (reference `internal/destinationmockserver/`)
  * extended to two more providers, each speaking its PUBLIC wire
  * protocol over a real TCP socket with no SDK and no broker:
  *
  *   - Pub/Sub: the REST publish shape
  *     (`POST /v1/projects/{p}/topics/{t}:publish`, messages carry
  *     base64 `data` + string `attributes`; the response returns one
  *     `messageIds` entry per message) — reference
  *     `destgcppubsub/destgcppubsub.go:160-176`.
  *   - Kinesis: the AWS JSON-1.1 protocol
  *     (`X-Amz-Target: Kinesis_20131202.PutRecord`, base64 `Data`,
  *     `PartitionKey`; the response carries `ShardId` +
  *     `SequenceNumber`) — reference
  *     `destawskinesis/destawskinesis.go:186-249`. The mock routes
  *     partition keys to shards by md5 bucket, like the service, so a
  *     test can assert same-key → same-shard.
  *
  * Delivery legs consume the EXACT spool rows the renderers emit and
  * verify the response contracts (id-per-message, shard echo); payload
  * bytes are asserted exactly on the mock side in the spec. Scale shape:
  * `mapPartitions`, one HTTP client per partition. */
object CloudWire {

  /** POST each rendered Pub/Sub record (pubsub_topic, message_data,
    * attributes) to `endpoint`'s REST publish route, one message per
    * request (the renderer's rows are per-message; batching is a client
    * policy, not a wire requirement). Returns messages acknowledged.
    * A response whose messageIds arity mismatches throws. */
  def deliverPubSub(records: DataFrame, endpoint: String,
                    project: String = "p1"): Long = {
    val spark2 = records.sparkSession
    import spark2.implicits._
    val rows = records.select("pubsub_topic", "message_data", "attributes")
      .as[(String, Array[Byte], Map[String, String])]
    rows.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.map { case (topic, data, attrs) =>
        val root = mapper.createObjectNode()
        val msgs = root.putArray("messages")
        val m = msgs.addObject()
        m.put("data", java.util.Base64.getEncoder.encodeToString(data))
        val an = m.putObject("attributes")
        attrs.toSeq.sortBy(_._1).foreach { case (k, v) => an.put(k, v) }
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"$endpoint/v1/projects/$project/topics/$topic:publish"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers
            .ofString(mapper.writeValueAsString(root)))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"publish failed: HTTP ${resp.statusCode()} ${resp.body()}")
        val ids = mapper.readTree(resp.body()).get("messageIds")
        require(ids != null && ids.size == 1,
          s"expected one messageId, got ${resp.body()}")
        1L
      }
    }.rdd.fold(0L)(_ + _) // fold: empty delivery returns 0, not UnsupportedOperationException
  }

  /** POST each rendered Kinesis record (stream_name, partition_key,
    * record_data) as a `PutRecord`. Returns records acknowledged; a
    * response missing ShardId/SequenceNumber throws. */
  def deliverKinesis(records: DataFrame, endpoint: String): Long = {
    val spark2 = records.sparkSession
    import spark2.implicits._
    val rows = records.select("stream_name", "partition_key", "record_data")
      .as[(String, String, Array[Byte])]
    rows.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.map { case (stream, key, data) =>
        val root = mapper.createObjectNode()
        root.put("StreamName", stream)
        root.put("PartitionKey", key)
        root.put("Data", java.util.Base64.getEncoder.encodeToString(data))
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
          .header("Content-Type", "application/x-amz-json-1.1")
          .header("X-Amz-Target", "Kinesis_20131202.PutRecord")
          .POST(java.net.http.HttpRequest.BodyPublishers
            .ofString(mapper.writeValueAsString(root)))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"PutRecord failed: HTTP ${resp.statusCode()} ${resp.body()}")
        val r = mapper.readTree(resp.body())
        require(r.hasNonNull("ShardId") && r.hasNonNull("SequenceNumber"),
          s"malformed PutRecord response: ${resp.body()}")
        1L
      }
    }.rdd.fold(0L)(_ + _) // fold: empty delivery returns 0, not UnsupportedOperationException
  }
}

/** Pub/Sub as a FIRST-CLASS delivery sink in the streaming loop, with
  * BATCHED publishes: the REST publish route accepts up to 1000 messages
  * per call, so the request count at high fanout drops by the batch
  * size. The publish call is atomic per request (the service assigns ids
  * to ALL messages or errors the call — there are no per-message
  * results), so branching is per CHUNK: an errored call maps every task
  * in it to a failed attempt; tasks in other chunks are unaffected.
  * Reference shape: `destgcppubsub/destgcppubsub.go:160-176`. */
final case class PubSubHttpSink(pubsubTopic: String, endpoint: String,
                                project: String = "p1",
                                deliveryMetadata: Map[String, String] = Map.empty,
                                timeoutMillis: Int = 5000,
                                batchSize: Int = 100)
  extends Sinks.Sink {
  require(batchSize >= 1 && batchSize <= 1000,
    s"Pub/Sub batch size must be 1..1000, got $batchSize")
  val destType = "gcp_pubsub"

  override def publish(tasks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = tasks.sparkSession
    import spark.implicits._
    val (tpc, ep, proj, timeout, bsz) =
      (pubsubTopic, endpoint, project, timeoutMillis, batchSize)
    val rows = tasks
      .withColumn("meta_json",
        to_json(Sinks.makeMetadataExpr(deliveryMetadata)))
      .select(col("event_id"), col("tenant_id"), col("destination_id"),
        col("attempt").cast("int").as("attempt"), col("manual"),
        col("event_time"), col("topic"), col("data"), col("metadata"),
        col("eligible_for_retry"), col("meta_json"))
      .as[(String, String, String, Int, Boolean, java.sql.Timestamp,
        String, String, Map[String, String], Boolean, String)]
    val outcomes = rows.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeout.toLong)).build()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.grouped(bsz).flatMap { chunk =>
        val attemptTime = new java.sql.Timestamp(System.currentTimeMillis())
        def outs(status: String, code: String) = chunk.map {
          case (eid, tid, did, attempt, manual, eventTime, topic,
              data, metadata, elig, _) =>
            Sinks.HttpOutcome(s"att_$eid:$did:$attempt", eid, tid, did,
              "gcp_pubsub", attempt, manual, status, attemptTime, code,
              eventTime, topic, data, metadata, elig, null)
        }
        try {
          val root = mapper.createObjectNode()
          val msgs = root.putArray("messages")
          chunk.foreach { case (_, _, _, _, _, _, _, data, _, _, metaJson) =>
            val m = msgs.addObject()
            m.put("data", java.util.Base64.getEncoder
              .encodeToString(data.getBytes("UTF-8")))
            val an = m.putObject("attributes")
            val meta = graft.functions.JsonMatch.parse(metaJson)
            val fields = meta.fields()
            while (fields.hasNext) {
              val e = fields.next(); an.put(e.getKey, e.getValue.asText)
            }
          }
          val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(
              s"$ep/v1/projects/$proj/topics/$tpc:publish"))
            .timeout(java.time.Duration.ofMillis(timeout.toLong))
            .header("Content-Type", "application/json")
            .POST(java.net.http.HttpRequest.BodyPublishers
              .ofString(mapper.writeValueAsString(root)))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() != 200)
            outs("failed", resp.statusCode().toString)
          else {
            val ids = mapper.readTree(resp.body()).get("messageIds")
            if (ids == null || ids.size != chunk.size)
              // an id-per-message response is the publish contract; an
              // arity mismatch means the call cannot be trusted
              outs("failed", "arity_mismatch")
            else outs("success", "200")
          }
        } catch {
          case _: java.net.http.HttpTimeoutException => outs("failed", "timeout")
          case e: Exception =>
            outs("failed", "connection_error")
        }
      }
    }.toDF()
    outcomes.localCheckpoint(true)
  }
}

/** Kinesis as a FIRST-CLASS delivery sink in the streaming loop, with
  * BATCHED `PutRecords` (≤500 records/call) and PER-RECORD result
  * branching: the response carries one positional result per record —
  * a ShardId/SequenceNumber for successes, an ErrorCode for failures —
  * so a partial-batch failure maps each failed record to its own failed
  * attempt while same-call successes succeed, exactly the reference's
  * per-delivery semantics at a tenth the request count. Rendering
  * matches [[Sinks.KinesisSink]] (JMESPath partition key with event-id
  * fallback; optional metadata envelope) — reference
  * `destawskinesis/destawskinesis.go:186-249`. */
final case class KinesisHttpSink(streamName: String, endpoint: String,
                                 partitionKeyTemplate: String = "",
                                 metadataInPayload: Boolean = false,
                                 deliveryMetadata: Map[String, String] = Map.empty,
                                 timeoutMillis: Int = 5000,
                                 batchSize: Int = 100)
  extends Sinks.Sink {
  require(batchSize >= 1 && batchSize <= 500,
    s"Kinesis PutRecords batch size must be 1..500, got $batchSize")
  val destType = "aws_kinesis"

  override def publish(tasks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = tasks.sparkSession
    import spark.implicits._
    val (stream, ep, timeout, bsz) =
      (streamName, endpoint, timeoutMillis, batchSize)
    val meta = to_json(Sinks.makeMetadataExpr(deliveryMetadata))
    val payload =
      if (metadataInPayload)
        concat(lit("""{"metadata":"""), meta,
          lit(""","data":"""), col("data"), lit("}"))
      else col("data")
    val rows = tasks
      .withColumn("record_data", payload)
      .withColumn("partition_key",
        graft.functions.PartitionKey
          .column(partitionKeyTemplate, col("data"), col("event_id")))
      .select(col("event_id"), col("tenant_id"), col("destination_id"),
        col("attempt").cast("int").as("attempt"), col("manual"),
        col("event_time"), col("topic"), col("data"), col("metadata"),
        col("eligible_for_retry"), col("partition_key"), col("record_data"))
      .as[(String, String, String, Int, Boolean, java.sql.Timestamp,
        String, String, Map[String, String], Boolean, String, String)]
    val outcomes = rows.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeout.toLong)).build()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.grouped(bsz).flatMap { chunk =>
        val attemptTime = new java.sql.Timestamp(System.currentTimeMillis())
        def outFor(i: Int)(status: String, code: String) = {
          val (eid, tid, did, attempt, manual, eventTime, topic,
            data, metadata, elig, _, _) = chunk(i)
          Sinks.HttpOutcome(s"att_$eid:$did:$attempt", eid, tid, did,
            "aws_kinesis", attempt, manual, status, attemptTime, code,
            eventTime, topic, data, metadata, elig, null)
        }
        try {
          val root = mapper.createObjectNode()
          root.put("StreamName", stream)
          val recs = root.putArray("Records")
          chunk.foreach { case (_, _, _, _, _, _, _, _, _, _, key, data) =>
            val r = recs.addObject()
            r.put("PartitionKey", key)
            r.put("Data", java.util.Base64.getEncoder
              .encodeToString(data.getBytes("UTF-8")))
          }
          val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(ep))
            .timeout(java.time.Duration.ofMillis(timeout.toLong))
            .header("Content-Type", "application/x-amz-json-1.1")
            .header("X-Amz-Target", "Kinesis_20131202.PutRecords")
            .POST(java.net.http.HttpRequest.BodyPublishers
              .ofString(mapper.writeValueAsString(root)))
            .build()
          val resp = client.send(req,
            java.net.http.HttpResponse.BodyHandlers.ofString())
          if (resp.statusCode() != 200)
            chunk.indices.map(i =>
              outFor(i)("failed", resp.statusCode().toString))
          else {
            val r = mapper.readTree(resp.body())
            val results = r.get("Records")
            if (results == null || results.size != chunk.size)
              chunk.indices.map(i => outFor(i)("failed", "arity_mismatch"))
            else chunk.indices.map { i =>
              val res = results.get(i)
              if (res.hasNonNull("ErrorCode"))
                outFor(i)("failed", res.get("ErrorCode").asText)
              else if (res.hasNonNull("ShardId") &&
                  res.hasNonNull("SequenceNumber"))
                outFor(i)("success", "200")
              else outFor(i)("failed", "malformed_result")
            }
          }
        } catch {
          case _: java.net.http.HttpTimeoutException =>
            chunk.indices.map(i => outFor(i)("failed", "timeout"))
          case e: Exception =>
            chunk.indices.map(i => outFor(i)("failed", "connection_error"))
        }
      }
    }.toDF()
    outcomes.localCheckpoint(true)
  }
}

/** In-process, socket-level Pub/Sub fake: validates the REST publish
  * shape, base64-decodes and stores each message, answers with one
  * generated id per message. */
object PubSubMockServer {
  final case class Received(project: String, topic: String,
                            data: Array[Byte], attributes: Map[String, String])

  final class Server(srv: com.sun.net.httpserver.HttpServer,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received],
                     val requests: java.util.concurrent.atomic.AtomicLong) {
    def port: Int = srv.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def stop(): Unit = {
      srv.stop(0)
      // shut the non-daemon executor down so forked JVMs can exit
      srv.getExecutor match {
        case es: java.util.concurrent.ExecutorService => es.shutdownNow(); ()
        case _ => ()
      }
    }
  }

  private val Publish = "/v1/projects/([^/]+)/topics/([^/]+):publish".r

  /** `failTopics`: publishes to these topics answer 429 RESOURCE_EXHAUSTED
    * (the whole-call failure mode — Pub/Sub has no per-message results). */
  def start(failTopics: Set[String] = Set.empty): Server = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    val requests = new java.util.concurrent.atomic.AtomicLong(0L)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(code: Int, body: String): Unit = {
        val b = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, b.length.toLong)
        ex.getResponseBody.write(b); ex.close()
      }
      try {
        requests.incrementAndGet()
        (ex.getRequestMethod, ex.getRequestURI.getPath) match {
          case ("POST", Publish(_, topic)) if failTopics.contains(topic) =>
            respond(429,
              """{"error":{"code":429,"status":"RESOURCE_EXHAUSTED"}}""")
          case ("POST", Publish(project, topic)) =>
            val root = mapper.readTree(
              new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
            val msgs = root.get("messages")
            if (msgs == null || !msgs.isArray || msgs.size == 0)
              respond(400, """{"error":{"code":400,"status":"INVALID_ARGUMENT"}}""")
            else {
              val ids = new scala.collection.mutable.ArrayBuffer[String]
              (0 until msgs.size).foreach { i =>
                val m = msgs.get(i)
                val data = java.util.Base64.getDecoder
                  .decode(Option(m.get("data")).map(_.asText).getOrElse(""))
                val attrs = Option(m.get("attributes")).map { an =>
                  val it = an.fields()
                  val b = Map.newBuilder[String, String]
                  while (it.hasNext) {
                    val e = it.next(); b += e.getKey -> e.getValue.asText
                  }
                  b.result()
                }.getOrElse(Map.empty[String, String])
                received.add(Received(project, topic, data, attrs))
                ids += java.util.UUID.randomUUID().toString
              }
              respond(200, ids.map(i => "\"" + i + "\"")
                .mkString("""{"messageIds":[""", ",", "]}"))
            }
          case _ => respond(404, """{"error":{"code":404,"status":"NOT_FOUND"}}""")
        }
      } catch {
        case _: Exception =>
          respond(400, """{"error":{"code":400,"status":"INVALID_ARGUMENT"}}""")
      }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    new Server(srv, received, requests)
  }
}

/** In-process, socket-level Kinesis fake: AWS JSON-1.1 `PutRecord` AND
  * the batched `PutRecords` (≤500/call, positional per-record results),
  * md5-bucketed shard routing (same partition key → same shard, like the
  * service's hash-key ranges), monotone sequence numbers per shard. */
object KinesisMockServer {
  final case class Received(stream: String, partitionKey: String,
                            shardId: String, data: Array[Byte])

  final class Server(srv: com.sun.net.httpserver.HttpServer,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received],
                     val requests: java.util.concurrent.atomic.AtomicLong) {
    def port: Int = srv.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port/"
    def stop(): Unit = {
      srv.stop(0)
      // shut the non-daemon executor down so forked JVMs can exit
      srv.getExecutor match {
        case es: java.util.concurrent.ExecutorService => es.shutdownNow(); ()
        case _ => ()
      }
    }
  }

  /** `failKeysContaining`: PutRecords entries whose partition key matches
    * get a per-record ProvisionedThroughputExceededException result and
    * are stored nowhere — the partial-batch-failure injection. */
  def start(shards: Int = 4,
            failKeysContaining: Option[String] = None): Server = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    val requests = new java.util.concurrent.atomic.AtomicLong(0L)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val seq = new java.util.concurrent.atomic.AtomicLong(0L)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(code: Int, body: String): Unit = {
        val b = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
        ex.sendResponseHeaders(code, b.length.toLong)
        ex.getResponseBody.write(b); ex.close()
      }
      def err(typ: String): Unit = respond(400, s"""{"__type":"$typ"}""")
      def shardOf(key: String): String = {
        // md5-bucket shard routing (the service hashes the partition
        // key into a 128-bit range split across shards)
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8"))
        val bucket = math.floorMod(
          java.nio.ByteBuffer.wrap(h).getLong, shards.toLong).toInt
        f"shardId-$bucket%012d"
      }
      try {
        requests.incrementAndGet()
        val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
        if (ex.getRequestMethod != "POST") err("UnknownOperationException")
        else if (target == "Kinesis_20131202.PutRecord") {
          val root = mapper.readTree(
            new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          val stream = Option(root.get("StreamName")).map(_.asText).getOrElse("")
          val key = Option(root.get("PartitionKey")).map(_.asText).getOrElse("")
          val dataB64 = Option(root.get("Data")).map(_.asText).getOrElse("")
          if (stream.isEmpty || key.isEmpty) err("ValidationException")
          else {
            val data = java.util.Base64.getDecoder.decode(dataB64)
            val shardId = shardOf(key)
            received.add(Received(stream, key, shardId, data))
            respond(200,
              s"""{"ShardId":"$shardId","SequenceNumber":"${seq.incrementAndGet()}"}""")
          }
        } else if (target == "Kinesis_20131202.PutRecords") {
          val root = mapper.readTree(
            new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          val stream = Option(root.get("StreamName")).map(_.asText).getOrElse("")
          val recs = Option(root.get("Records")).filter(_.isArray)
          if (stream.isEmpty || recs.forall(_.size == 0))
            err("ValidationException")
          else if (recs.exists(_.size > 500))
            err("ValidationException")
          else {
            val rs = recs.get
            var failed = 0
            val results = (0 until rs.size).map { i =>
              val r = rs.get(i)
              val key = Option(r.get("PartitionKey")).map(_.asText).getOrElse("")
              val dataB64 = Option(r.get("Data")).map(_.asText).getOrElse("")
              if (key.isEmpty) {
                failed += 1
                """{"ErrorCode":"ValidationException","ErrorMessage":"missing PartitionKey"}"""
              } else if (failKeysContaining.exists(key.contains)) {
                failed += 1
                """{"ErrorCode":"ProvisionedThroughputExceededException","ErrorMessage":"rate exceeded"}"""
              } else {
                val data = java.util.Base64.getDecoder.decode(dataB64)
                val shardId = shardOf(key)
                received.add(Received(stream, key, shardId, data))
                s"""{"ShardId":"$shardId","SequenceNumber":"${seq.incrementAndGet()}"}"""
              }
            }
            respond(200, s"""{"FailedRecordCount":$failed,""" +
              s""""Records":[${results.mkString(",")}]}""")
          }
        } else err("UnknownOperationException")
      } catch { case _: Exception => err("SerializationException") }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    new Server(srv, received, requests)
  }
}
