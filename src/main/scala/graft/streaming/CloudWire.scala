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

/** In-process, socket-level Pub/Sub fake: validates the REST publish
  * shape, base64-decodes and stores each message, answers with one
  * generated id per message. */
object PubSubMockServer {
  final case class Received(project: String, topic: String,
                            data: Array[Byte], attributes: Map[String, String])

  final class Server(srv: com.sun.net.httpserver.HttpServer,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received]) {
    def port: Int = srv.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def stop(): Unit = srv.stop(0)
  }

  private val Publish = "/v1/projects/([^/]+)/topics/([^/]+):publish".r

  def start(): Server = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(code: Int, body: String): Unit = {
        val b = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, b.length.toLong)
        ex.getResponseBody.write(b); ex.close()
      }
      try {
        (ex.getRequestMethod, ex.getRequestURI.getPath) match {
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
    new Server(srv, received)
  }
}

/** In-process, socket-level Kinesis fake: AWS JSON-1.1 `PutRecord`,
  * md5-bucketed shard routing (same partition key → same shard, like the
  * service's hash-key ranges), monotone sequence numbers per shard. */
object KinesisMockServer {
  final case class Received(stream: String, partitionKey: String,
                            shardId: String, data: Array[Byte])

  final class Server(srv: com.sun.net.httpserver.HttpServer,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received]) {
    def port: Int = srv.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port/"
    def stop(): Unit = srv.stop(0)
  }

  def start(shards: Int = 4): Server = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
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
      try {
        val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
        if (ex.getRequestMethod != "POST" || target != "Kinesis_20131202.PutRecord")
          err("UnknownOperationException")
        else {
          val root = mapper.readTree(
            new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          val stream = Option(root.get("StreamName")).map(_.asText).getOrElse("")
          val key = Option(root.get("PartitionKey")).map(_.asText).getOrElse("")
          val dataB64 = Option(root.get("Data")).map(_.asText).getOrElse("")
          if (stream.isEmpty || key.isEmpty) err("ValidationException")
          else {
            val data = java.util.Base64.getDecoder.decode(dataB64)
            // md5-bucket shard routing (the service hashes the partition
            // key into a 128-bit range split across shards)
            val h = java.security.MessageDigest.getInstance("MD5")
              .digest(key.getBytes("UTF-8"))
            val bucket = math.floorMod(
              java.nio.ByteBuffer.wrap(h).getLong, shards.toLong).toInt
            val shardId = f"shardId-$bucket%012d"
            received.add(Received(stream, key, shardId, data))
            respond(200,
              s"""{"ShardId":"$shardId","SequenceNumber":"${seq.incrementAndGet()}"}""")
          }
        }
      } catch { case _: Exception => err("SerializationException") }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    new Server(srv, received)
  }
}
