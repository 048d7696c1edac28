package graft.streaming

import org.apache.spark.sql.DataFrame

/** WIRE-LEVEL SQS ROUND-TRIP WITHOUT A BROKER — the reference's
  * destination-mock-server idea (`internal/destinationmockserver/
  * server.go`, `router.go`: a wire-shaped fake the SDK tests publish
  * through) applied to the SQS provider (`internal/destregistry/
  * providers/destawssqs/destawssqs.go:137-155`):
  *
  *   - [[SqsWire.deliver]] takes the EXACT record rows [[Sinks.SqsSink]]
  *     renders (queue_url, message_body, message_attributes) and POSTs
  *     each one over a real TCP socket speaking the public AWS SQS
  *     JSON-1.0 protocol (`X-Amz-Target: AmazonSQS.SendMessage`,
  *     `Content-Type: application/x-amz-json-1.0`), then — like the AWS
  *     SDK — verifies the `MD5OfMessageBody` / `MD5OfMessageAttributes`
  *     echoes against locally computed digests and fails the delivery on
  *     any mismatch.
  *   - [[SqsMockServer]] is the in-process, socket-level SQS fake:
  *     validates the protocol shape, stores what arrived, and answers
  *     exactly like SQS (MessageId + the two MD5s, computed server-side
  *     with the documented algorithm), so a test asserts exact bytes on
  *     both ends of a real HTTP exchange.
  *
  * Scale shape: delivery is `mapPartitions` with one HTTP client per
  * partition (the webhook sink's pattern) — each executor drains its own
  * partition; nothing funnels through the driver.
  */
object SqsWire {

  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** The documented SQS message-attribute digest: attributes in sorted
    * name order; per attribute, 4-byte big-endian length + bytes of the
    * name, the data type, a transport byte (1 = String/Number,
    * 2 = Binary), and the value. All-String here (the renderer emits one
    * String attribute). */
  private[streaming] def attributesMd5(attrs: Seq[(String, String)]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    attrs.sortBy(_._1).foreach { case (name, value) =>
      val n = name.getBytes("UTF-8")
      val t = "String".getBytes("UTF-8")
      val v = value.getBytes("UTF-8")
      out.writeInt(n.length); out.write(n)
      out.writeInt(t.length); out.write(t)
      out.writeByte(1)
      out.writeInt(v.length); out.write(v)
    }
    out.flush()
    md5Hex(bos.toByteArray)
  }

  private[streaming] def bodyMd5(body: String): String =
    md5Hex(body.getBytes("UTF-8"))

  /** POST each rendered SQS record to `endpoint` over the JSON-1.0
    * protocol and verify the MD5 echoes (the SDK's transport-corruption
    * check). Returns the number of messages delivered; ANY protocol or
    * digest failure throws — a delivery that cannot prove integrity is
    * not a delivery. */
  def deliver(records: DataFrame, endpoint: String): Long = {
    val spark2 = records.sparkSession
    import spark2.implicits._
    val rows = records.select("queue_url", "message_body", "message_attributes")
      .as[(String, String, Map[String, String])]
    rows.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      it.map { case (queueUrl, body, attrs) =>
        val root = mapper.createObjectNode()
        root.put("QueueUrl", queueUrl)
        root.put("MessageBody", body)
        val attrNode = root.putObject("MessageAttributes")
        attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val a = attrNode.putObject(k)
          a.put("DataType", "String")
          a.put("StringValue", v)
        }
        val reqBody = mapper.writeValueAsString(root)
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
          .header("Content-Type", "application/x-amz-json-1.0")
          .header("X-Amz-Target", "AmazonSQS.SendMessage")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(reqBody))
          .build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"SendMessage failed: HTTP ${resp.statusCode()} ${resp.body()}")
        val r = mapper.readTree(resp.body())
        require(r.hasNonNull("MessageId"), s"no MessageId in ${resp.body()}")
        val wantBody = bodyMd5(body)
        val gotBody = Option(r.get("MD5OfMessageBody")).map(_.asText).orNull
        require(gotBody == wantBody,
          s"MD5OfMessageBody mismatch: sent $wantBody, echoed $gotBody")
        if (attrs.nonEmpty) {
          val wantA = attributesMd5(attrs.toSeq)
          val gotA = Option(r.get("MD5OfMessageAttributes")).map(_.asText).orNull
          require(gotA == wantA,
            s"MD5OfMessageAttributes mismatch: sent $wantA, echoed $gotA")
        }
        1L
      }
    }.rdd.fold(0L)(_ + _) // fold: empty delivery returns 0, not UnsupportedOperationException
  }
}

/** SQS as a FIRST-CLASS delivery sink in the streaming loop: renders
  * each task like [[Sinks.SqsSink]] and sends it over the JSON-1.0 wire
  * per partition, branching per-record outcomes on the response exactly
  * as the webhook sink does (reference
  * `destawssqs/destawssqs.go:157-183` — publish errors become failed
  * attempts that feed the retry loop, not exceptions). The endpoint is
  * the SQS-compatible base URL (AWS, localstack, or the mock). */
final case class SqsHttpSink(queueUrl: String, endpoint: String,
                             deliveryMetadata: Map[String, String] = Map.empty,
                             timeoutMillis: Int = 5000,
                             batchSize: Int = 1)
  extends Sinks.Sink {
  require(batchSize >= 1 && batchSize <= 10,
    s"SQS batch size must be 1..10 (SendMessageBatch cap), got $batchSize")
  val destType = "aws_sqs"

  override def publish(tasks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = tasks.sparkSession
    import spark.implicits._
    val (qUrl, ep, timeout, bsz) = (queueUrl, endpoint, timeoutMillis, batchSize)
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
      type Task = (String, String, String, Int, Boolean, java.sql.Timestamp,
        String, String, Map[String, String], Boolean, String)
      def outFor(t: Task, attemptTime: java.sql.Timestamp)(
          status: String, code: String, body: String) = {
        val (eid, tid, did, attempt, manual, eventTime, topic,
          data, metadata, elig, _) = t
        Sinks.HttpOutcome(s"att_$eid:$did:$attempt", eid, tid, did,
          "aws_sqs", attempt, manual, status, attemptTime, code,
          eventTime, topic, data, metadata, elig, body)
      }
      def post(target: String, body: String) = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(ep))
          .timeout(java.time.Duration.ofMillis(timeout.toLong))
          .header("Content-Type", "application/x-amz-json-1.0")
          .header("X-Amz-Target", target)
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (bsz <= 1) it.map { t =>
        val attemptTime = new java.sql.Timestamp(System.currentTimeMillis())
        val out = outFor(t, attemptTime) _
        val (_, _, _, _, _, _, _, data, _, _, metaJson) = t
        try {
          val root = mapper.createObjectNode()
          root.put("QueueUrl", qUrl)
          root.put("MessageBody", data)
          val a = root.putObject("MessageAttributes").putObject("metadata")
          a.put("DataType", "String"); a.put("StringValue", metaJson)
          val resp = post("AmazonSQS.SendMessage",
            mapper.writeValueAsString(root))
          if (resp.statusCode() != 200)
            out("failed", resp.statusCode().toString, resp.body())
          else {
            val r = mapper.readTree(resp.body())
            val echoed = Option(r.get("MD5OfMessageBody")).map(_.asText).orNull
            if (echoed != SqsWire.bodyMd5(data))
              // transport corruption: a delivery that cannot prove
              // integrity is a FAILED attempt (retryable), like the SDK
              out("failed", "md5_mismatch", resp.body())
            else out("success", "200", resp.body())
          }
        } catch {
          case _: java.net.http.HttpTimeoutException =>
            out("failed", "timeout", null)
          case e: Exception =>
            out("failed", "connection_error", e.getClass.getSimpleName)
        }
      }
      else it.grouped(bsz).flatMap { chunk =>
        // SendMessageBatch (≤10 entries/call): the request count drops
        // 10× at high fanout; per-ENTRY results keep the outcome
        // branching exact — a partial-batch failure maps each failed
        // entry to its own failed attempt (feeding retries) while the
        // successes in the same call still succeed.
        val attemptTime = new java.sql.Timestamp(System.currentTimeMillis())
        try {
          val root = mapper.createObjectNode()
          root.put("QueueUrl", qUrl)
          val entries = root.putArray("Entries")
          chunk.zipWithIndex.foreach { case (t, i) =>
            val (_, _, _, _, _, _, _, data, _, _, metaJson) = t
            val e = entries.addObject()
            e.put("Id", i.toString)
            e.put("MessageBody", data)
            val a = e.putObject("MessageAttributes").putObject("metadata")
            a.put("DataType", "String"); a.put("StringValue", metaJson)
          }
          val resp = post("AmazonSQS.SendMessageBatch",
            mapper.writeValueAsString(root))
          if (resp.statusCode() != 200)
            // whole-call failure (malformed batch, throttling): every
            // task in the chunk becomes a failed attempt
            chunk.map(t => outFor(t, attemptTime)(
              "failed", resp.statusCode().toString, resp.body()))
          else {
            val r = mapper.readTree(resp.body())
            val okById = scala.collection.mutable.Map[String, String]()
            Option(r.get("Successful")).foreach { arr =>
              (0 until arr.size).foreach { i =>
                val s = arr.get(i)
                okById(s.get("Id").asText) =
                  Option(s.get("MD5OfMessageBody")).map(_.asText).orNull
              }
            }
            val failById = scala.collection.mutable.Map[String, String]()
            Option(r.get("Failed")).foreach { arr =>
              (0 until arr.size).foreach { i =>
                val f = arr.get(i)
                failById(f.get("Id").asText) =
                  Option(f.get("Code")).map(_.asText).getOrElse("BatchError")
              }
            }
            chunk.zipWithIndex.map { case (t, i) =>
              val (_, _, _, _, _, _, _, data, _, _, _) = t
              val out = outFor(t, attemptTime) _
              okById.get(i.toString) match {
                case Some(echoed) =>
                  if (echoed != SqsWire.bodyMd5(data))
                    out("failed", "md5_mismatch", null)
                  else out("success", "200", null)
                case None =>
                  out("failed",
                    failById.getOrElse(i.toString, "missing_batch_result"),
                    null)
              }
            }
          }
        } catch {
          case _: java.net.http.HttpTimeoutException =>
            chunk.map(t => outFor(t, attemptTime)("failed", "timeout", null))
          case e: Exception =>
            chunk.map(t => outFor(t, attemptTime)(
              "failed", "connection_error", e.getClass.getSimpleName))
        }
      }
    }.toDF()
    outcomes.localCheckpoint(true)
  }
}

/** The socket-level SQS fake. `corruptMd5 = true` flips the echoed body
  * digest — a test mode proving the client-side verification is real
  * (deliveries MUST fail against it). */
object SqsMockServer {

  final case class Received(queueUrl: String, body: String,
                            attributes: Map[String, String])

  final class Server(srv: com.sun.net.httpserver.HttpServer,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received],
                     val requests: java.util.concurrent.atomic.AtomicLong) {
    def port: Int = srv.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port/"
    def stop(): Unit = {
      srv.stop(0)
      // the executor's core threads are non-daemon: without shutdown a
      // forked bench JVM never exits after main returns
      srv.getExecutor match {
        case es: java.util.concurrent.ExecutorService => es.shutdownNow(); ()
        case _ => ()
      }
    }
  }

  /** `corruptMd5` flips the echoed digests (proving client verification);
    * `failBodiesContaining` marks matching entries as per-entry Failed in
    * SendMessageBatch responses (the partial-batch-failure injection). */
  def start(corruptMd5: Boolean = false,
            failBodiesContaining: Option[String] = None): Server = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    val requests = new java.util.concurrent.atomic.AtomicLong(0L)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(code: Int, body: String): Unit = {
        val b = body.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.0")
        ex.sendResponseHeaders(code, b.length.toLong)
        ex.getResponseBody.write(b)
        ex.close()
      }
      def err(code: Int, typ: String): Unit =
        respond(code, s"""{"__type":"$typ"}""")
      def attrsOf(node: com.fasterxml.jackson.databind.JsonNode): Map[String, String] =
        Option(node.get("MessageAttributes")).map { an =>
          val it = an.fields()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) {
            val e = it.next()
            b += e.getKey -> e.getValue.get("StringValue").asText
          }
          b.result()
        }.getOrElse(Map.empty[String, String])
      def digestOf(msgBody: String): String = {
        val d = SqsWire.bodyMd5(msgBody)
        if (corruptMd5) d.reverse else d
      }
      try {
        requests.incrementAndGet()
        val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
        val ctype = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        if (ex.getRequestMethod != "POST") err(400, "InvalidAction")
        else if (!ctype.startsWith("application/x-amz-json-1.0"))
          err(400, "InvalidRequestContentType")
        else if (target == "AmazonSQS.SendMessage") {
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val root = mapper.readTree(body)
          val queueUrl = Option(root.get("QueueUrl")).map(_.asText).getOrElse("")
          val msgBody = Option(root.get("MessageBody")).map(_.asText).getOrElse("")
          if (queueUrl.isEmpty || msgBody.isEmpty)
            err(400, "MissingParameter")
          else {
            val attrs = attrsOf(root)
            received.add(Received(queueUrl, msgBody, attrs))
            val attrPart =
              if (attrs.isEmpty) ""
              else s""","MD5OfMessageAttributes":"${SqsWire.attributesMd5(attrs.toSeq)}""""
            respond(200,
              s"""{"MessageId":"${java.util.UUID.randomUUID()}",""" +
                s""""MD5OfMessageBody":"${digestOf(msgBody)}"$attrPart}""")
          }
        } else if (target == "AmazonSQS.SendMessageBatch") {
          // the batch op, with the service's own validation ladder:
          // empty batch, >10 entries, and duplicate Ids are WHOLE-CALL
          // errors; anything else resolves per entry
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val root = mapper.readTree(body)
          val queueUrl = Option(root.get("QueueUrl")).map(_.asText).getOrElse("")
          val entries = Option(root.get("Entries")).filter(_.isArray)
          if (queueUrl.isEmpty) err(400, "MissingParameter")
          else if (entries.forall(_.size == 0))
            err(400, "AWS.SimpleQueueService.EmptyBatchRequest")
          else if (entries.exists(_.size > 10))
            err(400, "AWS.SimpleQueueService.TooManyEntriesInBatchRequest")
          else {
            val es = entries.get
            val ids = (0 until es.size).map(i =>
              Option(es.get(i).get("Id")).map(_.asText).getOrElse(""))
            if (ids.distinct.size != ids.size)
              err(400, "AWS.SimpleQueueService.BatchEntryIdsNotDistinct")
            else {
              val ok = new scala.collection.mutable.ArrayBuffer[String]
              val fail = new scala.collection.mutable.ArrayBuffer[String]
              (0 until es.size).foreach { i =>
                val e = es.get(i)
                val id = ids(i)
                val msgBody = Option(e.get("MessageBody")).map(_.asText).getOrElse("")
                if (msgBody.isEmpty)
                  fail += s"""{"Id":"$id","SenderFault":true,"Code":"EmptyValue"}"""
                else if (failBodiesContaining.exists(msgBody.contains)) {
                  // injected per-entry failure: stored NOWHERE, failed in
                  // the response — the partial-batch contract
                  fail += s"""{"Id":"$id","SenderFault":false,"Code":"InternalError"}"""
                } else {
                  val attrs = attrsOf(e)
                  received.add(Received(queueUrl, msgBody, attrs))
                  val attrPart =
                    if (attrs.isEmpty) ""
                    else s""","MD5OfMessageAttributes":"${SqsWire.attributesMd5(attrs.toSeq)}""""
                  ok += s"""{"Id":"$id","MessageId":"${java.util.UUID.randomUUID()}",""" +
                    s""""MD5OfMessageBody":"${digestOf(msgBody)}"$attrPart}"""
                }
              }
              respond(200, s"""{"Successful":[${ok.mkString(",")}],""" +
                s""""Failed":[${fail.mkString(",")}]}""")
            }
          }
        } else err(400, "UnknownOperationException")
      } catch {
        case _: Exception => err(400, "MalformedInput")
      }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    new Server(srv, received, requests)
  }
}
