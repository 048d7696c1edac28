package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP wire round-trips for the Hookdeck and S3 sinks — completing the
  * wire-mock family ([[SqsWire]], [[CloudWire]], [[AmqpWire]]):
  *
  *   - Hookdeck (reference `desthookdeck/hookdeck.go:108-135`): POST the
  *     raw payload to `/{token-id}` with
  *     `x-hookdeck-signature: v0=` + base64(HMAC-SHA256(full token,
  *     body)) and the `x-outpost-*` metadata headers. The mock VERIFIES
  *     the signature server-side (it shares the token) — a tampered body
  *     is a 401, so the round-trip proves the signing path, not just the
  *     transport.
  *   - S3 (reference `destawss3/destawss3.go:184-258`): `PUT
  *     /{bucket}/{key}` with `Content-MD5`; the mock verifies the digest
  *     against the received bytes and echoes the S3 `ETag`
  *     (md5 hex), which the client re-verifies — the SDK's
  *     end-to-end integrity contract in both directions. */
object HttpWire {

  /** POST rendered Hookdeck records (url, body, signature, headers) to
    * the mock endpoint (the url's path — the token id — is preserved;
    * only the host moves). Returns deliveries acknowledged; a signature
    * rejection (401) throws. */
  def deliverHookdeck(records: DataFrame, endpoint: String): Long = {
    val spark2 = records.sparkSession
    import spark2.implicits._
    val rows = records.select("url", "body", "signature", "headers")
      .as[(String, String, String, Map[String, String])]
    rows.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      it.map { case (url, body, sig, headers) =>
        val path = java.net.URI.create(url).getPath
        var b = java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"$endpoint$path"))
          .header("x-hookdeck-signature", sig)
        headers.toSeq.sortBy(_._1).foreach { case (k, v) =>
          b = b.header(k, v)
        }
        val resp = client.send(
          b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"hookdeck delivery failed: HTTP ${resp.statusCode()} ${resp.body()}")
        1L
      }
    }.rdd.fold(0L)(_ + _) // fold: empty delivery returns 0, not UnsupportedOperationException
  }

  private def md5(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(b)
  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  /** PUT rendered objects (object_key, body) into `bucket` at `endpoint`
    * with Content-MD5, verifying the echoed ETag against the local
    * digest. Returns objects stored; any integrity mismatch throws. */
  def deliverS3(objects: DataFrame, endpoint: String, bucket: String): Long = {
    val spark2 = objects.sparkSession
    import spark2.implicits._
    val rows = objects.select("object_key", "body").as[(String, String)]
    rows.mapPartitions { it =>
      val client = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(5)).build()
      it.map { case (key, body) =>
        val bytes = body.getBytes("UTF-8")
        val digest = md5(bytes)
        val resp = client.send(java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"$endpoint/$bucket/$key"))
          .header("Content-MD5",
            java.util.Base64.getEncoder.encodeToString(digest))
          .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(bytes))
          .build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode() == 200,
          s"PutObject failed: HTTP ${resp.statusCode()} ${resp.body()}")
        val etag = Option(resp.headers().firstValue("ETag").orElse(null))
          .getOrElse("")
        require(etag == "\"" + hex(digest) + "\"",
          s"ETag mismatch for $key: sent ${hex(digest)}, echoed $etag")
        1L
      }
    }.rdd.fold(0L)(_ + _) // fold: empty delivery returns 0, not UnsupportedOperationException
  }
}

/** Socket-level Hookdeck fake: verifies the HMAC signature with the
  * shared token before accepting — a transport that PROVES the signing
  * chain. */
object HookdeckMockServer {
  final case class Received(tokenId: String, body: String,
                            signature: String, headers: Map[String, String])

  final class Server(srv: com.sun.net.httpserver.HttpServer,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received]) {
    def port: Int = srv.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def stop(): Unit = srv.stop(0)
  }

  /** `token` is the full original token string — the signing key, as the
    * reference uses it (hookdeck.go:44-61). */
  def start(token: String): Server = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    val keyBytes = token.getBytes("UTF-8")
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(code: Int, body: String): Unit = {
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(code, b.length.toLong)
        ex.getResponseBody.write(b); ex.close()
      }
      try {
        if (ex.getRequestMethod != "POST") respond(405, "method not allowed")
        else {
          val tokenId = ex.getRequestURI.getPath.stripPrefix("/")
          val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
          val sig = Option(ex.getRequestHeaders
            .getFirst("x-hookdeck-signature")).getOrElse("")
          val expected = "v0=" + graft.functions.Crypto.hmacBase64(
            "HmacSHA256", keyBytes, body.getBytes("UTF-8"))
          if (sig != expected) respond(401, "invalid signature")
          else {
            import scala.jdk.CollectionConverters._
            val hdrs = ex.getRequestHeaders.asScala.collect {
              case (k, vs) if k.toLowerCase.startsWith("x-outpost-") =>
                k.toLowerCase -> vs.get(0)
            }.toMap
            received.add(Received(tokenId, body, sig, hdrs))
            respond(200, """{"status":"ok"}""")
          }
        }
      } catch { case _: Exception => respond(400, "bad request") }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    new Server(srv, received)
  }
}

/** Socket-level S3 fake: `PUT /{bucket}/{key}` with Content-MD5
  * verification and ETag echo. `corruptEtag` flips the echo — proving
  * the client-side check is real. */
object S3MockServer {
  final case class Received(bucket: String, key: String, body: Array[Byte])

  final class Server(srv: com.sun.net.httpserver.HttpServer,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received]) {
    def port: Int = srv.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def stop(): Unit = srv.stop(0)
  }

  def start(corruptEtag: Boolean = false): Server = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      def respond(code: Int, body: String,
                  etag: Option[String] = None): Unit = {
        etag.foreach(e => ex.getResponseHeaders.set("ETag", e))
        val b = body.getBytes("UTF-8")
        ex.sendResponseHeaders(code, if (b.isEmpty) -1L else b.length.toLong)
        if (b.nonEmpty) ex.getResponseBody.write(b)
        ex.close()
      }
      try {
        val parts = ex.getRequestURI.getPath.stripPrefix("/").split("/", 2)
        if (ex.getRequestMethod != "PUT" || parts.length != 2 ||
            parts(1).isEmpty)
          respond(400, """<Error><Code>InvalidRequest</Code></Error>""")
        else {
          val body = ex.getRequestBody.readAllBytes()
          val digest = java.security.MessageDigest.getInstance("MD5").digest(body)
          val sent = Option(ex.getRequestHeaders.getFirst("Content-MD5")).getOrElse("")
          if (sent != java.util.Base64.getEncoder.encodeToString(digest))
            respond(400, """<Error><Code>BadDigest</Code></Error>""")
          else {
            received.add(Received(parts(0), parts(1), body))
            val h = digest.map("%02x".format(_)).mkString
            val etag = "\"" + (if (corruptEtag) h.reverse else h) + "\""
            respond(200, "", Some(etag))
          }
        }
      } catch {
        case _: Exception =>
          respond(400, """<Error><Code>MalformedInput</Code></Error>""")
      }
    })
    srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    srv.start()
    new Server(srv, received)
  }
}
