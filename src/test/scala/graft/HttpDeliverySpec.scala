package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.streaming.{Runner, Signatures, Sinks}
import graft.streaming.Model._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** End-to-end delivery over REAL HTTP: [[Sinks.HttpWebhookSink]] against an
  * in-process receiver (`com.sun.net.httpserver`, loopback port 0). This is
  * the reference's actual webhook wire contract — signed POST, metadata
  * headers, response-branched attempt outcomes, retry-until-success — which
  * the file-rendered sinks can only approximate
  * (`destwebhook/destwebhook_publish_test.go` runs the same shape against
  * `httptest.Server`). */
class HttpDeliverySpec extends GraftSuite {

  /** One recorded request. */
  final case class Hit(path: String, body: String, headers: Map[String, String])

  /** Loopback receiver: records every request; per-path response script
    * (status of the i-th request to that path; last entry repeats). */
  final class Receiver(script: Map[String, Seq[Int]], delayMillis: Long = 0) {
    val hits = new ConcurrentLinkedQueue[Hit]()
    private val counts = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val headers = ex.getRequestHeaders.entrySet().asScala
        .map(e => e.getKey.toLowerCase -> e.getValue.asScala.mkString(","))
        .toMap
      hits.add(Hit(path, body, headers))
      if (delayMillis > 0) Thread.sleep(delayMillis)
      val n = counts.computeIfAbsent(path, _ => new AtomicInteger()).getAndIncrement()
      val statuses = script.getOrElse(path, Seq(200))
      val status = statuses(math.min(n, statuses.size - 1))
      val resp = s"""{"ok":${status < 400},"n":$n}""".getBytes(UTF_8)
      ex.getResponseHeaders.set("content-type", "application/json")
      ex.sendResponseHeaders(status, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    def port: Int = server.getAddress.getPort
    def url(path: String): String = s"http://127.0.0.1:$port$path"
    def stop(): Unit = server.stop(0)
  }

  private def tasksDf(rows: Seq[(String, String, Int)]): DataFrame = {
    // (event_id, destination_id, attempt)
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("event_id", "destination_id", "attempt")
      .withColumn("tenant_id", lit("t1"))
      .withColumn("manual", lit(false))
      .withColumn("event_time", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:01")))
      .withColumn("topic", lit("order.created"))
      .withColumn("data", concat(lit("""{"n":""""), col("event_id"), lit("\"}")))
      .withColumn("metadata", map(lit("trace"), col("event_id")))
      .withColumn("eligible_for_retry", lit(true))
      .withColumn("dest_type", lit("webhook"))
  }

  private def endpointsDf(rows: Seq[(String, String, String)]): () => DataFrame = {
    // (destination_id, url, secret)
    val spark2 = spark
    import spark2.implicits._
    () => rows.toDF("destination_id", "url", "secret")
      .withColumn("previous_secret", lit(null).cast("string"))
      .withColumn("previous_secret_invalid_at", lit(null).cast("string"))
  }

  test("delivers signed POSTs over real HTTP and captures the response") {
    val rx = new Receiver(Map.empty)
    try {
      val sink = Sinks.HttpWebhookSink(endpointsDf(Seq(
        ("d1", rx.url("/hook/d1"), "sec-one"),
        ("d2", rx.url("/hook/d2"), "sec-two"))))
      val out = sink.publish(tasksDf(Seq(
        ("e1", "d1", 1), ("e2", "d1", 1), ("e3", "d2", 1))))
        .collect().map(r => (r.getAs[String]("attempt_id"),
          r.getAs[String]("status"), r.getAs[String]("code"),
          r.getAs[String]("response_body")))

      assert(out.length == 3)
      assert(out.forall { case (_, st, code, body) =>
        st == "success" && code == "200" && body.startsWith("""{"ok":true""") })

      val hits = rx.hits.asScala.toSeq
      assert(hits.map(_.path).sorted == Seq("/hook/d1", "/hook/d1", "/hook/d2"))
      // wire contract per request: body is the raw payload; system +
      // event metadata ride as prefixed headers; the signature verifies
      // against the destination secret over the header timestamp
      hits.foreach { h =>
        val eid = h.headers("x-graft-event-id")
        assert(h.body == s"""{"n":"$eid"}""")
        assert(h.headers("x-graft-topic") == "order.created")
        assert(h.headers("x-graft-trace") == eid) // event metadata layer
        assert(h.headers("content-type") == "application/json")
        val ts = java.time.Instant.parse(h.headers("x-graft-timestamp"))
        val secret = if (h.path.endsWith("d1")) "sec-one" else "sec-two"
        val sig = h.headers("x-graft-signature")
        assert(sig.startsWith("v0="))
        val mgr = new Signatures.SignatureManager(
          Seq(Signatures.WebhookSecret(secret, java.time.Instant.EPOCH)))
        assert(mgr.verify(sig.stripPrefix("v0="), secret,
          Signatures.SignaturePayload(eid, "order.created", ts, h.body)),
          s"signature did not verify for $eid")
      }
    } finally rx.stop()
  }

  test("branches outcomes on HTTP status and transport errors") {
    val rx = new Receiver(Map("/hook/bad" -> Seq(503)), delayMillis = 0)
    // a loopback port with no listener -> connection refused
    val deadPort = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    try {
      val sink = Sinks.HttpWebhookSink(
        endpointsDf(Seq(
          ("d_ok", rx.url("/hook/ok"), "s"),
          ("d_bad", rx.url("/hook/bad"), "s"),
          ("d_dead", s"http://127.0.0.1:$deadPort/hook", "s"))),
        timeoutMillis = 2000)
      val out = sink.publish(tasksDf(Seq(
        ("e1", "d_ok", 1), ("e2", "d_bad", 1), ("e3", "d_dead", 1),
        ("e4", "d_unknown", 1)))) // no endpoint row at all
        .collect().map(r => r.getAs[String]("destination_id") ->
          (r.getAs[String]("status"), r.getAs[String]("code"),
            r.getAs[String]("response_body"))).toMap

      assert(out("d_ok") == (("success", "200", """{"ok":true,"n":0}""")))
      assert(out("d_bad")._1 == "failed" && out("d_bad")._2 == "503")
      assert(out("d_bad")._3.startsWith("""{"ok":false"""), "4xx/5xx response body is captured")
      assert(out("d_dead") == (("failed", "connection_refused", null)))
      assert(out("d_unknown") == (("failed", "500", null)))
    } finally rx.stop()
  }

  test("slow endpoint times out with the reference's timeout code") {
    val rx = new Receiver(Map.empty, delayMillis = 1500)
    try {
      val sink = Sinks.HttpWebhookSink(
        endpointsDf(Seq(("d_slow", rx.url("/hook/slow"), "s"))),
        timeoutMillis = 300)
      val out = sink.publish(tasksDf(Seq(("e1", "d_slow", 1))))
        .select("status", "code").collect().head
      assert(out.getString(0) == "failed" && out.getString(1) == "timeout")
    } finally rx.stop()
  }

  test("full HTTP loop: POST /publish -> spool stream -> signed webhook out -> log") {
    val spark2 = spark
    import spark2.implicits._

    val rx = new Receiver(Map.empty)
    val tmp = java.nio.file.Files.createTempDirectory("graft_loop").toString
    val spool = s"$tmp/spool"
    val api = graft.api.HttpApi.start(spark, graft.api.HttpApi.Config(
      events = spark.emptyDataFrame, destTable = s"$tmp/dest",
      storeSecret = "s", publishSpool = Some(spool)))
    try {
      val destinations = Seq(
        Destination("d1", "t1", "webhook", Seq("order.*"), None, disabled = false)).toDS()
      val registry = new Sinks.Registry(Seq(
        Sinks.HttpWebhookSink(endpointsDf(Seq(("d1", rx.url("/hook/d1"), "sec-loop"))))))
      // ingest = the publish spool tailed as a text file stream
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(spool))
      val raw = spark.readStream.text(spool)
      val running = Runner.start(spark, raw, destinations, registry,
        logPath = s"$tmp/log", alertSinkName = "loop_alerts",
        checkpointRoot = s"$tmp/ckpt")
      try {
        val client = java.net.http.HttpClient.newHttpClient()
        val resp = client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:${api.port}/api/v1/publish"))
            .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
              """{"id":"e-loop","tenant_id":"t1","topic":"order.created","time":"2024-01-01T00:00:00Z","data":{"k":"v"}}"""))
            .build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        assert(resp.statusCode() == 202)

        running.delivery.processAllAvailable()
        // the published event crossed the wire to the webhook receiver…
        val hit = rx.hits.asScala.find(
          _.headers.get("x-graft-event-id").contains("e-loop"))
        assert(hit.nonEmpty, "published event never reached the HTTP endpoint")
        assert(hit.get.body == """{"k":"v"}""")
        assert(hit.get.headers("x-graft-signature").startsWith("v0="))
        // …and its attempt landed in the log
        val log = spark.read.parquet(s"$tmp/log")
          .filter(col("event_id") === "e-loop")
          .select("status", "code", "destination_id").collect()
        assert(log.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
          Seq(("success", "200", "d1")))
      } finally running.stopAll()
    } finally { api.stop(); rx.stop() }
  }

  test("full pipeline over HTTP: 503 first attempt -> scheduled retry -> 200") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    // first request to e1's destination fails with 503, then succeeds
    val rx = new Receiver(Map("/hook/flaky" -> Seq(503, 200)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_httpd").toString
    try {
      val destinations = Seq(
        Destination("d_flaky", "t1", "webhook", Seq("*"), None, disabled = false)).toDS()
      val registry = new Sinks.Registry(Seq(
        Sinks.HttpWebhookSink(endpointsDf(Seq(
          ("d_flaky", rx.url("/hook/flaky"), "sec-r"))))))
      val raw = MemoryStream[String]
      val running = Runner.start(spark, raw.toDF(), destinations, registry,
        logPath = s"$tmp/log", alertSinkName = "http_alerts",
        checkpointRoot = s"$tmp/ckpt",
        alertCfg = graft.streaming.Alerts.Config(autoDisableCount = 100),
        retryPath = Some(s"$tmp/retry"),
        backoff = graft.core.Backoff(baseMillis = 1, factor = 2, maxRetries = 3),
        retryWatermarkDelay = "0 seconds")
      try {
        raw.addData(
          """{"event_id":"e1","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:00Z","data":{"n":1}}""")
        running.delivery.processAllAvailable()

        def logState(): Set[(Int, String, String)] =
          try spark.read.parquet(s"$tmp/log")
            .filter(col("event_id") === "e1")
            .select("attempt_number", "status", "code")
            .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
          catch { case _: Exception => Set.empty }

        // HTTP attempt_time is wall-clock, so heartbeat deliveries advance
        // the event-time retry watermark naturally
        val deadline = System.currentTimeMillis() + 60000
        var hb = 0
        var state = logState()
        val want = Set((1, "failed", "503"), (2, "success", "200"))
        while (state != want && System.currentTimeMillis() < deadline) {
          hb += 1
          val hbTime = java.time.Instant.parse("2024-01-01T00:00:00Z")
            .plusSeconds(hb * 60L)
          raw.addData(
            s"""{"event_id":"hb$hb","tenant_id":"t1","topic":"order.created","event_time":"$hbTime","data":{"n":0}}""")
          Thread.sleep(500)
          running.delivery.processAllAvailable()
          state = logState()
        }
        assert(state == want, s"expected 503-then-200 for e1 over HTTP, got $state")
        // e1 really crossed the wire twice (original + retry); heartbeat
        // events also hit the endpoint (d_flaky subscribes to "*"), so
        // count by the event-id header
        assert(rx.hits.asScala.count(
          _.headers.get("x-graft-event-id").contains("e1")) == 2)
        // response bodies landed in the log (reference: attempt ResponseData)
        val bodies = spark.read.parquet(s"$tmp/log")
          .filter(col("event_id") === "e1")
          .select("response_body").collect().map(_.getString(0))
        assert(bodies.length == 2)
        assert(bodies.contains("""{"ok":false,"n":0}""")) // the 503 body
        assert(bodies.count(_.startsWith("""{"ok":true""")) == 1)
      } finally running.stopAll()
    } finally rx.stop()
  }

  test("manual retry over HTTP: POST /retry -> spooled task -> redelivered attempt 2") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    val rx = new Receiver(Map.empty)
    val tmp = java.nio.file.Files.createTempDirectory("graft_mrty").toString
    try {
      val destinations = Seq(
        Destination("d1", "t1", "webhook", Seq("order.*"), None, disabled = false)).toDS()
      val registry = new Sinks.Registry(Seq(
        Sinks.HttpWebhookSink(endpointsDf(Seq(("d1", rx.url("/hook/d1"), "sec-m"))))))
      val raw = MemoryStream[String]
      val running = Runner.start(spark, raw.toDF(), destinations, registry,
        logPath = s"$tmp/log", alertSinkName = "mrty_alerts",
        checkpointRoot = s"$tmp/ckpt", retryPath = Some(s"$tmp/retry"))
      try {
        raw.addData(
          """{"event_id":"e1","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:00Z","data":{"k":"v"}}""")
        running.delivery.processAllAvailable()
        assert(rx.hits.asScala.count(
          _.headers.get("x-graft-event-id").contains("e1")) == 1)

        // the API reads the log the pipeline just wrote; the retry spool is
        // the SAME directory the delivery query tails for retry tasks
        val api = graft.api.HttpApi.start(spark, graft.api.HttpApi.Config(
          events = spark.emptyDataFrame, destTable = s"$tmp/dest",
          storeSecret = "s", attempts = Some(() => spark.read.parquet(s"$tmp/log")),
          retrySpool = Some(s"$tmp/retry")))
        try {
          val client = java.net.http.HttpClient.newHttpClient()
          def post(path: String, body: String) = client.send(
            java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"http://127.0.0.1:${api.port}$path"))
              .method("POST", java.net.http.HttpRequest.BodyPublishers.ofString(body))
              .build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          def put(path: String, body: String) = client.send(
            java.net.http.HttpRequest.newBuilder(
              java.net.URI.create(s"http://127.0.0.1:${api.port}$path"))
              .PUT(java.net.http.HttpRequest.BodyPublishers.ofString(body))
              .build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          assert(put("/api/v1/t1/destinations/d1",
            """{"type":"webhook","topics":["order.*"],"config":{"url":"http://example.test/hook"}}""").statusCode() == 201)
          val resp = post("/api/v1/retry",
            """{"event_id":"e1","destination_id":"d1"}""")
          assert(resp.statusCode() == 202, resp.body())

          // the running delivery query picks the manual task off the spool
          val deadline = System.currentTimeMillis() + 30000
          def e1Hits = rx.hits.asScala.count(
            _.headers.get("x-graft-event-id").contains("e1"))
          while (e1Hits < 2 && System.currentTimeMillis() < deadline) {
            Thread.sleep(300)
            running.delivery.processAllAvailable()
          }
          assert(e1Hits == 2, "manual retry never reached the endpoint")
          val attempts = spark.read.parquet(s"$tmp/log")
            .filter(col("event_id") === "e1")
            .select("attempt_number", "manual", "status").collect()
            .map(r => (r.getInt(0), r.getBoolean(1), r.getString(2))).toSet
          assert(attempts == Set((1, false, "success"), (2, true, "success")))
        } finally api.stop()
      } finally running.stopAll()
    } finally rx.stop()
  }
}
