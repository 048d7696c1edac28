package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.operators.DestinationStore
import graft.streaming.{Runner, Signatures, Sinks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

object E2eScenarioSpec {
  /** Store-backed webhook endpoint dimension as a SERIALIZABLE thunk
    * (captures only the session + paths, never the test fixture). */
  def storeEndpointsThunk(sp: org.apache.spark.sql.SparkSession,
                          destTable: String,
                          storeSecret: String): () => DataFrame =
    () => DestinationStore.latestRows(sp, destTable)
      .filter(col("dest_type") === "webhook")
      .select(col("destination_id"), col("config")("url").as("url"))
      .join(DestinationStore.webhookCredsDim(sp, destTable, storeSecret),
        Seq("destination_id"), "left")

  /** One static webhook endpoint as a serializable thunk (captures only
    * strings + the session). */
  def staticEndpointThunk(sp: org.apache.spark.sql.SparkSession, id: String,
                          url: String, secret: String): () => DataFrame =
    () => {
      import sp.implicits._
      Seq((id, url, secret)).toDF("destination_id", "url", "secret")
        .withColumn("previous_secret", lit(null).cast("string"))
        .withColumn("previous_secret_invalid_at", lit(null).cast("string"))
    }
}

/** E2E scenario catalog mirroring the reference's `cmd/e2e` suites
  * (delivery_pipeline / log_queries / retry / signatures / opevents —
  * `cmd/e2e/{delivery_pipeline,log_queries,retry,signatures,opevents}_test.go`,
  * wiring `suites_test.go:85-110`): each scenario boots the REAL stack —
  * HttpApi + publish spool → Runner (store-backed dynamic destination
  * dimension) → signed webhook out over real HTTP → attempt log → API
  * reads — and asserts the reference's observable contract over HTTP,
  * never internals. No new operators: this is the parity proof that
  * composes everything already built. */
class E2eScenarioSpec extends GraftSuite {

  // ---------------------------------------------------------- harness --

  /** One recorded delivery at the webhook receiver, with the signature
    * VERIFIED against the receiver's configured secrets (the reference
    * mock's `Verified` flag). */
  final case class Hit(path: String, body: String,
                       headers: Map[String, String], verified: Boolean)

  /** Loopback webhook receiver: verifies each request's signature with
    * per-path secrets (rotatable mid-test), errors on demand (the
    * reference mock's `should_err` metadata), records everything. */
  final class Receiver {
    val hits = new ConcurrentLinkedQueue[Hit]()
    @volatile var secretsByPath: Map[String, Seq[String]] = Map.empty
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val headers = ex.getRequestHeaders.entrySet().asScala
        .map(e => e.getKey.toLowerCase -> e.getValue.asScala.mkString(","))
        .toMap
      val verified = (for {
        sig <- headers.get("x-graft-signature")
        eid <- headers.get("x-graft-event-id")
        topic <- headers.get("x-graft-topic")
        tsStr <- headers.get("x-graft-timestamp")
      } yield {
        val ts = java.time.Instant.parse(tsStr)
        val payload = Signatures.SignaturePayload(eid, topic, ts, body)
        val allowed = secretsByPath.getOrElse(path, Nil)
        sig.split(",").exists { part =>
          allowed.exists { sec =>
            val mgr = new Signatures.SignatureManager(
              Seq(Signatures.WebhookSecret(sec, java.time.Instant.EPOCH)))
            mgr.verify(part.trim.stripPrefix("v0="), sec, payload)
          }
        }
      }).getOrElse(false)
      hits.add(Hit(path, body, headers, verified))
      val status =
        if (headers.get("x-graft-should_err").contains("true")) 500 else 200
      val resp = s"""{"ok":${status == 200}}""".getBytes(UTF_8)
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
    def forEvent(eid: String): Seq[Hit] =
      hits.asScala.filter(_.headers.get("x-graft-event-id").contains(eid)).toSeq
  }

  /** The booted stack: API + Runner share the destination changelog (the
    * data plane re-reads `asDestinations` every micro-batch, so CRUD over
    * HTTP steers the running fanout) and the publish spool. */
  private final class Stack(alertCfg: graft.streaming.Alerts.Config =
                              graft.streaming.Alerts.Config(),
                            withRetry: Boolean = false,
                            alertSink: String = "e2e_alerts") {
    val tmp: String =
      java.nio.file.Files.createTempDirectory("graft_e2e").toString
    val rx = new Receiver
    val spool = s"$tmp/spool"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(spool))
    private val spark0 = spark
    import spark0.implicits._

    // webhook endpoint dimension straight from the store (url from
    // config, secrets decrypted in flight) — a thunk, so rotation via
    // PATCH is visible to the next delivery. Built by a helper capturing
    // ONLY serializable locals: a thunk defined as a Stack method would
    // drag the whole (non-serializable) fixture into the streaming
    // closure.
    val registry = new Sinks.Registry(Seq(Sinks.HttpWebhookSink(
      E2eScenarioSpec.storeEndpointsThunk(spark0, s"$tmp/dest", "s"))))
    val running: Runner.Running = Runner.start(spark0,
      spark0.readStream.text(spool),
      spark0.emptyDataset[graft.streaming.Model.Destination],
      registry, logPath = s"$tmp/log", alertSinkName = alertSink,
      checkpointRoot = s"$tmp/ckpt", alertCfg = alertCfg,
      retryPath = if (withRetry) Some(s"$tmp/retry") else None,
      backoff = graft.core.Backoff(baseMillis = 1, factor = 2, maxRetries = 2),
      retryWatermarkDelay = "0 seconds",
      // the REFRESH binding: CRUD over the API steers the running fanout
      destinationsRefresh = Some(() =>
        DestinationStore.asDestinations(spark0, s"$tmp/dest")))
    val api: graft.api.HttpApi.Server =
      graft.api.HttpApi.start(spark0, graft.api.HttpApi.Config(
        events = spark0.emptyDataFrame, destTable = s"$tmp/dest",
        storeSecret = "s", publishSpool = Some(spool),
        tenantTable = Some(s"$tmp/tenants"),
        attempts = Some(() => spark0.read
          .schema(Runner.logSchema.add("month",
            org.apache.spark.sql.types.StringType))
          .parquet(s"$tmp/log")),
        retrySpool = if (withRetry) Some(s"$tmp/retry") else None))

    private val client = java.net.http.HttpClient.newHttpClient()
    private def req(method: String, path: String, body: String) = client.send(
      java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:${api.port}$path"))
        .method(method, if (body == null)
            java.net.http.HttpRequest.BodyPublishers.noBody()
          else java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    def get(path: String): (Int, String) = {
      val r = req("GET", path, null); (r.statusCode(), r.body())
    }
    def post(path: String, body: String): (Int, String) = {
      val r = req("POST", path, body); (r.statusCode(), r.body())
    }
    def put(path: String, body: String): (Int, String) = {
      val r = req("PUT", path, body); (r.statusCode(), r.body())
    }
    def patch(path: String, body: String): (Int, String) = {
      val r = req("PATCH", path, body); (r.statusCode(), r.body())
    }

    /** Create tenant + webhook destination over HTTP and register its
      * verification secret at the receiver. */
    def createWebhookDest(tenant: String, id: String, topics: String,
                          secret: String,
                          filter: Option[String] = None): Unit = {
      assert(put(s"/api/v1/tenants/$tenant", "{}")._1 < 300)
      val filterPart = filter.map(f => s""","filter":$f""").getOrElse("")
      val (code, body) = put(s"/api/v1/$tenant/destinations/$id",
        s"""{"type":"webhook","topics":[$topics],""" +
          s""""config":{"url":"${rx.url(s"/hook/$id")}"},""" +
          s""""credentials":{"secret":"$secret"}$filterPart}""")
      assert(code == 201, s"create destination $id: $code $body")
      rx.secretsByPath += s"/hook/$id" -> Seq(secret)
    }

    def publish(tenant: String, topic: String, id: String, data: String,
                metadata: String = "{}", time: String = null,
                eligibleForRetry: Boolean = false): (Int, String) = {
      val timePart = Option(time).map(t => s""","time":"$t"""").getOrElse("")
      post("/api/v1/publish",
        s"""{"id":"$id","tenant_id":"$tenant","topic":"$topic"$timePart,""" +
          s""""eligible_for_retry":$eligibleForRetry,""" +
          s""""metadata":$metadata,"data":$data}""")
    }

    def drain(): Unit = running.processAllAvailable()
    def attempts(eid: String): Seq[(Int, Boolean, String, String)] =
      try spark0.read.parquet(s"$tmp/log")
        .filter(col("event_id") === eid)
        .select("attempt_number", "manual", "status", "code")
        .collect()
        .map(r => (r.getInt(0), r.getBoolean(1), r.getString(2), r.getString(3)))
        .toSeq.sortBy(_._1)
      catch { case _: Exception => Nil }
    def close(): Unit = {
      try running.stopAll() finally { api.stop(); rx.stop() }
    }
  }

  private def parse(s: String) = graft.functions.JsonMatch.parse(s)

  // -------------------------------------------------- delivery pipeline --

  test("e2e delivery pipeline: fanout + topic routing + JSON filters + " +
      "disable/enable + duplicate publish + key order, all over HTTP") {
    val st = new Stack(alertSink = "e2e_dp_alerts")
    try {
      st.createWebhookDest("t1", "d_all", "\"*\"", "sec-all")
      st.createWebhookDest("t1", "d_users", "\"user.created\"", "sec-u")
      st.createWebhookDest("t1", "d_big", "\"*\"", "sec-big",
        filter = Some("""{"data":{"amount":{"$gte":100}}}"""))

      // (a) matches all three
      assert(st.publish("t1", "user.created", "ev_a",
        """{"amount":150}""")._1 == 202)
      // (b) topic routes away from d_users
      assert(st.publish("t1", "order.created", "ev_b",
        """{"amount":150}""")._1 == 202)
      // (c) filter excludes d_big
      assert(st.publish("t1", "user.created", "ev_c",
        """{"amount":50}""")._1 == 202)
      st.drain()

      def destsOf(eid: String): Set[String] =
        st.rx.forEvent(eid).map(_.path.stripPrefix("/hook/")).toSet
      assert(destsOf("ev_a") == Set("d_all", "d_users", "d_big"))
      assert(destsOf("ev_b") == Set("d_all", "d_big"))
      assert(destsOf("ev_c") == Set("d_all", "d_users"))
      // every delivery signed and verified
      assert(st.rx.hits.asScala.forall(_.verified))
      // payload bytes exact
      assert(st.rx.forEvent("ev_a").forall(_.body == """{"amount":150}"""))

      // duplicate publish id → 409 (the idempotency-conflict contract)
      assert(st.publish("t1", "user.created", "ev_a",
        """{"amount":1}""")._1 == 409)

      // disable stops delivery; enable resumes it — steering the RUNNING
      // fanout through the store (the reference's disable test)
      assert(st.put("/api/v1/t1/destinations/d_users/disable", "")._1 < 300)
      st.drain() // let the dimension change settle before publishing
      assert(st.publish("t1", "user.created", "ev_pre",
        """{"amount":1}""")._1 == 202)
      st.drain()
      assert(destsOf("ev_pre") == Set("d_all"),
        s"disabled destination still delivered: ${destsOf("ev_pre")}")
      assert(st.put("/api/v1/t1/destinations/d_users/enable", "")._1 < 300)
      st.drain()
      assert(st.publish("t1", "user.created", "ev_post",
        """{"amount":1}""")._1 == 202)
      st.drain()
      assert(destsOf("ev_post") == Set("d_all", "d_users"))

      // key order preserved end to end: wire body AND the logged payload
      // (the reference's raw-splice contract — data is never re-encoded)
      assert(st.publish("t1", "user.created", "ev_ko",
        """{"zebra":1,"alpha":2,"mango":3}""")._1 == 202)
      st.drain()
      def keyOrder(s: String): Boolean = {
        val (z, a, m) =
          (s.indexOf("\"zebra\""), s.indexOf("\"alpha\""), s.indexOf("\"mango\""))
        z >= 0 && a >= 0 && m >= 0 && z < a && a < m
      }
      val koHits = st.rx.forEvent("ev_ko").filter(_.path == "/hook/d_all")
      assert(koHits.nonEmpty && koHits.forall(h => keyOrder(h.body)))
      val logged = spark.read.parquet(s"${st.tmp}/log")
        .filter(col("event_id") === "ev_ko")
        .select("data").head().getString(0)
      assert(keyOrder(logged), s"log re-encoded the payload: $logged")
    } finally st.close()
  }

  // -------------------------------------------------------- log queries --

  test("e2e log queries: attempts list/filter/retrieve and attempt " +
      "metrics over HTTP after delivery") {
    val st = new Stack(alertSink = "e2e_lq_alerts")
    try {
      st.createWebhookDest("t1", "d1", "\"*\"", "sec-lq")
      (1 to 5).foreach { i =>
        assert(st.publish("t1", "user.created", s"lq_$i",
          s"""{"index":$i}""", time = s"2024-03-01T00:00:0$i.000Z")._1 == 202)
      }
      st.drain()

      // list all (tenant-scoped)
      val (c1, b1) = st.get("/api/v1/t1/attempts")
      assert(c1 == 200, b1)
      val models = parse(b1).get("models")
      assert(models.size == 5, b1)
      val first = models.get(0)
      assert(first.get("attempt_id").asText.nonEmpty)
      assert(first.get("tenant_id").asText == "t1")
      assert(first.get("destination_id").asText == "d1")
      assert(first.get("status").asText == "success")
      assert(first.get("attempt_number").asInt == 1)

      // filter by event_id
      val (c2, b2) = st.get("/api/v1/t1/attempts?event_id=lq_3")
      assert(c2 == 200 && parse(b2).get("models").size == 1, b2)
      assert(parse(b2).get("models").get(0).get("event_id").asText == "lq_3")

      // filter by destination_id via the destination-scoped route
      val (c3, b3) = st.get("/api/v1/t1/destinations/d1/attempts")
      assert(c3 == 200 && parse(b3).get("models").size == 5, b3)

      // retrieve one by id
      val aid = parse(b2).get("models").get(0).get("attempt_id").asText
      val (c4, b4) = st.get(s"/api/v1/t1/attempts/$aid")
      assert(c4 == 200 && parse(b4).get("event_id").asText == "lq_3", b4)

      // attempt metrics: the measure matrix buckets by ATTEMPT time
      // (delivery wall clock), so the window brackets now
      val now = java.time.Instant.now
      val (c5, b5) = st.get("/api/v1/t1/metrics/attempts?measures[]=count" +
        s"&granularity=1d&start=${now.minusSeconds(86400)}&end=${now.plusSeconds(3600)}")
      assert(c5 == 200, b5)
      val buckets = parse(b5).get("buckets")
      val total = (0 until buckets.size).map(i =>
        buckets.get(i).get("count").asLong).sum
      assert(total == 5L, b5)

      // unknown tenant sees nothing (scoping, not filtering by luck)
      val (c6, b6) = st.get("/api/v1/t2/attempts")
      assert(c6 == 200 && parse(b6).get("models").size == 0, b6)
    } finally st.close()
  }

  // -------------------------------------------------------------- retry --

  test("e2e retry: failed delivery auto-retries with incrementing " +
      "attempt numbers; manual retry creates a new manual attempt; " +
      "retry on disabled destination is rejected") {
    val st = new Stack(withRetry = true, alertSink = "e2e_rt_alerts")
    try {
      st.createWebhookDest("t1", "d_r", "\"*\"", "sec-rt")

      // auto-retry: should_err metadata makes the receiver 500 every
      // attempt (the reference mock's behavior); heartbeats advance the
      // event-time retry watermark
      assert(st.publish("t1", "user.created", "ar_1", """{"t":1}""",
        metadata = """{"should_err":"true"}""",
        time = "2024-01-01T00:00:00Z", eligibleForRetry = true)._1 == 202)
      st.drain()
      assert(st.attempts("ar_1") == Seq((1, false, "failed", "500")))
      val deadline = System.currentTimeMillis() + 60000
      var hb = 0
      while (st.attempts("ar_1").size < 2 &&
          System.currentTimeMillis() < deadline) {
        hb += 1
        st.publish("t1", "user.created", s"hb_$hb", """{"hb":1}""",
          time = java.time.Instant.parse("2024-01-01T00:00:00Z")
            .plusSeconds(hb * 60L).toString)
        Thread.sleep(400)
        st.drain()
      }
      val ar = st.attempts("ar_1")
      assert(ar.size >= 2, s"auto retry never fired: $ar")
      // attempt numbers increment 1,2,... and retries are NOT manual
      ar.zipWithIndex.foreach { case ((n, manual, status, _), i) =>
        assert(n == i + 1 && !manual && status == "failed",
          s"attempt $i wrong: $ar")
      }
      // both attempts really crossed the wire
      assert(st.rx.forEvent("ar_1").size == ar.size)

      // manual retry: 202, redelivered as attempt N+1 with manual=true
      assert(st.publish("t1", "user.created", "mr_1",
        """{"user_id":"456"}""")._1 == 202)
      st.drain()
      assert(st.attempts("mr_1") == Seq((1, false, "success", "200")))
      val (rc, rb) = st.post("/api/v1/retry",
        """{"event_id":"mr_1","destination_id":"d_r"}""")
      assert(rc == 202, s"$rc $rb")
      val deadline2 = System.currentTimeMillis() + 30000
      while (st.attempts("mr_1").size < 2 &&
          System.currentTimeMillis() < deadline2) {
        Thread.sleep(300); st.drain()
      }
      assert(st.attempts("mr_1") ==
        Seq((1, false, "success", "200"), (2, true, "success", "200")))

      // retry on a disabled destination → 400 (validation ladder)
      assert(st.put("/api/v1/t1/destinations/d_r/disable", "")._1 < 300)
      val (dc, db) = st.post("/api/v1/retry",
        """{"event_id":"mr_1","destination_id":"d_r"}""")
      assert(dc == 400, s"$dc $db")
    } finally st.close()
  }

  // ---------------------------------------------------------- signatures --

  test("e2e signatures: rotated secret verifies during the grace period " +
      "(dual signing); a wrong receiver secret delivers but fails " +
      "verification") {
    val st = new Stack(alertSink = "e2e_sig_alerts")
    try {
      st.createWebhookDest("t1", "d_s", "\"*\"", "sec-old")

      // rotate: destination now signs with sec-new AND sec-old (grace);
      // the receiver only knows the OLD secret — the previous-secret
      // signature must verify (the reference's grace-period contract)
      val invalidAt = java.time.Instant.now.plusSeconds(86400).toString
      val (pc, pb) = st.patch("/api/v1/t1/destinations/d_s",
        s"""{"credentials":{"secret":"sec-new","previous_secret":"sec-old",""" +
          s""""previous_secret_invalid_at":"$invalidAt"}}""")
      assert(pc == 200, s"$pc $pb")
      assert(st.publish("t1", "user.created", "rot_1",
        """{"r":1}""")._1 == 202)
      st.drain()
      val rot = st.rx.forEvent("rot_1")
      assert(rot.size == 1 && rot.head.verified,
        "previous-secret signature did not verify during grace period")
      // the header carries BOTH signatures (new + previous)
      assert(rot.head.headers("x-graft-signature").split(",").length == 2)

      // receiver rotated to a wrong secret: delivery still succeeds,
      // verification fails (the reference's wrong-secret contract)
      st.rx.secretsByPath += "/hook/d_s" -> Seq("wrong-secret")
      assert(st.publish("t1", "user.created", "ws_1",
        """{"w":1}""")._1 == 202)
      st.drain()
      val ws = st.rx.forEvent("ws_1")
      assert(ws.size == 1 && !ws.head.verified)
      assert(st.attempts("ws_1") == Seq((1, false, "success", "200")),
        "delivery must succeed even when the receiver cannot verify")
    } finally st.close()
  }

  // ------------------------------------------------------------ opevents --

  test("e2e opevents: consecutive failures raise threshold alerts, " +
      "auto-disable flows back into the store, and alerts publish out " +
      "as signed operational webhooks") {
    val spark2 = spark
    import spark2.implicits._
    val st = new Stack(
      alertCfg = graft.streaming.Alerts.Config(
        autoDisableCount = 10, thresholds = Seq(50, 100)),
      alertSink = "e2e_ope_alerts")
    try {
      st.createWebhookDest("t1", "d_f", "\"*\"", "sec-f")
      (1 to 10).foreach { i =>
        assert(st.publish("t1", "user.created", s"f_$i", s"""{"i":$i}""",
          metadata = """{"should_err":"true"}""",
          time = s"2024-01-01T00:00:${"%02d".format(i)}Z")._1 == 202)
      }
      st.drain()

      // threshold alerts (50% at 5, 100% at 10) + the disable signal
      val alerts = spark.table("e2e_ope_alerts")
        .filter(col("destination_id") === "d_f")
      val kinds = alerts.select("kind", "threshold_pct").collect()
        .map(r => (r.getString(0), r.get(1))).toSeq
      assert(kinds.exists(k => k._1 == "consecutive_failure" &&
        String.valueOf(k._2) == "50"), kinds)
      // at the 100% threshold the DISABLE signal carries the terminal
      // alert (the evaluator emits destination_disabled, not another
      // consecutive_failure, once the count reaches autoDisableCount)
      assert(kinds.exists(k => k._1 == "destination_disabled" &&
        String.valueOf(k._2) == "100"), kinds)

      // acting on the signal: the store disables the destination, and
      // the API shows it (the reference's waitForNewDestinationDisabled)
      val n = DestinationStore.applyDisableAlerts(spark, s"${st.tmp}/dest",
        alerts.toDF(), baseOpSeq = 1000L,
        at = new java.sql.Timestamp(System.currentTimeMillis()))
      assert(n == 1)
      val (gc, gb) = st.get("/api/v1/t1/destinations/d_f")
      assert(gc == 200 && parse(gb).hasNonNull("disabled_at"), gb)
      // and the running fanout stops delivering to it
      st.drain()
      assert(st.publish("t1", "user.created", "after_disable",
        """{"i":0}""")._1 == 202)
      st.drain()
      assert(st.rx.forEvent("after_disable").isEmpty)

      // alert → webhook out: operational events publish through the SAME
      // delivery machinery as signed webhooks (reference opevents mock
      // verifies the HMAC — sink_http.go)
      val ops = graft.streaming.Opevents.toOperationalEvents(
        alerts.as[graft.streaming.Model.Alert])
        .withColumn("destination_id", lit("ops"))
        .withColumn("attempt", lit(1)).withColumn("manual", lit(false))
        .withColumn("metadata",
          map().cast(org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .withColumn("eligible_for_retry", lit(false))
      val opsEndpoints = E2eScenarioSpec.staticEndpointThunk(
        spark2, "ops", st.rx.url("/hook/ops"), "ops-secret")
      st.rx.secretsByPath += "/hook/ops" -> Seq("ops-secret")
      val out = Sinks.HttpWebhookSink(opsEndpoints).publish(ops)
        .select("status").collect()
      assert(out.nonEmpty && out.forall(_.getString(0) == "success"))
      val opsHits = st.rx.hits.asScala.filter(_.path == "/hook/ops").toSeq
      assert(opsHits.nonEmpty && opsHits.forall(_.verified),
        "opevent webhooks must carry a verifiable HMAC")
      val topics = opsHits.flatMap(_.headers.get("x-graft-topic")).toSet
      assert(topics.contains("alert.destination.consecutive_failure"), topics)
      assert(topics.contains("alert.destination.disabled"), topics)
      // data shape: destination + failure accounting ride the payload
      val cf = opsHits.find(_.headers("x-graft-topic") ==
        "alert.destination.consecutive_failure").get
      val data = parse(cf.body)
      assert(data.get("destination_id").asText == "d_f")
      assert(data.get("failure_count").asInt > 0)
    } finally st.close()
  }
}
