package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.HttpApi
import graft.core.Tables

/** End-to-end drive of the HTTP shell: list + cursor pagination, point
  * retrieve, metrics with allowlists and the 400-on-resource-limit
  * contract, and destination CRUD — all through real HTTP against the
  * same typed operators the gate queries pin. */
class HttpApiSpec extends GraftSuite {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def get(server: HttpApi.Server, pathAndQuery: String): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def send(server: HttpApi.Server, method: String, path: String,
                   body: String = ""): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$path"))
    val req = method match {
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body)).build()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case "DELETE" => b.DELETE().build()
    }
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def withServer[A](f: HttpApi.Server => A): A = {
    val destTable = java.nio.file.Files
      .createTempDirectory("graft_api").toString + "/destinations"
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf),
      destTable = destTable,
      storeSecret = "api-secret"))
    try f(server) finally server.stop()
  }

  test("event GET plans from manifest key blooms when eventsTable is set") {
    val base = java.nio.file.Files.createTempDirectory("graft_api_pl").toString
    val table = s"$base/events"
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    (0 until 3).foreach { b =>
      graft.operators.CommitLog.append(
        ev.filter(org.apache.spark.sql.functions
          .pmod(org.apache.spark.sql.functions.col("event_id"),
            org.apache.spark.sql.functions.lit(3)) === b),
        table, idCol = "event_id", tsCol = "ts", keyBlooms = true)
    }
    val server = HttpApi.start(spark, HttpApi.Config(
      events = graft.operators.CommitLog.scan(spark, table),
      destTable = s"$base/destinations",
      storeSecret = "api-secret",
      eventsTable = Some(table)))
    try {
      val (c1, one) = get(server, "/api/v1/t1/events/424")
      assert(c1 == 200 && one.get("event_id").asLong == 424L, one)
      // the bloom path really is in play: a miss prunes every file
      val (surv, total) = graft.operators.CommitLog.filesForKey(table, 999999999L)
      assert(total == 3 && surv.size <= 1, surv.map(_.path))
      assert(get(server, "/api/v1/t1/events/999999999")._1 == 404)
      assert(get(server, "/api/v1/t1/events/not-a-number")._1 == 400)

      // SERVING-PATH CACHE (r10): sequential lookups with no intervening
      // commit replay the manifest at most once — the Snapshot is cached
      // keyed by the log head, decoded blooms by their payload.
      val r0 = graft.operators.CommitLog.manifestReplays.get()
      (0 until 10).foreach { i =>
        val id = if (i % 2 == 0) 424L else 999999000L + i
        val code = get(server, s"/api/v1/t1/events/$id")._1
        assert(code == 200 || code == 404)
      }
      val r1 = graft.operators.CommitLog.manifestReplays.get()
      assert(r1 - r0 <= 1, s"manifest replayed ${r1 - r0} times across 10 lookups")

      // a new commit invalidates exactly once (incremental delta replay),
      // and the freshly committed key is immediately visible
      import org.apache.spark.sql.functions.{col, lit}
      graft.operators.CommitLog.append(
        ev.filter(col("event_id") === 424).withColumn("event_id", lit(77777777L)),
        table, idCol = "event_id", tsCol = "ts", keyBlooms = true)
      val r2 = graft.operators.CommitLog.manifestReplays.get()
      val (cNew, rowNew) = get(server, "/api/v1/t1/events/77777777")
      assert(cNew == 200 && rowNew.get("event_id").asLong == 77777777L, rowNew)
      assert(get(server, "/api/v1/t1/events/424")._1 == 200)
      val r3 = graft.operators.CommitLog.manifestReplays.get()
      assert(r3 - r2 <= 1,
        s"post-commit lookups replayed ${r3 - r2} times (expected one delta)")
    } finally server.stop()
  }

  test("events: list clamps limits, paginates by cursor, retrieves by id") {
    withServer { s =>
      // limit clamp: absent → default 100; over max → 1000; invalid → default
      val (c1, page1) = get(s, "/api/v1/t1/events?limit=5&order=asc")
      assert(c1 == 200 && page1.get("models").size == 5)
      val firstIds = (0 until 5).map(page1.get("models").get(_).get("event_id").asLong)
      assert(page1.hasNonNull("next"))

      // page 2 via the returned cursor — no overlap, continues the order
      val (c2, page2) = get(s,
        s"/api/v1/t1/events?limit=5&order=asc&next=${page1.get("next").asText}")
      assert(c2 == 200 && page2.get("models").size == 5)
      val secondIds = (0 until 5).map(page2.get("models").get(_).get("event_id").asLong)
      assert(firstIds.toSet.intersect(secondIds.toSet).isEmpty)

      // walking BACK from page 2 reproduces page 1 exactly
      assert(page2.hasNonNull("prev"))
      val (c3, back) = get(s,
        s"/api/v1/t1/events?limit=5&order=asc&prev=${page2.get("prev").asText}")
      assert(c3 == 200)
      val backIds = (0 until back.get("models").size)
        .map(back.get("models").get(_).get("event_id").asLong)
      assert(backIds == firstIds)

      // filtered list: every returned row has the requested type
      val (c4, filtered) = get(s, "/api/v1/t1/events?event_type[]=purchase&limit=10")
      assert(c4 == 200)
      (0 until filtered.get("models").size).foreach { i =>
        assert(filtered.get("models").get(i).get("event_type").asText == "purchase")
      }

      // point retrieve round-trips; missing id → 404
      val (c5, one) = get(s, s"/api/v1/t1/events/${firstIds.head}")
      assert(c5 == 200 && one.get("event_id").asLong == firstIds.head)
      assert(get(s, "/api/v1/t1/events/999999999")._1 == 404)
      assert(get(s, "/api/v1/t1/events/not-a-number")._1 == 400)
    }
  }

  test("metrics: buckets, allowlists, and the 400-on-resource-limit contract") {
    withServer { s =>
      val range = "start=2024-01-01T00:00:00Z&end=2024-01-02T00:00:00Z"
      val (c1, res) = get(s,
        s"/api/v1/t1/metrics/events?measures[]=count&granularity=1h&$range")
      assert(c1 == 200)
      assert(res.get("buckets").size == 24, s"dense fill: got ${res.get("buckets").size}")

      // dimensions ride the allowlist
      val (c2, dims) = get(s,
        s"/api/v1/t1/metrics/events?measures[]=count&dimensions[]=event_type&granularity=1d&$range")
      assert(c2 == 200 && dims.get("buckets").size > 0)

      // unknown measure / dimension / missing params → 400
      assert(get(s, s"/api/v1/t1/metrics/events?measures[]=bogus&granularity=1h&$range")._1 == 400)
      assert(get(s, s"/api/v1/t1/metrics/events?measures[]=count&dimensions[]=secret_col&granularity=1h&$range")._1 == 400)
      assert(get(s, s"/api/v1/t1/metrics/events?granularity=1h&$range")._1 == 400)
      assert(get(s, s"/api/v1/t1/metrics/events?measures[]=count&granularity=1h&start=2024-01-02T00:00:00Z&end=2024-01-01T00:00:00Z")._1 == 400)

      // resource guard: second-granularity over a decade = ~3.2e8 slots,
      // far past MaxRowsToGroupBy -> client 400, not a cluster job
      val (cLimit, limitBody) = get(s,
        "/api/v1/t1/metrics/events?measures[]=count&granularity=1s&start=2014-01-01T00:00:00Z&end=2024-01-01T00:00:00Z")
      assert(cLimit == 400, s"expected 400, got $cLimit: $limitBody")
    }
  }

  test("destinations: CRUD through HTTP with encrypted round-trip") {
    withServer { s =>
      val body =
        """{"type":"webhook","topics":["order.*"],
          |"credentials":{"secret":"s3cr3t"},"config":{"url":"https://x.test/hook"}}""".stripMargin
      val (c1, created) = send(s, "PUT", "/api/v1/t1/destinations/d1", body)
      assert(c1 == 201 && created.get("destination_id").asText == "d1")

      // duplicate live create → 409
      assert(send(s, "PUT", "/api/v1/t1/destinations/d1", body)._1 == 409)

      // retrieve decrypts credentials
      val (c2, got) = get(s, "/api/v1/t1/destinations/d1")
      assert(c2 == 200 && got.get("credentials").get("secret").asText == "s3cr3t")
      assert(got.get("config").get("url").asText == "https://x.test/hook")

      // list sees it; type filter works
      val (c3, listed) = get(s, "/api/v1/t1/destinations?type[]=webhook")
      assert(c3 == 200 && listed.size == 1)

      // delete → retrieve 404s, re-delete no-op 200, never-existed 404
      assert(send(s, "DELETE", "/api/v1/t1/destinations/d1")._1 == 200)
      assert(get(s, "/api/v1/t1/destinations/d1")._1 == 404)
      assert(send(s, "DELETE", "/api/v1/t1/destinations/d1")._1 == 200)
      assert(send(s, "DELETE", "/api/v1/t1/destinations/never")._1 == 404)

      // malformed body → 400
      assert(send(s, "PUT", "/api/v1/t1/destinations/d2", """{"topics":[]}""")._1 == 400)
    }
  }

  test("tenants: upsert/retrieve/token/cascade-delete; enable/disable; type+topic listings") {
    val base = java.nio.file.Files.createTempDirectory("graft_api_ten").toString
    val registry = new graft.streaming.Sinks.Registry(Seq(
      graft.streaming.Sinks.FileWebhookSink(s"$base/out", "sec")))
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = s"$base/destinations",
      storeSecret = "api-secret", availableTopics = Seq("order.created", "user.updated"),
      tenantTable = Some(s"$base/tenants"), registry = Some(registry)))
    try {
      val s = server
      // static catalogs
      val (tc, topics) = get(s, "/api/v1/topics")
      assert(tc == 200 && (0 until topics.size).map(topics.get(_).asText) ==
        Seq("order.created", "user.updated"))
      val (dc, dts) = get(s, "/api/v1/destination-types")
      assert(dc == 200 && dts.size == 1 && dts.get(0).get("type").asText == "webhook")
      assert(get(s, "/api/v1/destination-types/webhook")._1 == 200)
      assert(get(s, "/api/v1/destination-types/bogus")._1 == 404)

      // create (201) → update replaces metadata (200), preserves created_at
      val (c1, t1) = send(s, "PUT", "/api/v1/tenants/acme",
        """{"metadata":{"tier":"gold"}}""")
      assert(c1 == 201 && t1.get("metadata").get("tier").asText == "gold")
      val (c2, t2) = send(s, "PUT", "/api/v1/tenants/acme",
        """{"metadata":{"tier":"silver"}}""")
      assert(c2 == 200 && t2.get("metadata").get("tier").asText == "silver")
      assert(t2.get("created_at").asText == t1.get("created_at").asText)
      assert(get(s, "/api/v1/tenants/nope")._1 == 404)

      // destinations roll up into the view (count + union topics)
      assert(send(s, "PUT", "/api/v1/acme/destinations/d1",
        """{"type":"webhook","topics":["order.created"],"config":{"url":"http://example.test/hook"}}""")._1 == 201)
      assert(send(s, "PUT", "/api/v1/acme/destinations/d2",
        """{"type":"webhook","topics":["user.updated"],"config":{"url":"http://example.test/hook"}}""")._1 == 201)
      val (_, view) = get(s, "/api/v1/tenants/acme")
      assert(view.get("destinations_count").asLong == 2)
      assert((0 until view.get("topics").size).map(view.get("topics").get(_).asText).toSet ==
        Set("order.created", "user.updated"))

      // HS256 token: three dot-joined segments, signature verifies
      val (tkc, tok) = get(s, "/api/v1/tenants/acme/token")
      assert(tkc == 200)
      val parts = tok.get("token").asText.split('.')
      assert(parts.length == 3)
      val expSig = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(
        graft.functions.Crypto.hmac("HmacSHA256", "api-secret".getBytes("UTF-8"),
          s"${parts(0)}.${parts(1)}".getBytes("UTF-8")))
      assert(parts(2) == expSig)
      val payload = mapper.readTree(java.util.Base64.getUrlDecoder.decode(parts(1)))
      assert(payload.get("sub").asText == "acme")
      assert(get(s, "/api/v1/tenants/nope/token")._1 == 404)

      // disable sets disabled_at; enable clears it
      val (dis, dBody) = send(s, "PUT", "/api/v1/acme/destinations/d1/disable")
      assert(dis == 200 && dBody.hasNonNull("disabled_at"))
      val (en, eBody) = send(s, "PUT", "/api/v1/acme/destinations/d1/enable")
      assert(en == 200 && !eBody.hasNonNull("disabled_at"))
      assert(send(s, "PUT", "/api/v1/acme/destinations/ghost/disable")._1 == 404)

      // cascade delete: tenant 404s and its destinations are gone
      assert(send(s, "DELETE", "/api/v1/tenants/acme")._1 == 200)
      assert(get(s, "/api/v1/tenants/acme")._1 == 404)
      assert(get(s, "/api/v1/acme/destinations/d1")._1 == 404)
      assert(send(s, "DELETE", "/api/v1/tenants/acme")._1 == 404)
    } finally server.stop()

    // RESTART: the op-seq counter must seed past TENANT rows too, or a
    // post-restart update ties with (and can lose to) the pre-restart row
    val server2 = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = s"$base/destinations",
      storeSecret = "api-secret", tenantTable = Some(s"$base/tenants")))
    try {
      assert(send(server2, "PUT", "/api/v1/tenants/umbrella",
        """{"metadata":{"v":"1"}}""")._1 == 201)
    } finally server2.stop()
    val server3 = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = s"$base/destinations",
      storeSecret = "api-secret", tenantTable = Some(s"$base/tenants")))
    try {
      assert(send(server3, "PUT", "/api/v1/tenants/umbrella",
        """{"metadata":{"v":"2"}}""")._1 == 200)
      val (_, v) = get(server3, "/api/v1/tenants/umbrella")
      assert(v.get("metadata").get("v").asText == "2",
        "post-restart update lost to a pre-restart row (op_seq reuse)")
    } finally server3.stop()
  }

  test("attempts: tenant-scoped list/paginate/retrieve + attempt-measure metrics") {
    val spark2 = spark
    import spark2.implicits._
    val ts = (m: Int) => java.sql.Timestamp.from(
      java.time.Instant.parse(f"2024-03-01T10:$m%02d:00Z"))
    val attempts = (1 to 8).map { i =>
      (s"att_$i", s"e$i", if (i % 2 == 0) "t1" else "t2", s"d${i % 3}",
       "webhook", 1, false, if (i <= 4) "failed" else "success",
       ts(i), if (i <= 4) "500" else "200",
       ts(i), "order.created", s"""{"n":$i}""", Map.empty[String, String], true)
    }.toDF("attempt_id", "event_id", "tenant_id", "destination_id",
      "destination_type", "attempt_number", "manual", "status",
      "attempt_time", "code", "event_time", "topic", "data", "metadata",
      "eligible_for_retry")
    val base = java.nio.file.Files.createTempDirectory("graft_api_att").toString
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = s"$base/destinations",
      storeSecret = "api-secret", attempts = Some(() => attempts)))
    try {
      val s = server
      // tenant scoping + status filter
      val (c1, l1) = get(s, "/api/v1/t1/attempts?status=failed&order=asc")
      assert(c1 == 200)
      val ids = (0 until l1.get("models").size).map(l1.get("models").get(_).get("attempt_id").asText)
      assert(ids == Seq("att_2", "att_4"))
      // keyset pagination over the tenant's attempts
      val (_, p1) = get(s, "/api/v1/t1/attempts?limit=2&order=asc")
      assert(p1.get("models").size == 2 && p1.hasNonNull("next"))
      val (_, p2) = get(s, s"/api/v1/t1/attempts?limit=2&order=asc&next=${p1.get("next").asText}")
      val page2Ids = (0 until p2.get("models").size).map(p2.get("models").get(_).get("attempt_id").asText)
      assert(page2Ids == Seq("att_6", "att_8"))
      // point retrieve respects tenant scope
      assert(get(s, "/api/v1/t1/attempts/att_2")._1 == 200)
      assert(get(s, "/api/v1/t1/attempts/att_1")._1 == 404)
      // destination-scoped attempts list (ListDestinationAttempts)
      val (dc2, dl) = get(s, "/api/v1/t1/destinations/d0/attempts?order=asc")
      assert(dc2 == 200)
      val dIds = (0 until dl.get("models").size).map(dl.get("models").get(_).get("attempt_id").asText)
      assert(dIds == Seq("att_6")) // t1 ∧ d0: only i=6 (even, 6%3==0)
      assert(get(s, "/api/v1/t1/destinations/d0/attempts/att_6")._1 == 200)
      // metrics: attempt-measure matrix, status dimension
      val (mc, m) = get(s, "/api/v1/t1/metrics/attempts?measures[]=count&measures[]=failed_count" +
        "&granularity=1h&dimensions[]=status" +
        "&start=2024-03-01T00:00:00Z&end=2024-03-01T23:59:59Z")
      assert(mc == 200)
      val buckets = (0 until m.get("buckets").size).map(m.get("buckets").get(_))
      val byStatus = buckets.filter(_.get("count").asLong > 0)
        .map(b => b.get("status").asText -> (b.get("count").asLong, b.get("failed_count").asLong))
        .toMap
      assert(byStatus == Map("failed" -> ((2L, 2L)), "success" -> ((2L, 0L))))
      // allowlist: unknown measure/dimension → 400
      assert(get(s, "/api/v1/t1/metrics/attempts?measures[]=bogus&granularity=1h" +
        "&start=2024-03-01T00:00:00Z&end=2024-03-01T23:59:59Z")._1 == 400)
      // not configured → 404
      withServer { bare => assert(get(bare, "/api/v1/t1/attempts")._1 == 404) }
    } finally server.stop()
  }

  test("retry: validation ladder, disabled/mismatch 400s, manual task lands in the spool") {
    val spark2 = spark
    import spark2.implicits._
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T10:00:00Z"))
    val attempts = Seq(
      ("att_1", "e1", "t1", "d1", "webhook", 1, false, "failed", t0, "500",
       t0, "order.created", """{"k":1}""", Map.empty[String, String], true),
      ("att_2", "e1", "t1", "d1", "webhook", 2, false, "failed", t0, "500",
       t0, "order.created", """{"k":1}""", Map.empty[String, String], true))
      .toDF("attempt_id", "event_id", "tenant_id", "destination_id",
        "destination_type", "attempt_number", "manual", "status",
        "attempt_time", "code", "event_time", "topic", "data", "metadata",
        "eligible_for_retry")
    val base = java.nio.file.Files.createTempDirectory("graft_api_rty").toString
    val spool = s"$base/retry"
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = s"$base/destinations",
      storeSecret = "api-secret", attempts = Some(() => attempts),
      retrySpool = Some(spool)))
    try {
      val s = server
      assert(send(s, "POST", "/api/v1/retry", "nope")._1 == 422)
      assert(send(s, "POST", "/api/v1/retry", """{"event_id":"e1"}""")._1 == 422)
      // unknown event → 404
      assert(send(s, "POST", "/api/v1/retry",
        """{"event_id":"ghost","destination_id":"d1"}""")._1 == 404)
      // destination missing → 404
      assert(send(s, "POST", "/api/v1/retry",
        """{"event_id":"e1","destination_id":"d1"}""")._1 == 404)
      // topic-mismatching destination → 400
      assert(send(s, "PUT", "/api/v1/t1/destinations/d1",
        """{"type":"webhook","topics":["user.*"],"config":{"url":"http://example.test/hook"}}""")._1 == 201)
      assert(send(s, "POST", "/api/v1/retry",
        """{"event_id":"e1","destination_id":"d1"}""")._1 == 400)
      // disabled destination → 400
      assert(send(s, "DELETE", "/api/v1/t1/destinations/d1")._1 == 200)
      assert(send(s, "PUT", "/api/v1/t1/destinations/d1",
        """{"type":"webhook","topics":["order.*"],"config":{"url":"http://example.test/hook"}}""")._1 == 201)
      assert(send(s, "PUT", "/api/v1/t1/destinations/d1/disable")._1 == 200)
      assert(send(s, "POST", "/api/v1/retry",
        """{"event_id":"e1","destination_id":"d1"}""")._1 == 400)
      // enabled + matching → 202, manual task in the spool at attempt 3
      assert(send(s, "PUT", "/api/v1/t1/destinations/d1/enable")._1 == 200)
      val (rc, r) = send(s, "POST", "/api/v1/retry",
        """{"event_id":"e1","destination_id":"d1"}""")
      assert(rc == 202 && r.get("attempt").asInt == 3)
      val task = spark.read.parquet(spool).collect()
      assert(task.length == 1)
      val row = task.head
      assert(row.getAs[String]("event_id") == "e1" &&
        row.getAs[String]("destination_id") == "d1" &&
        row.getAs[Int]("attempt") == 3 && row.getAs[Boolean]("manual"))
    } finally server.stop()
  }

  test("publish: validation, defaults, idempotency-conflict, spool file") {
    val spool = java.nio.file.Files
      .createTempDirectory("graft_pub").toString + "/spool"
    val destTable = java.nio.file.Files
      .createTempDirectory("graft_api_pub").toString + "/destinations"
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = destTable,
      storeSecret = "api-secret", publishSpool = Some(spool),
      availableTopics = Seq("order.created", "user.updated")))
    try {
      val s = server
      // reference publish_handlers.go validation ladder
      assert(send(s, "POST", "/api/v1/publish", "not json")._1 == 422)
      assert(send(s, "POST", "/api/v1/publish",
        """{"data":{"a":1}}""")._1 == 422) // tenant_id required
      assert(send(s, "POST", "/api/v1/publish",
        """{"tenant_id":"t1","topic":"order.created","data":"str"}""")._1 == 422)
      assert(send(s, "POST", "/api/v1/publish",
        """{"tenant_id":"t1","data":{"a":1}}""")._1 == 422) // topic required
      assert(send(s, "POST", "/api/v1/publish",
        """{"tenant_id":"t1","topic":"bogus.topic","data":{"a":1}}""")._1 == 422)

      // accepted: defaults applied, one spool file per event
      val (c1, r1) = send(s, "POST", "/api/v1/publish",
        """{"tenant_id":"t1","topic":"order.created","data":{"a":1}}""")
      assert(c1 == 202 && r1.get("id").asText.startsWith("evt_"))
      val (c2, _) = send(s, "POST", "/api/v1/publish",
        """{"id":"e-fixed","tenant_id":"t1","topic":"user.updated","time":"2024-01-01T00:00:00Z","data":{"b":2}}""")
      assert(c2 == 202)
      // duplicate id inside the idempotency window → 409
      assert(send(s, "POST", "/api/v1/publish",
        """{"id":"e-fixed","tenant_id":"t1","topic":"user.updated","data":{"b":2}}""")._1 == 409)

      val files = new java.io.File(spool).listFiles.filter(!_.isHidden).map(_.getName)
      assert(files.length == 2 && files.contains("e-fixed.json"))
      val fixed = mapper.readTree(
        new java.io.File(spool, "e-fixed.json"))
      assert(fixed.get("event_id").asText == "e-fixed")
      assert(fixed.get("event_time").asText == "2024-01-01T00:00:00Z")
      assert(fixed.get("eligible_for_retry").asBoolean)
      assert(fixed.get("metadata").isObject && fixed.get("metadata").size == 0)
      assert(fixed.get("data").get("b").asInt == 2)
    } finally server.stop()
  }
}
