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
