package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.api.{ApiContract, HttpApi}
import graft.core.Tables

/** Contract conformance: replay EVERY route in [[ApiContract.routes]]
  * against a live, fully-configured server and fail on any drift —
  * missing route, wrong status, missing/mistyped response field, or an
  * error case that stopped producing its contracted status. This is the
  * analog of the reference's Speakeasy SDK contract tests
  * (`spec-sdk-tests/tests/events.test.ts`): the machine-readable catalog
  * is the source of truth and the server must satisfy it.
  *
  * Drift is caught in BOTH directions: catalog→server by the replay, and
  * server→catalog by pinning the server's route-table arity against the
  * catalog (a route added to `HttpApi.handle` without a contract entry
  * fails the arity pin).
  */
class ApiContractSpec extends GraftSuite {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  private def call(server: HttpApi.Server, method: String, pathQuery: String,
                   body: String = ""): (Int, JsonNode) = {
    val b = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:${server.port}$pathQuery"))
    val req = method match {
      case "GET" => b.GET().build()
      case "DELETE" => b.DELETE().build()
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body)).build()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case "PATCH" =>
        b.method("PATCH", HttpRequest.BodyPublishers.ofString(body)).build()
    }
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(),
      try mapper.readTree(resp.body())
      catch { case _: Exception => mapper.nullNode() })
  }

  private def kindOk(node: JsonNode, kind: String): Boolean = kind match {
    case "string" => node.isTextual
    case "integer" => node.isIntegralNumber
    case "number" => node.isNumber
    case "boolean" => node.isBoolean
    case "array" => node.isArray
    case "object" => node.isObject
    case other => fail(s"unknown kind in contract: $other")
  }

  private def assertShape(route: String, node: JsonNode,
                          fields: Seq[ApiContract.Field]): Unit =
    fields.foreach { f =>
      val v = node.get(f.name)
      if (f.required)
        assert(v != null && !v.isNull, s"$route: missing required field ${f.name} in $node")
      if (v != null && !v.isNull)
        assert(kindOk(v, f.kind), s"$route: field ${f.name} is not ${f.kind}: $v")
    }

  private def withFullServer[A](f: HttpApi.Server => A): A = {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_contract").toString
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T10:00:00Z"))
    // attempts fixture: two t1 attempts against destination `dres` (the
    // retry + dest-scoped examples), one attempt owned by another tenant
    // (the tenant-scope 404 probe)
    val attempts = Seq(
      ("att_1", "e1", "t1", "dres", "webhook", 1, false, "failed", t0, "500",
        t0, "order.created", """{"k":1}""", Map.empty[String, String], true),
      ("att_2", "e2", "t1", "dres", "webhook", 1, false, "success", t0, "200",
        t0, "order.created", """{"k":2}""", Map.empty[String, String], true),
      ("att_other", "e9", "t2", "dx", "webhook", 1, false, "success", t0, "200",
        t0, "order.created", """{"k":9}""", Map.empty[String, String], true))
      .toDF("attempt_id", "event_id", "tenant_id", "destination_id",
        "destination_type", "attempt_number", "manual", "status",
        "attempt_time", "code", "event_time", "topic", "data", "metadata",
        "eligible_for_retry")
    val registry = new graft.streaming.Sinks.Registry(Seq(
      graft.streaming.Sinks.FileWebhookSink(s"$base/out", "sec")))
    // trace fixture: one received event, so the trace example has spans
    val traceTable = s"$base/traces"
    graft.streaming.EventTrace.append(
      graft.streaming.EventTrace.receiveSpans(
        Seq(("e1", "t1", t0)).toDF("event_id", "tenant_id", "event_time")),
      traceTable)
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf),
      destTable = s"$base/destinations",
      storeSecret = "contract-secret",
      tenantTable = Some(s"$base/tenants"),
      attempts = Some(() => attempts),
      publishSpool = Some(s"$base/publish"),
      retrySpool = Some(s"$base/retry"),
      availableTopics = Seq("order.created", "user.updated"),
      registry = Some(registry),
      traceTable = Some(traceTable)))
    try f(server) finally server.stop()
  }

  /** World state the examples assume, built through the API itself. */
  private def seedFixtures(s: HttpApi.Server): Unit = {
    assert(call(s, "PUT", "/api/v1/t1/destinations/dres",
      """{"type":"webhook","topics":["order.*"],"config":{"url":"http://example.test/hook"}}""")._1 == 201)
    assert(call(s, "PUT", "/api/v1/t1/destinations/ddel",
      """{"type":"webhook","topics":["order.*"],"config":{"url":"http://example.test/hook"}}""")._1 == 201)
    assert(call(s, "PUT", "/api/v1/t1/destinations/ddis",
      """{"type":"webhook","topics":["order.*"],"config":{"url":"http://example.test/hook"}}""")._1 == 201)
    assert(call(s, "PUT", "/api/v1/tenants/tdel", "{}")._1 == 201)
    // arm the publish idempotency probe: dup-1 is now inside the window
    assert(call(s, "POST", "/api/v1/publish",
      """{"tenant_id":"t1","data":{},"topic":"order.created","id":"dup-1"}""")._1 == 202)
  }

  test("every contracted route answers its example with the contracted status and shape") {
    withFullServer { s =>
      seedFixtures(s)
      ApiContract.routes.foreach { r =>
        val (code, body) = call(s, r.method, r.examplePathQuery, r.exampleBody)
        assert(code == r.successStatus,
          s"${r.method} ${r.examplePathQuery}: expected ${r.successStatus}, got $code: $body")
        r.responseKind match {
          case "text" => () // non-JSON (Prometheus exposition); status pinned above
          case "object" => assertShape(r.template, body, r.responseFields)
          case "array" =>
            assert(body.isArray, s"${r.template}: expected array, got $body")
            if (r.responseFields.nonEmpty && body.size > 0)
              assertShape(r.template, body.get(0), r.responseFields)
          case "list-page" =>
            val models = body.get("models")
            assert(models != null && models.isArray,
              s"${r.template}: expected models[], got $body")
            assert(models.size > 0,
              s"${r.template}: example returned an empty page — fixture drift")
            assertShape(r.template, models.get(0), r.responseFields)
        }
      }
    }
  }

  test("every contracted error case produces its status and the error envelope") {
    withFullServer { s =>
      seedFixtures(s)
      ApiContract.routes.foreach { r =>
        r.errors.foreach { e =>
          val (code, body) = call(s, e.method, e.pathQuery, e.body)
          assert(code == e.status,
            s"${e.method} ${e.pathQuery} (${e.condition}): expected ${e.status}, got $code: $body")
          assert(body.isObject && body.hasNonNull("error"),
            s"${e.method} ${e.pathQuery}: error envelope must be {error: string}, got $body")
        }
      }
    }
  }

  test("unknown routes 404 with the error envelope (no accidental catch-all)") {
    withFullServer { s =>
      Seq("GET" -> "/api/v1/definitely/not/a/route",
          "POST" -> "/api/v1/t1/events",
          "DELETE" -> "/api/v1/topics").foreach { case (m, p) =>
        val (code, body) = call(s, m, p)
        assert(code == 404 && body.hasNonNull("error"), s"$m $p: $code $body")
      }
    }
  }

  test("served openapi.json equals the compiled-in contract rendering") {
    withFullServer { s =>
      val (code, served) = call(s, "GET", "/api/v1/openapi.json")
      assert(code == 200)
      assert(served == mapper.readTree(ApiContract.renderOpenApi.toString),
        "served contract diverged from ApiContract.renderOpenApi")
      // and the document carries every contracted (template, method) pair
      ApiContract.routes.foreach { r =>
        val p = served.get("paths").get(r.template)
        assert(p != null && p.has(r.method.toLowerCase),
          s"openapi.json is missing ${r.method} ${r.template}")
      }
    }
  }

  test("server route table and contract stay in arity sync") {
    // server→catalog direction: a route added to HttpApi.handle without a
    // catalog entry must fail here. The route table is the match in
    // `handle`; count its arms straight from the source so the pin needs
    // no reflection. Skipped when the source tree isn't present (e.g.
    // running from a packaged jar).
    val src = java.nio.file.Paths.get("src/main/scala/graft/api/HttpApi.scala")
    assume(java.nio.file.Files.isReadable(src), "source tree not available")
    val text = new String(java.nio.file.Files.readAllBytes(src), "UTF-8")
    val arms = "case \\(\"(GET|PUT|POST|DELETE|PATCH)\"".r.findAllIn(text).size
    assert(arms == ApiContract.routes.size,
      s"HttpApi.handle has $arms route arms but ApiContract carries " +
        s"${ApiContract.routes.size} routes — update the catalog (and this pin)")
  }
}
