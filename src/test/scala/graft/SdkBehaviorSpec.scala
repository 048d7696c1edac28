package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.api.HttpApi
import graft.core.Tables

/** Port of the reference's SDK behavioral corpus
  * (the `.test.ts` files under `spec-sdk-tests/tests/` — VERDICT r13
  * task #3): the
  * scenarios three machine-generated SDKs replay against a live server,
  * re-expressed as table-driven HTTP cases asserting response BODY
  * shapes (field presence + JSON types), not just status codes.
  * `ApiContractSpec` pins the structural contract; this suite pins the
  * behavioral half — serialization round-trips through list/point/CRUD,
  * cursor walks, RFC 7396 merge-patch, and error-body shapes.
  *
  * Corpus → test mapping (reference file: scenario):
  *  - events.test.ts: array filter params, list by tenant, point
  *    retrieve, publish → attempt linkage, include=event.data
  *    denormalization
  *  - tenants.test.ts: tenants.list({limit}) model shape
  *  - topics.test.ts: topics.list string-array shape + configured topics
  *  - destinations/webhook.test.ts: CRUD round-trip, user-provided id,
  *    topics array, reject missing url/type/empty topics, 404s, list
  *    filter by type
  *  - destinations/webhook-merge-patch.test.ts: the seven metadata
  *    merge-patch laws (RFC 7396)
  */
class SdkBehaviorSpec extends GraftSuite {

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

  private def withServer[A](f: HttpApi.Server => A): A = {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sdk").toString
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-03-01T10:00:00Z"))
    val attempts = Seq(
      ("att_1", "e1", "t1", "dres", "webhook", 1, false, "success", t0, "200",
        t0, "order.created", """{"k":1}""", Map.empty[String, String], true),
      ("att_2", "e2", "t1", "dres", "webhook", 2, true, "failed", t0, "500",
        t0, "order.created", """{"k":2}""", Map.empty[String, String], true))
      .toDF("attempt_id", "event_id", "tenant_id", "destination_id",
        "destination_type", "attempt_number", "manual", "status",
        "attempt_time", "code", "event_time", "topic", "data", "metadata",
        "eligible_for_retry")
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf),
      destTable = s"$base/destinations",
      storeSecret = "sdk-secret",
      tenantTable = Some(s"$base/tenants"),
      attempts = Some(() => attempts),
      publishSpool = Some(s"$base/publish"),
      availableTopics = Seq("order.created", "user.updated")))
    try f(server) finally server.stop()
  }

  /** Event row shape: (field, json-type predicate). */
  private val eventShape: Seq[(String, JsonNode => Boolean)] = Seq(
    "event_id" -> (_.isIntegralNumber), "ts" -> (_.isTextual),
    "user_id" -> (_.isIntegralNumber), "event_type" -> (_.isTextual),
    "value" -> (_.isNumber), "props" -> (_.isTextual))

  private def assertShape(ctx: String, node: JsonNode,
                          shape: Seq[(String, JsonNode => Boolean)]): Unit =
    shape.foreach { case (name, ok) =>
      val v = node.get(name)
      assert(v != null && !v.isNull, s"$ctx: missing field $name in $node")
      assert(ok(v), s"$ctx: field $name has wrong JSON type: $v")
    }

  // ------------------------------------------------- events.test.ts ----

  test("events.list accepts array filter params and returns typed models") {
    withServer { s =>
      val (c, body) = call(s, "GET",
        "/api/v1/t1/events?event_type[]=click&event_type[]=view&limit=5&order=asc")
      assert(c == 200, body)
      val models = body.get("models")
      assert(models != null && models.isArray && models.size > 0, body)
      (0 until models.size).foreach { i =>
        assertShape(s"events.list[$i]", models.get(i), eventShape)
        assert(Set("click", "view")(models.get(i).get("event_type").asText))
      }
    }
  }

  test("events.list by tenant then point-retrieve the first listed id") {
    withServer { s =>
      val (c, body) = call(s, "GET", "/api/v1/t1/events?limit=3&order=asc")
      assert(c == 200 && body.get("models").size == 3, body)
      val id = body.get("models").get(0).get("event_id").asLong
      val (c2, one) = call(s, "GET", s"/api/v1/t1/events/$id")
      assert(c2 == 200, one)
      assertShape("events.get", one, eventShape)
      assert(one.get("event_id").asLong == id)
    }
  }

  test("publish answers 202 {id, status}; the destination attempts list links event_id and carries status + denormalized data") {
    withServer { s =>
      // sdk.publish(...) → PublishResponse with the event id
      val (c, pub) = call(s, "POST", "/api/v1/publish",
        """{"tenant_id":"t1","data":{"test":"event-generates-attempt"},"topic":"order.created","id":"sdk-pub-1"}""")
      assert(c == 202, pub)
      assert(pub.get("id").isTextual && pub.get("id").asText == "sdk-pub-1", pub)
      assert(pub.get("status").isTextual, pub)

      // destinations.listAttempts({destinationId, eventId}) — the fixture
      // attempt for e1/dres plays the delivered event; the SDK corpus
      // asserts attempt.eventId == requested and attempt.status
      val (c2, al) = call(s, "GET",
        "/api/v1/t1/destinations/dres/attempts?event_id[]=e1")
      assert(c2 == 200, al)
      val models = al.get("models")
      assert(models.isArray && models.size == 1, al)
      val att = models.get(0)
      assert(att.get("event_id").asText == "e1", att)
      assert(att.get("status").asText == "success", att)
      // include=event.data behavior: rows are always denormalized — the
      // event payload rides `data` on every attempt row (the documented
      // adaptation of include=event.data / response_data)
      val data = mapper.readTree(att.get("data").asText)
      assert(data.isObject && data.get("k").asInt == 1, att)
      assert(att.get("code").isTextual, att)
    }
  }

  // ------------------------------------------------ tenants.test.ts ----

  test("tenants.list({limit}) returns {models[]} with typed tenant rows") {
    withServer { s =>
      assert(call(s, "PUT", "/api/v1/tenants/tn1", "{}")._1 == 201)
      assert(call(s, "PUT", "/api/v1/tenants/tn2", "{}")._1 == 201)
      val (c, body) = call(s, "GET", "/api/v1/tenants?limit=5")
      assert(c == 200, body)
      val models = body.get("models")
      assert(models != null && models.isArray && models.size >= 2, body)
      (0 until models.size).foreach { i =>
        val t = models.get(i)
        assert(t.isObject && t.get("id").isTextual, s"tenant[$i]: $t")
        assert(t.get("created_at").isTextual && t.get("topics").isArray, t)
      }
    }
  }

  // ------------------------------------------------- topics.test.ts ----

  test("topics.list returns the configured non-empty string array") {
    withServer { s =>
      val (c, topics) = call(s, "GET", "/api/v1/topics")
      assert(c == 200 && topics.isArray, topics)
      (0 until topics.size).foreach { i =>
        assert(topics.get(i).isTextual && topics.get(i).asText.nonEmpty,
          s"topic[$i]: $topics")
      }
      val set = (0 until topics.size).map(topics.get(_).asText).toSet
      assert(set == Set("order.created", "user.updated"), set)
    }
  }

  // ------------------------------------- destinations/webhook.test.ts ----

  test("destination create: valid config echoes; server-generated and user-provided ids; topics array round-trips") {
    withServer { s =>
      // valid create without id → 201, server-generated des_ id, config echo
      val (c1, d1) = call(s, "POST", "/api/v1/t1/destinations",
        """{"type":"webhook","topics":["order.created"],"config":{"url":"https://x.test/hook"}}""")
      assert(c1 == 201, d1)
      assert(d1.get("type").asText == "webhook", d1)
      assert(d1.get("config").get("url").asText == "https://x.test/hook", d1)
      assert(d1.get("destination_id").asText.startsWith("des_"), d1)

      // array of topics round-trips with length + membership
      val (c2, d2) = call(s, "POST", "/api/v1/t1/destinations",
        """{"type":"webhook","topics":["order.created","user.updated"],"config":{"url":"https://x.test/hook2"}}""")
      assert(c2 == 201, d2)
      val topics = d2.get("topics")
      assert(topics.isArray && topics.size == 2, d2)
      val got = (0 until 2).map(topics.get(_).asText).toSet
      assert(got == Set("order.created", "user.updated"), d2)

      // user-provided id is honored
      val (c3, d3) = call(s, "POST", "/api/v1/t1/destinations",
        """{"id":"custom-webhook-1","type":"webhook","topics":["order.created"],"config":{"url":"https://x.test/hook3"}}""")
      assert(c3 == 201 && d3.get("destination_id").asText == "custom-webhook-1", d3)
    }
  }

  test("destination create rejections: missing url → 422 field details; missing type and empty topics → 4xx envelope") {
    withServer { s =>
      // missing required config field url → 422 with per-field details
      val (c1, b1) = call(s, "POST", "/api/v1/t1/destinations",
        """{"type":"webhook","topics":["order.created"],"config":{}}""")
      assert(c1 == 422, b1)
      assert(b1.get("error").asText == "validation error", b1)
      assert(b1.get("data").get(0).get("field").asText == "config.url", b1)
      assert(b1.get("data").get(0).get("type").asText == "required", b1)

      // missing type → client error with the error envelope
      val (c2, b2) = call(s, "POST", "/api/v1/t1/destinations",
        """{"topics":["order.created"],"config":{"url":"https://x.test/hook"}}""")
      assert(c2 == 400 || c2 == 422, b2)
      assert(b2.isObject && b2.hasNonNull("error"), b2)

      // empty topics → client error with the error envelope
      val (c3, b3) = call(s, "POST", "/api/v1/t1/destinations",
        """{"type":"webhook","topics":[],"config":{"url":"https://x.test/hook"}}""")
      assert(c3 == 400 || c3 == 422, b3)
      assert(b3.isObject && b3.hasNonNull("error"), b3)
    }
  }

  test("destination retrieve/list/update/delete round-trip with 404 shapes") {
    withServer { s =>
      assert(call(s, "PUT", "/api/v1/t1/destinations/dweb",
        """{"type":"webhook","topics":["order.created"],"config":{"url":"https://x.test/hook"}}""")._1 == 201)

      // retrieve: full shape
      val (c1, d) = call(s, "GET", "/api/v1/t1/destinations/dweb")
      assert(c1 == 200, d)
      assert(d.get("destination_id").asText == "dweb" &&
        d.get("type").asText == "webhook" &&
        d.get("config").get("url").isTextual &&
        d.get("created_at").isTextual && d.get("updated_at").isTextual, d)

      // retrieve unknown → 404 {error}
      val (c404, b404) = call(s, "GET", "/api/v1/t1/destinations/nope-12345")
      assert(c404 == 404 && b404.hasNonNull("error"), b404)

      // list all → array with our destination; filter by type
      val (c2, list) = call(s, "GET", "/api/v1/t1/destinations")
      assert(c2 == 200 && list.isArray && list.size >= 1, list)
      val (c3, fl) = call(s, "GET", "/api/v1/t1/destinations?type[]=webhook")
      assert(c3 == 200 && fl.isArray, fl)
      (0 until fl.size).foreach(i =>
        assert(fl.get(i).get("type").asText == "webhook", fl))

      // PATCH topics replaces; PATCH config updates url
      val (c4, u1) = call(s, "PATCH", "/api/v1/t1/destinations/dweb",
        """{"type":"webhook","topics":["user.updated","order.created"]}""")
      assert(c4 == 200, u1)
      assert((0 until u1.get("topics").size).map(u1.get("topics").get(_).asText)
        .toSet == Set("user.updated", "order.created"), u1)
      val (c5, u2) = call(s, "PATCH", "/api/v1/t1/destinations/dweb",
        """{"config":{"url":"https://updated.x.test/hook"}}""")
      assert(c5 == 200 &&
        u2.get("config").get("url").asText == "https://updated.x.test/hook", u2)

      // PATCH unknown → 404
      assert(call(s, "PATCH", "/api/v1/t1/destinations/nope-12345",
        """{"topics":["order.created"]}""")._1 == 404)

      // delete → subsequent retrieve 404s
      assert(call(s, "DELETE", "/api/v1/t1/destinations/dweb")._1 == 200)
      assert(call(s, "GET", "/api/v1/t1/destinations/dweb")._1 == 404)
      // delete unknown → 404 envelope
      val (c6, b6) = call(s, "DELETE", "/api/v1/t1/destinations/nope-12345")
      assert(c6 == 404 && b6.hasNonNull("error"), b6)
    }
  }

  // --------------------------- destinations/webhook-merge-patch.test.ts --

  /** The seven metadata merge-patch laws, table-driven:
    * (initial metadata, patch body fragment, expected metadata). A `None`
    * fragment omits the field entirely. */
  private val mergePatchLaws: Seq[(String, Map[String, String], Option[String], Map[String, String])] = Seq(
    ("add key preserving existing", Map("env" -> "prod"),
      Some("""{"env":"prod","team":"platform"}"""),
      Map("env" -> "prod", "team" -> "platform")),
    ("update existing key", Map("env" -> "prod"),
      Some("""{"env":"staging"}"""), Map("env" -> "staging")),
    ("delete key via null value", Map("env" -> "prod", "region" -> "us-east-1"),
      Some("""{"env":"prod","region":null}"""), Map("env" -> "prod")),
    ("clear entire field via null", Map("env" -> "prod"),
      Some("null"), Map.empty),
    ("empty object is a no-op", Map("env" -> "prod"),
      Some("{}"), Map("env" -> "prod")),
    ("omitted field is a no-op", Map("env" -> "prod"),
      None, Map("env" -> "prod")),
    ("mixed add/update/delete",
      Map("keep" -> "v", "remove" -> "v", "update" -> "old"),
      Some("""{"keep":"v","remove":null,"update":"new","add":"v"}"""),
      Map("keep" -> "v", "update" -> "new", "add" -> "v")))

  test("metadata merge-patch follows RFC 7396 (seven laws)") {
    withServer { s =>
      mergePatchLaws.zipWithIndex.foreach {
        case ((law, initial, fragment, expected), i) =>
          val id = s"dmp$i"
          val metaJson = initial.map { case (k, v) => s""""$k":"$v"""" }
            .mkString("{", ",", "}")
          assert(call(s, "PUT", s"/api/v1/t1/destinations/$id",
            s"""{"type":"webhook","topics":["order.created"],
               |"config":{"url":"https://x.test/hook"},
               |"metadata":$metaJson}""".stripMargin)._1 == 201, law)
          val patchBody = fragment match {
            case Some(f) => s"""{"metadata":$f}"""
            case None => """{"topics":["order.created"]}"""
          }
          val (c, updated) = call(s, "PATCH", s"/api/v1/t1/destinations/$id",
            patchBody)
          assert(c == 200, s"$law: $updated")
          val got = {
            val m = updated.get("metadata")
            val it = m.properties.iterator()
            val b = Map.newBuilder[String, String]
            while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
            b.result()
          }
          assert(got == expected, s"$law: patched $got, expected $expected")
          // the stored record agrees with the PATCH response
          val (_, reread) = call(s, "GET", s"/api/v1/t1/destinations/$id")
          assert(reread.get("metadata").toString == updated.get("metadata").toString,
            s"$law: stored ${reread.get("metadata")} != response ${updated.get("metadata")}")
      }
    }
  }

  // ----------------------------------------------------- cursor walk ----

  test("cursor walk: three pages serialize disjoint ordered ids; prev returns to page 1") {
    withServer { s =>
      def page(q: String): (Seq[Long], Option[String], Option[String]) = {
        val (c, body) = call(s, "GET", s"/api/v1/t1/events?limit=5&order=asc$q")
        assert(c == 200, body)
        val ids = (0 until body.get("models").size)
          .map(body.get("models").get(_).get("event_id").asLong)
        (ids,
          Option(body.get("next")).filterNot(_.isNull).map(_.asText),
          Option(body.get("prev")).filterNot(_.isNull).map(_.asText))
      }
      val (p1, n1, _) = page("")
      val (p2, n2, prev2) = page(s"&next=${n1.get}")
      val (p3, _, _) = page(s"&next=${n2.get}")
      val all = p1 ++ p2 ++ p3
      assert(all.size == 15 && all.distinct.size == 15, s"overlap: $all")
      assert(all == all.sorted, s"order broken across pages: $all")
      // prev cursor from page 2 returns exactly page 1 (round-trip
      // through the base62 cursor codec both directions)
      val (back, _, _) = page(s"&prev=${prev2.get}")
      assert(back == p1, s"prev walk: $back != $p1")
    }
  }

  // ----------------------------------------------------- error shapes ----

  /** 404/400/422 across resources: every error body is the {error}
    * envelope; validation errors add typed per-field details. */
  private val errorCases: Seq[(String, String, String, Int)] = Seq(
    ("GET", "/api/v1/t1/events/999999999999", "", 404),
    ("GET", "/api/v1/t1/events/not-a-number", "", 400),
    ("GET", "/api/v1/t1/attempts/ghost", "", 404),
    ("GET", "/api/v1/tenants/ghost-tenant", "", 404),
    ("POST", "/api/v1/publish", """{"data":{}}""", 422),
    ("POST", "/api/v1/publish", "not json", 422))

  test("error bodies carry the error envelope at the contracted status") {
    withServer { s =>
      errorCases.foreach { case (m, p, b, want) =>
        val (c, body) = call(s, m, p, b)
        assert(c == want, s"$m $p: expected $want, got $c: $body")
        assert(body.isObject && body.hasNonNull("error") &&
          body.get("error").isTextual, s"$m $p: $body")
      }
    }
  }
}
