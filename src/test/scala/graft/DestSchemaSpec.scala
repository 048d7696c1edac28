package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.api.{DestMetadata, HttpApi}
import graft.core.Tables

/** Per-provider destination config/credentials schema validation
  * (reference `destregistry/metadata/providers/<type>/metadata.json` +
  * `baseprovider.go` Validate): create/update 422 on schema violations so
  * a malformed destination fails at the API, not at delivery time. */
class DestSchemaSpec extends GraftSuite {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newHttpClient()

  // ------------------------------------------------------ unit: validate --

  /** One known-valid (config, credentials) pair per provider. */
  private val validSamples: Map[String, (Map[String, String], Map[String, String])] = Map(
    "webhook" -> (Map("url" -> "https://x.test/hook"), Map.empty),
    "webhook_standard" -> (Map("url" -> "http://x.test/hook"), Map.empty),
    "kafka" -> (Map("brokers" -> "b1:9092,b2:9092", "topic" -> "t",
      "sasl_mechanism" -> "plain", "tls" -> "true"),
      Map("username" -> "u", "password" -> "p")),
    "rabbitmq" -> (Map("server_url" -> "amqp://mq:5672", "tls" -> "on"),
      Map("username" -> "u", "password" -> "p")),
    "aws_sqs" -> (Map("queue_url" -> "https://sqs.us-east-1.amazonaws.com/1/q"),
      Map("key" -> "AKIA", "secret" -> "s3")),
    "aws_kinesis" -> (Map("stream_name" -> "my-stream_1", "region" -> "us-east-1"),
      Map("key" -> "AKIA", "secret" -> "s3")),
    "aws_s3" -> (Map("bucket" -> "b", "region" -> "eu-west-2"),
      Map("key" -> "AKIA", "secret" -> "s3")),
    "azure_servicebus" -> (Map("name" -> "queue-1"),
      Map("connection_string" -> "Endpoint=sb://x/;Key=k")),
    "gcp_pubsub" -> (Map("project_id" -> "p", "topic" -> "t"),
      Map("service_account_json" -> """{"type":"service_account"}""")),
    "hookdeck" -> (Map.empty[String, String], Map("token" -> "tok")))

  test("every packaged provider accepts its valid sample") {
    assert(DestMetadata.providers.keySet == validSamples.keySet)
    for ((tpe, (cfg, creds)) <- validSamples)
      assert(DestMetadata.validate(tpe, cfg, creds).isEmpty,
        s"$tpe rejected its valid sample")
  }

  test("missing required fields: one error per absent field, reference order") {
    // dropping EVERY field reports exactly the required set, config first
    for ((tpe, _) <- validSamples) {
      val p = DestMetadata.providers(tpe)
      val expected =
        p.configFields.filter(_.required).map(f => s"config.${f.key}") ++
        p.credentialFields.filter(_.required).map(f => s"credentials.${f.key}")
      val got = DestMetadata.validate(tpe, Map.empty, Map.empty)
      assert(got.map(_.field) == expected, s"$tpe: $got")
      assert(got.forall(_.errType == "required"))
    }
  }

  test("empty string counts as absent (reference zero-value read)") {
    val errs = DestMetadata.validate("webhook", Map("url" -> ""), Map.empty)
    assert(errs == Seq(DestMetadata.ValidationError("config.url", "required")))
  }

  test("pattern violations: webhook url, kinesis region/stream, rabbitmq url") {
    def one(tpe: String, cfg: Map[String, String], creds: Map[String, String],
            field: String): Unit = {
      val (vc, vr) = validSamples(tpe)
      val errs = DestMetadata.validate(tpe, vc ++ cfg, vr ++ creds)
      assert(errs == Seq(DestMetadata.ValidationError(field, "pattern")),
        s"$tpe/$field: $errs")
    }
    one("webhook", Map("url" -> "ftp://x.test/hook"), Map.empty, "config.url")
    one("webhook", Map("url" -> "https://x .test"), Map.empty, "config.url")
    one("aws_kinesis", Map("region" -> "US-EAST-1"), Map.empty, "config.region")
    one("aws_kinesis", Map("stream_name" -> "bad stream"), Map.empty,
      "config.stream_name")
    one("rabbitmq", Map("server_url" -> "host with spaces"), Map.empty,
      "config.server_url")
    one("azure_servicebus", Map("name" -> "-leading"), Map.empty, "config.name")
  }

  test("kafka: sasl_mechanism option list and tls literal enforced") {
    val (cfg, creds) = validSamples("kafka")
    assert(DestMetadata.validate("kafka", cfg + ("sasl_mechanism" -> "gssapi"), creds) ==
      Seq(DestMetadata.ValidationError("config.sasl_mechanism", "invalid")))
    assert(DestMetadata.validate("kafka", cfg + ("tls" -> "yes"), creds) ==
      Seq(DestMetadata.ValidationError("config.tls", "invalid")))
    // scram variants pass
    for (m <- Seq("plain", "scram-sha-256", "scram-sha-512"))
      assert(DestMetadata.validate("kafka", cfg + ("sasl_mechanism" -> m), creds).isEmpty)
  }

  test("rabbitmq: tls literal enforced, on/true/false accepted") {
    val (cfg, creds) = validSamples("rabbitmq")
    assert(DestMetadata.validate("rabbitmq", cfg + ("tls" -> "1"), creds) ==
      Seq(DestMetadata.ValidationError("config.tls", "invalid")))
    for (v <- Seq("on", "true", "false"))
      assert(DestMetadata.validate("rabbitmq", cfg + ("tls" -> v), creds).isEmpty)
  }

  test("unknown provider type → invalid_type; unknown extra keys ignored") {
    assert(DestMetadata.validate("smoke-signal", Map.empty, Map.empty) ==
      Seq(DestMetadata.ValidationError("type", "invalid_type")))
    // the reference's validator checks DECLARED fields only — extra keys
    // pass through (they're preserved on the record, not rejected)
    val (cfg, creds) = validSamples("webhook")
    assert(DestMetadata.validate("webhook", cfg + ("x" -> "y"), creds).isEmpty)
  }

  // ------------------------------------------------------- HTTP contract --

  private def send(server: HttpApi.Server, method: String, path: String,
                   body: String = ""): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$path"))
    val req = method match {
      case "GET" => b.GET().build()
      case "PUT" => b.PUT(HttpRequest.BodyPublishers.ofString(body)).build()
      case "POST" => b.POST(HttpRequest.BodyPublishers.ofString(body)).build()
      case "PATCH" => b.method("PATCH", HttpRequest.BodyPublishers.ofString(body)).build()
    }
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  test("create fails fast with per-field 422 detail; nothing is persisted") {
    val base = java.nio.file.Files.createTempDirectory("graft_destschema").toString
    val registry = new graft.streaming.Sinks.Registry(Seq(
      graft.streaming.Sinks.FileWebhookSink(s"$base/out", "sec")))
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = s"$base/destinations",
      storeSecret = "api-secret", registry = Some(registry)))
    try {
      // missing config.url → 422 with the field detail
      val (c1, b1) = send(server, "PUT", "/api/v1/t1/destinations/d1",
        """{"type":"webhook","topics":["order.*"]}""")
      assert(c1 == 422, b1)
      assert(b1.get("error").asText == "validation error")
      assert(b1.get("data").get(0).get("field").asText == "config.url")
      assert(b1.get("data").get(0).get("type").asText == "required")
      // the destination was NOT created — delivery can never see it
      assert(send(server, "GET", "/api/v1/t1/destinations/d1")._1 == 404)

      // kafka with missing brokers + missing credentials: every violation
      // reported in one response, reference order (config before creds)
      val (c2, b2) = send(server, "POST", "/api/v1/t1/destinations",
        """{"type":"kafka","topics":["order.*"],
          |"config":{"topic":"t","sasl_mechanism":"plain"}}""".stripMargin)
      assert(c2 == 422, b2)
      val fields = (0 until b2.get("data").size)
        .map(i => b2.get("data").get(i).get("field").asText)
      assert(fields == Seq("config.brokers", "credentials.username",
        "credentials.password"), fields)

      // bad pattern → 422 pattern
      val (c3, b3) = send(server, "PUT", "/api/v1/t1/destinations/d2",
        """{"type":"webhook","topics":["order.*"],"config":{"url":"not a url"}}""")
      assert(c3 == 422 &&
        b3.get("data").get(0).get("type").asText == "pattern", b3)

      // unknown type → 422 invalid_type
      val (c4, b4) = send(server, "PUT", "/api/v1/t1/destinations/d3",
        """{"type":"carrier-pigeon","topics":["order.*"]}""")
      assert(c4 == 422 &&
        b4.get("data").get(0).get("type").asText == "invalid_type", b4)

      // valid create → 201; then a PATCH that nulls the required url out
      // of the merged config → 422, record unchanged
      assert(send(server, "PUT", "/api/v1/t1/destinations/d4",
        """{"type":"webhook","topics":["order.*"],
          |"config":{"url":"https://x.test/hook"}}""".stripMargin)._1 == 201)
      val (c5, b5) = send(server, "PATCH", "/api/v1/t1/destinations/d4",
        """{"config":{"url":null}}""")
      assert(c5 == 422 &&
        b5.get("data").get(0).get("field").asText == "config.url", b5)
      val (c6, b6) = send(server, "GET", "/api/v1/t1/destinations/d4")
      assert(c6 == 200 &&
        b6.get("config").get("url").asText == "https://x.test/hook")
      // a patch that keeps the merged record valid still lands
      assert(send(server, "PATCH", "/api/v1/t1/destinations/d4",
        """{"config":{"custom_headers":"X-A: 1"}}""")._1 == 200)
    } finally server.stop()
  }

  test("GET /destination-types serves the field schemas") {
    val base = java.nio.file.Files.createTempDirectory("graft_destschema2").toString
    val registry = new graft.streaming.Sinks.Registry(Seq(
      graft.streaming.Sinks.FileWebhookSink(s"$base/out", "sec")))
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf), destTable = s"$base/destinations",
      storeSecret = "api-secret", registry = Some(registry)))
    try {
      val (c, one) = send(server, "GET", "/api/v1/destination-types/webhook")
      assert(c == 200, one)
      assert(one.get("type").asText == "webhook")
      val cf = one.get("config_fields")
      assert(cf.get(0).get("key").asText == "url")
      assert(cf.get(0).get("required").asBoolean)
      assert(cf.get(0).get("pattern").asText.nonEmpty)
      assert(cf.get(1).get("key").asText == "custom_headers")
      assert(!cf.get(1).get("required").asBoolean)
      // list carries the same schema payloads
      val (lc, list) = send(server, "GET", "/api/v1/destination-types")
      assert(lc == 200 && list.size == 1 &&
        list.get(0).get("config_fields").size == 2)
    } finally server.stop()
  }
}
