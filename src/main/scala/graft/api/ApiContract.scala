package graft.api

import com.fasterxml.jackson.databind.node.{JsonNodeFactory, ObjectNode}

/** Machine-readable contract for the HTTP surface — the analog of the
  * reference's `docs/apis/openapi.yaml` + its SDK contract tests
  * (`spec-sdk-tests/README.md:1-15`): every route the server answers,
  * with methods, path templates, parameters, success status, required
  * response fields (and their JSON kinds), and the error statuses the
  * route may legitimately emit.
  *
  * Three consumers:
  *   - `ApiContractSpec` replays every route's example against a LIVE
  *     server and fails on any route/status/shape drift — the
  *     SDK-validation analog;
  *   - `renderOpenApi` emits an OpenAPI-3-shaped JSON document so
  *     external tooling can read the same catalog;
  *   - `GET /api/v1/openapi.json` serves that document from the running
  *     server (self-describing API).
  *
  * The catalog is data, deliberately dumb: no route logic, just the
  * promises. If the server changes shape, exactly one of catalog or
  * server is wrong, and the spec says which.
  */
object ApiContract {

  /** JSON kinds as rendered by the server (`HttpApi.rowToJson` et al.). */
  final case class Field(name: String, kind: String, required: Boolean = true)

  final case class Param(name: String, kind: String = "string",
                         required: Boolean = false)

  /** One error case with a concrete live probe. */
  final case class ErrorCase(status: Int, condition: String,
                             method: String = "GET", pathQuery: String = "",
                             body: String = "")

  /** `responseKind`: "object" (fields = required top-level members),
    * "array" (fields = required members of each element; empty = scalar
    * elements), or "list-page" (models[] + optional next/prev cursors —
    * fields describe the model rows). */
  final case class Route(
      method: String,
      template: String,
      summary: String,
      queryParams: Seq[Param] = Nil,
      bodyFields: Seq[Param] = Nil,
      successStatus: Int = 200,
      responseKind: String = "object",
      responseFields: Seq[Field] = Nil,
      errors: Seq[ErrorCase] = Nil,
      // concrete request the conformance spec replays (path with example
      // values substituted + query string; body for PUT/POST)
      examplePathQuery: String = "",
      exampleBody: String = "")

  // Event rows render straight off the events table schema.
  private val eventFields = Seq(
    Field("event_id", "integer"), Field("ts", "string"),
    Field("user_id", "integer"), Field("event_type", "string"),
    Field("value", "number"), Field("props", "string"))

  private val attemptFields = Seq(
    Field("attempt_id", "string"), Field("event_id", "string"),
    Field("tenant_id", "string"), Field("destination_id", "string"),
    Field("destination_type", "string"), Field("attempt_number", "integer"),
    Field("manual", "boolean"), Field("status", "string"),
    Field("attempt_time", "string"), Field("code", "string"),
    Field("event_time", "string"), Field("topic", "string"),
    Field("data", "string"), Field("metadata", "object"),
    Field("eligible_for_retry", "boolean"))

  private val destinationFields = Seq(
    Field("tenant_id", "string"), Field("destination_id", "string"),
    Field("type", "string"), Field("topics", "array"),
    Field("config", "object"), Field("credentials", "object"),
    Field("delivery_metadata", "object"), Field("metadata", "object"),
    Field("created_at", "string"), Field("updated_at", "string"),
    Field("disabled_at", "string", required = false))

  private val tenantFields = Seq(
    Field("id", "string"), Field("destinations_count", "integer"),
    Field("topics", "array"), Field("metadata", "object"),
    Field("created_at", "string"), Field("updated_at", "string"))

  private val listParams = Seq(
    Param("limit", "integer"), Param("order"), Param("next"), Param("prev"),
    Param("start"), Param("end"))

  private val metricsParams = Seq(
    Param("measures[]", required = true), Param("granularity", required = true),
    Param("start", required = true), Param("end", required = true),
    Param("dimensions[]"), Param("limit", "integer"))

  private val metricsFields = Seq(
    Field("truncated", "boolean"), Field("buckets", "array"))

  val routes: Seq[Route] = Seq(
    Route("POST", "/api/v1/publish",
      "Validate, default, and atomically spool one event for ingestion",
      bodyFields = Seq(Param("tenant_id", required = true),
        Param("data", "object", required = true), Param("topic"),
        Param("id"), Param("time"), Param("eligible_for_retry", "boolean"),
        Param("metadata", "object"), Param("destination_id")),
      successStatus = 202,
      responseFields = Seq(Field("id", "string"), Field("status", "string")),
      errors = Seq(
        ErrorCase(422, "body is not a JSON object", "POST", "/api/v1/publish", "nope"),
        ErrorCase(422, "missing tenant_id", "POST", "/api/v1/publish", """{"data":{}}"""),
        ErrorCase(422, "data not an object", "POST", "/api/v1/publish",
          """{"tenant_id":"t1","data":"x","topic":"order.created"}"""),
        ErrorCase(422, "topic not in allowlist", "POST", "/api/v1/publish",
          """{"tenant_id":"t1","data":{},"topic":"nope.nope"}"""),
        ErrorCase(409, "duplicate event id within the idempotency window",
          "POST", "/api/v1/publish",
          """{"tenant_id":"t1","data":{},"topic":"order.created","id":"dup-1"}""")),
      examplePathQuery = "/api/v1/publish",
      exampleBody = """{"tenant_id":"t1","data":{"k":1},"topic":"order.created","id":"contract-pub-1"}"""),

    Route("POST", "/api/v1/retry",
      "Publish a manual delivery task for the latest attempt of (event, destination)",
      bodyFields = Seq(Param("event_id", required = true),
        Param("destination_id", required = true)),
      successStatus = 202,
      responseFields = Seq(Field("event_id", "string"),
        Field("destination_id", "string"), Field("attempt", "integer")),
      errors = Seq(
        ErrorCase(422, "missing destination_id", "POST", "/api/v1/retry",
          """{"event_id":"e1"}"""),
        ErrorCase(404, "unknown event", "POST", "/api/v1/retry",
          """{"event_id":"ghost","destination_id":"dres"}""")),
      examplePathQuery = "/api/v1/retry",
      exampleBody = """{"event_id":"e1","destination_id":"dres"}"""),

    Route("GET", "/api/v1/topics", "Configured topic allowlist",
      responseKind = "array",
      examplePathQuery = "/api/v1/topics"),

    Route("GET", "/api/v1/destination-types", "Registered sink types",
      responseKind = "array",
      responseFields = Seq(Field("type", "string")),
      examplePathQuery = "/api/v1/destination-types"),

    Route("GET", "/api/v1/destination-types/{type}", "One sink type",
      responseFields = Seq(Field("type", "string")),
      errors = Seq(ErrorCase(404, "unknown type", "GET",
        "/api/v1/destination-types/carrier-pigeon")),
      examplePathQuery = "/api/v1/destination-types/webhook"),

    Route("GET", "/healthz",
      "Liveness (reference healthz: 200 while workers are healthy; this " +
        "single-process engine is alive iff it answers)",
      responseFields = Seq(Field("status", "string", required = true)),
      examplePathQuery = "/healthz"),

    Route("GET", "/api/v1/openapi.json", "This contract, OpenAPI-shaped",
      responseFields = Seq(Field("openapi", "string"), Field("info", "object"),
        Field("paths", "object")),
      examplePathQuery = "/api/v1/openapi.json"),

    Route("GET", "/metrics",
      "Operational pipeline metrics, Prometheus text exposition " +
        "(published/eligible events, API calls+latency by route, " +
        "delivered counts from the attempt log, delivery-latency " +
        "quantiles from the GK rollup)",
      responseKind = "text",
      examplePathQuery = "/metrics"),

    Route("PUT", "/api/v1/tenants/{tenant_id}",
      "Create (201) or update (200; metadata replaced, created_at preserved)",
      bodyFields = Seq(Param("metadata", "object")),
      successStatus = 201,
      responseFields = tenantFields,
      examplePathQuery = "/api/v1/tenants/tc1",
      exampleBody = """{"metadata":{"team":"search"}}"""),

    Route("GET", "/api/v1/tenants/{tenant_id}", "Retrieve one tenant",
      responseFields = tenantFields,
      errors = Seq(ErrorCase(404, "unknown tenant", "GET", "/api/v1/tenants/ghost")),
      examplePathQuery = "/api/v1/tenants/tc1"),

    Route("GET", "/api/v1/tenants",
      "List tenants ({models, count}; optional id[] filter, clamped limit, dir)",
      queryParams = Seq(Param("id[]"), Param("limit"), Param("dir")),
      responseFields = Seq(Field("models", "array"), Field("count", "integer")),
      examplePathQuery = "/api/v1/tenants"),

    Route("GET", "/api/v1/tenants/{tenant_id}/token",
      "Mint a tenant-scoped HS256 JWT",
      responseFields = Seq(Field("token", "string")),
      errors = Seq(ErrorCase(404, "unknown tenant", "GET", "/api/v1/tenants/ghost/token")),
      examplePathQuery = "/api/v1/tenants/tc1/token"),

    Route("GET", "/api/v1/tenants/{tenant_id}/portal",
      "Portal redirect URL embedding a fresh tenant JWT (theme passthrough when valid)",
      queryParams = Seq(Param("theme")),
      responseFields = Seq(Field("redirect_url", "string"), Field("tenant_id", "string")),
      errors = Seq(ErrorCase(404, "unknown tenant", "GET", "/api/v1/tenants/ghost/portal")),
      examplePathQuery = "/api/v1/tenants/tc1/portal?theme=dark"),

    Route("DELETE", "/api/v1/tenants/{tenant_id}",
      "Cascade delete: tombstone destinations then the tenant",
      responseFields = Seq(Field("deleted", "string")),
      examplePathQuery = "/api/v1/tenants/tdel"),

    Route("GET", "/api/v1/{tenant_id}/events",
      "List events: conjunctive filters + keyset cursor pagination",
      queryParams = listParams ++ Seq(Param("event_type[]"), Param("user_id[]")),
      responseKind = "list-page",
      responseFields = eventFields,
      errors = Seq(ErrorCase(400, "non-numeric user_id filter", "GET",
        "/api/v1/t1/events?user_id[]=abc")),
      examplePathQuery = "/api/v1/t1/events?limit=3&order=asc"),

    Route("GET", "/api/v1/{tenant_id}/events/{event_id}", "Retrieve one event",
      responseFields = eventFields,
      errors = Seq(
        ErrorCase(404, "unknown id", "GET", "/api/v1/t1/events/999999999"),
        ErrorCase(400, "malformed id", "GET", "/api/v1/t1/events/not-a-number")),
      examplePathQuery = "/api/v1/t1/events/1"),

    Route("GET", "/api/v1/{tenant_id}/events/{event_id}/trace",
      "Follow one event through its receive/match/deliver/log spans",
      responseFields = Seq(Field("event_id", "string"),
        Field("trace_id", "string"), Field("spans", "array")),
      errors = Seq(
        ErrorCase(404, "no trace for id", "GET", "/api/v1/t1/events/no-such/trace")),
      examplePathQuery = "/api/v1/t1/events/e1/trace"),

    Route("GET", "/api/v1/{tenant_id}/metrics/events",
      "Event metrics matrix: dense buckets, allowlisted measures/dimensions",
      queryParams = metricsParams ++ Seq(Param("event_type[]"),
        Param("user_id[]")),
      responseFields = metricsFields,
      errors = Seq(
        ErrorCase(400, "unknown measure", "GET",
          "/api/v1/t1/metrics/events?measures[]=bogus&granularity=1h&start=2024-01-01T00:00:00Z&end=2024-01-02T00:00:00Z"),
        ErrorCase(400, "resource limit: too many buckets", "GET",
          "/api/v1/t1/metrics/events?measures[]=count&granularity=1s&start=2014-01-01T00:00:00Z&end=2024-01-01T00:00:00Z")),
      examplePathQuery =
        "/api/v1/t1/metrics/events?measures[]=count&granularity=1d&start=2024-01-01T00:00:00Z&end=2024-01-02T00:00:00Z"),

    Route("GET", "/api/v1/{tenant_id}/metrics/attempts",
      "Attempt metrics matrix over the denormalized log, tenant-scoped",
      queryParams = metricsParams ++ Seq(Param("destination_id[]"),
        Param("destination_type[]"), Param("topic[]"), Param("status[]"),
        Param("code[]"), Param("manual[]"), Param("attempt_number[]")),
      responseFields = metricsFields,
      errors = Seq(ErrorCase(400, "unknown measure", "GET",
        "/api/v1/t1/metrics/attempts?measures[]=bogus&granularity=1h&start=2024-03-01T00:00:00Z&end=2024-03-02T00:00:00Z")),
      examplePathQuery =
        "/api/v1/t1/metrics/attempts?measures[]=count&granularity=1d&start=2024-03-01T00:00:00Z&end=2024-03-02T00:00:00Z"),

    Route("GET", "/api/v1/{tenant_id}/attempts",
      "List delivery attempts, tenant-scoped",
      queryParams = listParams ++ Seq(Param("event_id[]"),
        Param("destination_id[]"), Param("destination_type[]"),
        Param("status[]"), Param("topic[]")),
      responseKind = "list-page",
      responseFields = attemptFields,
      examplePathQuery = "/api/v1/t1/attempts?limit=2&order=asc"),

    Route("GET", "/api/v1/{tenant_id}/attempts/{attempt_id}",
      "Retrieve one attempt (tenant-scoped)",
      responseFields = attemptFields,
      errors = Seq(ErrorCase(404, "attempt of another tenant", "GET",
        "/api/v1/t1/attempts/att_other")),
      examplePathQuery = "/api/v1/t1/attempts/att_1"),

    Route("GET", "/api/v1/{tenant_id}/destinations/{destination_id}/attempts",
      "List attempts scoped to one destination",
      queryParams = listParams ++ Seq(Param("event_id[]"),
        Param("status[]"), Param("topic[]")),
      responseKind = "list-page",
      responseFields = attemptFields,
      examplePathQuery = "/api/v1/t1/destinations/dres/attempts?order=asc"),

    Route("GET", "/api/v1/{tenant_id}/destinations/{destination_id}/attempts/{attempt_id}",
      "Retrieve one attempt through its destination scope",
      responseFields = attemptFields,
      examplePathQuery = "/api/v1/t1/destinations/dres/attempts/att_1"),

    Route("GET", "/api/v1/{tenant_id}/destinations",
      "List destinations with type/topic/id filters",
      queryParams = Seq(Param("type[]"), Param("topics[]"), Param("id[]")),
      responseKind = "array",
      responseFields = destinationFields,
      examplePathQuery = "/api/v1/t1/destinations"),

    Route("GET", "/api/v1/{tenant_id}/destinations/{destination_id}",
      "Retrieve one destination (credentials decrypted)",
      responseFields = destinationFields,
      errors = Seq(ErrorCase(404, "unknown destination", "GET",
        "/api/v1/t1/destinations/ghost")),
      examplePathQuery = "/api/v1/t1/destinations/dres"),

    Route("PUT", "/api/v1/{tenant_id}/destinations/{destination_id}",
      "Create a destination (encrypting credentials at rest)",
      bodyFields = Seq(Param("type", required = true),
        Param("topics", "array", required = true), Param("filter", "object"),
        Param("config", "object"), Param("credentials", "object"),
        Param("delivery_metadata", "object"), Param("metadata", "object")),
      successStatus = 201,
      responseFields = destinationFields,
      errors = Seq(
        ErrorCase(400, "missing type", "PUT", "/api/v1/t1/destinations/dbad",
          """{"topics":["order.*"]}"""),
        ErrorCase(409, "duplicate destination id", "PUT",
          "/api/v1/t1/destinations/dres",
          """{"type":"webhook","topics":["order.*"],"config":{"url":"https://x.test/h"}}"""),
        ErrorCase(422, "schema validation failure (missing config.url)",
          "PUT", "/api/v1/t1/destinations/dinvalid",
          """{"type":"webhook","topics":["order.*"]}""")),
      examplePathQuery = "/api/v1/t1/destinations/dnew",
      exampleBody =
        """{"type":"webhook","topics":["order.*"],"credentials":{"secret":"s"},"config":{"url":"https://x.test/h"}}"""),

    Route("POST", "/api/v1/{tenant_id}/destinations",
      "Create a destination; id generated (des_ prefix) when absent",
      bodyFields = Seq(Param("id"), Param("type", required = true),
        Param("topics", "array", required = true), Param("filter", "object"),
        Param("config", "object"), Param("credentials", "object"),
        Param("delivery_metadata", "object"), Param("metadata", "object")),
      successStatus = 201,
      responseFields = destinationFields,
      examplePathQuery = "/api/v1/t1/destinations",
      exampleBody =
        """{"type":"webhook","topics":["order.*"],"config":{"url":"https://x.test/p"}}"""),

    Route("PATCH", "/api/v1/{tenant_id}/destinations/{destination_id}",
      "Partial update: type immutable (400), topics replace, config/credentials/metadata merge-patch (null deletes a key)",
      bodyFields = Seq(Param("topics", "array"), Param("filter", "object"),
        Param("config", "object"), Param("credentials", "object"),
        Param("delivery_metadata", "object"), Param("metadata", "object")),
      responseFields = destinationFields,
      errors = Seq(
        ErrorCase(404, "unknown destination", "PATCH",
          "/api/v1/t1/destinations/ghost", """{"metadata":{"a":"b"}}"""),
        ErrorCase(400, "type change rejected", "PATCH",
          "/api/v1/t1/destinations/dres", """{"type":"kafka"}""")),
      examplePathQuery = "/api/v1/t1/destinations/dres",
      exampleBody = """{"metadata":{"note":"patched"}}"""),

    Route("DELETE", "/api/v1/{tenant_id}/destinations/{destination_id}",
      "Tombstone a destination",
      responseFields = Seq(Field("deleted", "string")),
      examplePathQuery = "/api/v1/t1/destinations/ddel"),

    Route("PUT", "/api/v1/{tenant_id}/destinations/{destination_id}/enable",
      "Clear disabled_at via the same changelog the auto-disable writes",
      responseFields = destinationFields,
      errors = Seq(ErrorCase(404, "unknown destination", "PUT",
        "/api/v1/t1/destinations/ghost/enable")),
      examplePathQuery = "/api/v1/t1/destinations/dres/enable"),

    Route("PUT", "/api/v1/{tenant_id}/destinations/{destination_id}/disable",
      "Set disabled_at",
      responseFields = destinationFields,
      errors = Seq(ErrorCase(404, "unknown destination", "PUT",
        "/api/v1/t1/destinations/ghost/disable")),
      examplePathQuery = "/api/v1/t1/destinations/ddis/disable"))

  /** Render the catalog as an OpenAPI-3-shaped JSON document. Shaped, not
    * certified: it carries exactly the catalog's information (methods,
    * templates, params, statuses, required response fields) in the
    * standard layout so generic tooling can diff and browse it. */
  def renderOpenApi: ObjectNode = {
    val nf = JsonNodeFactory.instance
    val root = nf.objectNode()
    root.put("openapi", "3.0.3")
    val info = root.putObject("info")
    info.put("title", "graft HTTP API")
    info.put("version", "v1")
    val paths = root.putObject("paths")
    routes.groupBy(_.template).toSeq.sortBy(_._1).foreach { case (tpl, rs) =>
      val p = paths.putObject(tpl)
      rs.foreach { r =>
        val op = p.putObject(r.method.toLowerCase)
        op.put("summary", r.summary)
        val params = op.putArray("parameters")
        "\\{([a-z_]+)\\}".r.findAllMatchIn(tpl).foreach { m =>
          val pn = params.addObject()
          pn.put("name", m.group(1)); pn.put("in", "path"); pn.put("required", true)
          pn.putObject("schema").put("type", "string")
        }
        r.queryParams.foreach { q =>
          val pn = params.addObject()
          pn.put("name", q.name); pn.put("in", "query"); pn.put("required", q.required)
          pn.putObject("schema").put("type", q.kind)
        }
        if (r.bodyFields.nonEmpty) {
          val schema = op.putObject("requestBody").putObject("content")
            .putObject("application/json").putObject("schema")
          schema.put("type", "object")
          val req = schema.putArray("required")
          r.bodyFields.filter(_.required).foreach(f => req.add(f.name))
          val props = schema.putObject("properties")
          r.bodyFields.foreach(f => props.putObject(f.name).put("type", f.kind))
        }
        val responses = op.putObject("responses")
        val ok = responses.putObject(r.successStatus.toString)
        ok.put("description", "success")
        val okSchema = ok.putObject("content").putObject("application/json")
          .putObject("schema")
        def objSchema(node: ObjectNode, fields: Seq[Field]): Unit = {
          node.put("type", "object")
          val req = node.putArray("required")
          fields.filter(_.required).foreach(f => req.add(f.name))
          val props = node.putObject("properties")
          fields.foreach(f => props.putObject(f.name).put("type", f.kind))
        }
        r.responseKind match {
          case "text" => okSchema.put("type", "string"); ()
          case "object" => objSchema(okSchema, r.responseFields)
          case "array" =>
            okSchema.put("type", "array")
            if (r.responseFields.nonEmpty)
              objSchema(okSchema.putObject("items"), r.responseFields)
          case "list-page" =>
            okSchema.put("type", "object")
            okSchema.putArray("required").add("models")
            val props = okSchema.putObject("properties")
            val models = props.putObject("models")
            models.put("type", "array")
            objSchema(models.putObject("items"), r.responseFields)
            props.putObject("next").put("type", "string")
            props.putObject("prev").put("type", "string")
        }
        r.errors.map(_.status).distinct.sorted.foreach { st =>
          val e = responses.putObject(st.toString)
          e.put("description",
            r.errors.filter(_.status == st).map(_.condition).mkString("; "))
          val es = e.putObject("content").putObject("application/json")
            .putObject("schema")
          objSchema(es, Seq(Field("error", "string")))
        }
      }
    }
    root
  }
}
