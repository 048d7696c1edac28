package graft

import scala.jdk.CollectionConverters._
import graft.api.ApiContract

/** Served-contract diff gate against the reference's published OpenAPI
  * (`docs/apis/openapi.yaml`, the document the reference's generated SDKs
  * and `spec-sdk-tests/` pin). The gate fails on DRIFT in either
  * direction: a reference endpoint with no mapped served endpoint (and no
  * documented exclusion), or a reference query parameter with no mapped
  * served parameter (and no documented adaptation).
  *
  * Addressing model difference, mapped rather than excluded: the
  * reference's public API is admin-scoped with `tenant_id` as a query
  * param (`/events?tenant_id=…`) or a `/tenants/{tenant_id}/…` prefix;
  * this engine scopes by path segment (`/api/v1/{tenant}/events`). The
  * table below is that translation, entry by entry.
  *
  * Cancels (does not fail) when the reference checkout is not present —
  * same discipline as the real-broker Kafka spec. */
class OpenApiParitySpec extends org.scalatest.funsuite.AnyFunSuite {

  private val refYaml = "/root/reference/docs/apis/openapi.yaml"

  /** reference path → served template (exact, after `/api/v1` strip and
    * `{param}` erasure). One entry per reference path. */
  private val pathMap: Map[String, String] = Map(
    "/attempts" -> "/{}/attempts",
    "/attempts/{attempt_id}" -> "/{}/attempts/{}",
    "/destination-types" -> "/destination-types",
    "/destination-types/{type}" -> "/destination-types/{}",
    "/events" -> "/{}/events",
    "/events/{event_id}" -> "/{}/events/{}",
    "/healthz" -> "/healthz",
    "/metrics/attempts" -> "/{}/metrics/attempts",
    "/metrics/events" -> "/{}/metrics/events",
    "/publish" -> "/publish",
    "/retry" -> "/retry",
    "/tenants" -> "/tenants",
    "/tenants/{tenant_id}" -> "/tenants/{}",
    "/tenants/{tenant_id}/destinations" -> "/{}/destinations",
    "/tenants/{tenant_id}/destinations/{destination_id}" -> "/{}/destinations/{}",
    "/tenants/{tenant_id}/destinations/{destination_id}/attempts" -> "/{}/destinations/{}/attempts",
    "/tenants/{tenant_id}/destinations/{destination_id}/attempts/{attempt_id}" -> "/{}/destinations/{}/attempts/{}",
    "/tenants/{tenant_id}/destinations/{destination_id}/disable" -> "/{}/destinations/{}/disable",
    "/tenants/{tenant_id}/destinations/{destination_id}/enable" -> "/{}/destinations/{}/enable",
    "/tenants/{tenant_id}/portal" -> "/tenants/{}/portal",
    "/tenants/{tenant_id}/token" -> "/tenants/{}/token",
    "/topics" -> "/topics")

  /** Out-of-scope reference endpoints, each with the reason on record. */
  private val excluded: Map[(String, String), String] = Map(
    ("/config", "get") ->
      "managed-deployment runtime config; the reference's own self-hosted mode configures via env vars — no engine equivalent",
    ("/config", "patch") ->
      "managed-deployment runtime config (see GET /config)")

  /** Reference query-param name → served query-param candidates (ANY of
    * which counts as coverage). Applied after `filters[x]` → `x`. */
  private val paramMap: Map[String, Seq[String]] = Map(
    "limit" -> Seq("limit"),
    "next" -> Seq("next"),
    "prev" -> Seq("prev"),
    "dir" -> Seq("order", "dir"),
    "granularity" -> Seq("granularity"),
    "measures" -> Seq("measures[]"),
    "dimensions" -> Seq("dimensions[]"),
    "time" -> Seq("start"), // + end, asserted as a pair below
    "type" -> Seq("type[]"),
    "topics" -> Seq("topics[]"),
    "theme" -> Seq("theme"),
    "id" -> Seq("id[]"),
    "event_id" -> Seq("event_id[]"),
    "destination_id" -> Seq("destination_id[]"),
    "destination_type" -> Seq("destination_type[]"),
    "status" -> Seq("status[]"),
    "topic" -> Seq("topic[]"),
    "code" -> Seq("code[]"),
    "manual" -> Seq("manual[]"),
    "attempt_number" -> Seq("attempt_number[]"),
    // admin-scoped tenant filter ≡ our tenant path segment
    "tenant_id" -> Nil)

  /** Documented per-op adaptations: (refPath, method, refParam) → reason.
    * Anything here is accepted WITHOUT a served counterpart; anything not
    * here and not mapped fails the gate. */
  private val adaptations: Map[(String, String, String), String] = Map(
    ("/events", "get", "id") ->
      "multi-id filter not exposed on the list route; the point route /{tenant}/events/{id} serves id lookup",
    ("/events", "get", "topic") ->
      "analytics events schema: topic ≈ event_type[] filter (engine fixture schema, adjudicated r3)",
    ("/events", "get", "destination_id") ->
      "analytics events rows carry no destination fan-out column; attempts list filters by destination instead",
    ("/events", "get", "order_by") ->
      "keyset order is fixed to the (time, id) sort key; order_by=time is the reference's only stable choice",
    ("/attempts", "get", "order_by") ->
      "keyset order is fixed to the (attempt_time, attempt_id) sort key",
    ("/attempts", "get", "include") ->
      "rows always carry the full denormalized payload; include=data is a no-op here",
    ("/attempts/{attempt_id}", "get", "include") ->
      "rows always carry the full denormalized payload",
    ("/tenants/{tenant_id}/destinations/{destination_id}/attempts", "get", "order_by") ->
      "keyset order is fixed to the (attempt_time, attempt_id) sort key",
    ("/tenants/{tenant_id}/destinations/{destination_id}/attempts", "get", "include") ->
      "rows always carry the full denormalized payload",
    ("/tenants/{tenant_id}/destinations/{destination_id}/attempts/{attempt_id}", "get", "include") ->
      "rows always carry the full denormalized payload",
    ("/metrics/events", "get", "topic") ->
      "analytics events schema: topic ≈ event_type[] dimension filter",
    ("/metrics/events", "get", "destination_id") ->
      "analytics events rows carry no destination fan-out column; metrics/attempts filters by destination",
    ("/tenants", "get", "next") ->
      "tenant list is a bounded catalog ({models, count}), not a keyset page",
    ("/tenants", "get", "prev") ->
      "tenant list is a bounded catalog ({models, count}), not a keyset page")

  // ------------------------------------------- response schemas (r14) --

  /** The 8 core endpoints whose 2xx response schemas the gate covers
    * (VERDICT r13 task #4): events/attempts list+retrieve, metrics ×2,
    * publish, retry. */
  private val coreResponses: Seq[(String, String)] = Seq(
    ("/events", "get"), ("/events/{event_id}", "get"),
    ("/attempts", "get"), ("/attempts/{attempt_id}", "get"),
    ("/metrics/events", "get"), ("/metrics/attempts", "get"),
    ("/publish", "post"), ("/retry", "post"))

  /** Reference response field → served field candidates (ANY counts).
    * Checked after [[respOverrides]]; a field in neither map and not in
    * [[respAdaptations]] fails the gate loudly. */
  private val respFieldMap: Map[String, Seq[String]] = Map(
    "models" -> Seq("models"),
    "pagination" -> Seq("next"), // cursors ride top-level next/prev
    "time" -> Seq("ts", "attempt_time"),
    "topic" -> Seq("event_type", "topic"),
    "tenant_id" -> Seq("tenant_id"),
    "event_id" -> Seq("event_id"),
    "destination_id" -> Seq("destination_id"),
    "attempt_number" -> Seq("attempt_number"),
    "manual" -> Seq("manual"),
    "status" -> Seq("status"),
    "code" -> Seq("code"),
    // included sub-objects ride the denormalized row (the `include`
    // adaptation already on record for the query params)
    "event" -> Seq("data"),
    "destination" -> Seq("destination_type"))

  /** Per-endpoint overrides where one reference name means different
    * things on different endpoints (`data` = event payload on event
    * rows, the bucket array on metrics). */
  private val respOverrides: Map[(String, String), Seq[String]] = Map(
    ("/events", "data") -> Seq("props"),
    ("/events/{event_id}", "data") -> Seq("props"),
    ("/metrics/events", "data") -> Seq("buckets"),
    ("/metrics/attempts", "data") -> Seq("buckets"),
    // `id` is the row's OWN identity per resource — per-path so a
    // dropped attempt_id can't be masked by event_id on the same row
    ("/events", "id") -> Seq("event_id"),
    ("/events/{event_id}", "id") -> Seq("event_id"),
    ("/attempts", "id") -> Seq("attempt_id"),
    ("/attempts/{attempt_id}", "id") -> Seq("attempt_id"),
    ("/publish", "id") -> Seq("id"))

  /** Documented response-field adaptations: (refPath, refField) →
    * reason. Same discipline as the query-param table: anything here is
    * accepted without a served counterpart; staleness-checked below. */
  private val respAdaptations: Map[(String, String), String] = Map(
    ("/events", "tenant_id") ->
      "tenant scope is the path segment; analytics event rows do not repeat it",
    ("/events", "metadata") ->
      "analytics events schema carries no per-event metadata column (engine fixture schema, adjudicated r3)",
    ("/events", "matched_destination_ids") ->
      "no destination fan-out column on the analytics events schema; attempts list by destination instead",
    ("/events/{event_id}", "tenant_id") ->
      "tenant scope is the path segment (see /events)",
    ("/events/{event_id}", "metadata") ->
      "analytics events schema carries no per-event metadata column",
    ("/events/{event_id}", "matched_destination_ids") ->
      "no destination fan-out column; attempts list by destination instead",
    ("/attempts", "response_data") ->
      "delivery response bodies are not retained by the analytics store; status + code pin the outcome",
    ("/attempts/{attempt_id}", "response_data") ->
      "delivery response bodies are not retained; status + code pin the outcome",
    ("/metrics/events", "metadata") ->
      "the truncation flag (top-level boolean) is the only response metadata the engine reports",
    ("/metrics/events", "time_bucket") ->
      "bucket rows are flat columns (bucket ts + one column per dimension/measure), not nested {time_bucket, dimensions, metrics}",
    ("/metrics/events", "dimensions") ->
      "flat bucket rows (see time_bucket)",
    ("/metrics/events", "metrics") ->
      "flat bucket rows (see time_bucket)",
    ("/metrics/attempts", "metadata") ->
      "the truncation flag is the only response metadata the engine reports",
    ("/metrics/attempts", "time_bucket") ->
      "flat bucket rows (see /metrics/events)",
    ("/metrics/attempts", "dimensions") ->
      "flat bucket rows (see /metrics/events)",
    ("/metrics/attempts", "metrics") ->
      "flat bucket rows (see /metrics/events)",
    ("/publish", "duplicate") ->
      "duplicate publishes answer 409 with the error envelope (idempotency window) instead of 202 {duplicate:true}",
    ("/publish", "destination_ids") ->
      "fan-out is resolved asynchronously by the delivery pipeline; the publish ack does not enumerate matches",
    ("/retry", "success") ->
      "202 + the scheduled attempt identity (event_id, destination_id, attempt) supersede a bare boolean")

  // ---------------------------------------------------------- machinery --

  private def loadRef(): Map[String, Map[String, Set[String]]] = {
    // paths → method → query-param names (filters[x] folded to x;
    // $ref'd params resolved against components.parameters)
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.LoaderOptions() {
        // the reference yaml is ~1.9 MB of docs prose
        setCodePointLimit(16 * 1024 * 1024)
      })
    val root = yaml.load[java.util.Map[String, Object]](
      new java.io.FileInputStream(refYaml))
    val comps = Option(root.get("components"))
      .map(_.asInstanceOf[java.util.Map[String, Object]])
      .flatMap(c => Option(c.get("parameters")))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala.toMap)
      .getOrElse(Map.empty)
    def paramName(p: java.util.Map[String, Object]): Option[String] = {
      val resolved = Option(p.get("$ref")) match {
        case Some(r) =>
          comps(r.toString.split("/").last).asInstanceOf[java.util.Map[String, Object]]
        case None => p
      }
      if (String.valueOf(resolved.get("in")) == "query")
        Some(String.valueOf(resolved.get("name"))
          .replaceAll("^filters\\[(.+)\\]$", "$1"))
      else None
    }
    val paths = root.get("paths").asInstanceOf[java.util.Map[String, Object]]
    paths.asScala.toMap.map { case (path, opsO) =>
      val ops = opsO.asInstanceOf[java.util.Map[String, Object]]
      val shared = Option(ops.get("parameters"))
        .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq)
        .getOrElse(Nil)
      val byMethod = ops.asScala.collect {
        case (m, op) if Set("get", "put", "post", "patch", "delete")(m) =>
          val own = Option(op.asInstanceOf[java.util.Map[String, Object]]
              .get("parameters"))
            .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq)
            .getOrElse(Nil)
          m -> (shared ++ own)
            .flatMap(p => paramName(p.asInstanceOf[java.util.Map[String, Object]]))
            .toSet
      }.toMap
      path -> byMethod
    }
  }

  private def servedOps(): Map[String, Map[String, Set[String]]] = {
    // normalized served template → method → declared query params
    ApiContract.routes.groupBy { r =>
      r.template.stripPrefix("/api/v1").replaceAll("\\{[a-z_]+\\}", "{}")
    }.map { case (tpl, rs) =>
      tpl -> rs.map(r =>
        r.method.toLowerCase -> r.queryParams.map(_.name).toSet).toMap
    }
  }

  private def available: Boolean = new java.io.File(refYaml).canRead

  /** (refPath, method) → the union of the 2xx response schema's
    * top-level property names and the item property names of its
    * object-array members (models/data). `$ref`s resolved against
    * components.schemas / components.responses. */
  private def loadRefResponses(): Map[(String, String), Set[String]] = {
    type JMap = java.util.Map[String, Object]
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.LoaderOptions() {
        setCodePointLimit(16 * 1024 * 1024)
      })
    val root = yaml.load[JMap](new java.io.FileInputStream(refYaml))
    val comps = Option(root.get("components")).map(_.asInstanceOf[JMap])
    def compSection(name: String): Map[String, Object] =
      comps.flatMap(c => Option(c.get(name)))
        .map(_.asInstanceOf[JMap].asScala.toMap).getOrElse(Map.empty)
    val schemas = compSection("schemas")
    val responses = compSection("responses")
    def resolve(node: Object, depth: Int = 0): JMap = {
      val m = node.asInstanceOf[JMap]
      if (depth > 8) return m
      Option(m.get("$ref")) match {
        case Some(r) =>
          val key = r.toString.split("/").last
          resolve(schemas.getOrElse(key, responses(key)), depth + 1)
        case None => m
      }
    }
    def props(schema: JMap): Map[String, JMap] =
      Option(schema.get("properties")).map(_.asInstanceOf[JMap].asScala.toMap
        .map { case (k, v) => k -> resolve(v) }).getOrElse(Map.empty)
    val paths = root.get("paths").asInstanceOf[JMap]
    coreResponses.map { case (path, method) =>
      val op = paths.get(path).asInstanceOf[JMap].get(method).asInstanceOf[JMap]
      val resp2xx = op.get("responses").asInstanceOf[JMap].asScala.collectFirst {
        case (code, r) if code.startsWith("2") => resolve(r)
      }.getOrElse(sys.error(s"$method $path: no 2xx response in the yaml"))
      val schema = resolve(resp2xx.get("content").asInstanceOf[JMap]
        .get("application/json").asInstanceOf[JMap].get("schema"))
      val top = props(schema)
      val itemFields = top.collect {
        case (_, p) if String.valueOf(p.get("type")) == "array" &&
            Option(p.get("items")).exists(i =>
              resolve(i).get("properties") != null) =>
          props(resolve(p.get("items"))).keySet
      }.flatten.toSet
      (path, method) -> (top.keySet ++ itemFields)
    }.toMap
  }

  /** Served response-field names per (refPath, method), from the
    * compiled-in contract. list-page responses expose models + cursors
    * on top of the row fields. */
  private def servedResponseFields(): Map[(String, String), Set[String]] = {
    val byTpl = ApiContract.routes.groupBy { r =>
      (r.template.stripPrefix("/api/v1").replaceAll("\\{[a-z_]+\\}", "{}"),
        r.method.toLowerCase)
    }
    coreResponses.map { case (path, method) =>
      val rs = byTpl.getOrElse((pathMap(path), method),
        sys.error(s"$method $path: no served route for template ${pathMap(path)}"))
      val r = rs.head
      val base = r.responseFields.map(_.name).toSet
      (path, method) -> (r.responseKind match {
        case "list-page" => base ++ Set("models", "next", "prev")
        case _ => base
      })
    }.toMap
  }

  /** The checker both the gate and the injection self-test run:
    * reference fields with no served candidate and no adaptation. */
  private def unmappedRespFields(path: String, refFields: Set[String],
                                 served: Set[String]): Seq[String] =
    refFields.toSeq.sorted.filter { f =>
      !respAdaptations.contains((path, f)) && {
        val candidates = respOverrides.getOrElse((path, f),
          respFieldMap.getOrElse(f, sys.error(
            s"reference response field '$f' on $path is not in respFieldMap — " +
              "new upstream field? map it or record an adaptation")))
        !candidates.exists(served.contains)
      }
    }

  test("every reference endpoint is served or excluded with a reason") {
    assume(available, s"reference checkout not present at $refYaml")
    val ref = loadRef()
    val served = servedOps()
    // the mapping table itself must stay total: a path added to the
    // reference yaml shows up here as an unmapped key
    val unmapped = ref.keySet.filterNot(p =>
      pathMap.contains(p) || ref(p).keySet.forall(m => excluded.contains((p, m))))
    assert(unmapped.isEmpty, s"reference paths with no mapping/exclusion: $unmapped")
    val missing = for {
      (path, ops) <- ref.toSeq
      method <- ops.keys
      if !excluded.contains((path, method))
      tpl = pathMap(path)
      if !served.get(tpl).exists(_.contains(method))
    } yield s"$method $path (expected served $tpl)"
    assert(missing.isEmpty, s"reference endpoints not served:\n${missing.mkString("\n")}")
  }

  test("every reference query param maps to a served param or a documented adaptation") {
    assume(available, s"reference checkout not present at $refYaml")
    val ref = loadRef()
    val served = servedOps()
    val drift = for {
      (path, ops) <- ref.toSeq
      (method, refParams) <- ops.toSeq
      if !excluded.contains((path, method))
      servedParams = served(pathMap(path))(method)
      p <- refParams.toSeq.sorted
      if !adaptations.contains((path, method, p))
      candidates = paramMap.getOrElse(p,
        sys.error(s"reference param '$p' on $method $path is not in paramMap — " +
          "new upstream param? map it or record an adaptation"))
      if candidates.nonEmpty && !candidates.exists(servedParams.contains)
    } yield s"$method $path param $p (served has ${servedParams.toSeq.sorted})"
    assert(drift.isEmpty, s"unmapped reference params:\n${drift.mkString("\n")}")
    // the `time` family maps to an explicit [start, end] window — both ends
    for {
      (path, ops) <- ref.toSeq
      (method, refParams) <- ops.toSeq
      if refParams.contains("time") && !excluded.contains((path, method))
    } {
      val sp = served(pathMap(path))(method)
      assert(sp.contains("start") && sp.contains("end"),
        s"$method $path: reference time window needs served start+end, got $sp")
    }
  }

  test("every documented response field on the 8 core endpoints is served or adapted") {
    assume(available, s"reference checkout not present at $refYaml")
    val ref = loadRefResponses()
    val served = servedResponseFields()
    val drift = coreResponses.flatMap { case (path, method) =>
      unmappedRespFields(path, ref((path, method)), served((path, method)))
        .map(f => s"$method $path response field $f " +
          s"(served has ${served((path, method)).toSeq.sorted})")
    }
    assert(drift.isEmpty, s"unserved reference response fields:\n${drift.mkString("\n")}")
  }

  test("response gate detects a dropped served field (injection self-test)") {
    assume(available, s"reference checkout not present at $refYaml")
    val ref = loadRefResponses()
    val served = servedResponseFields()
    // drop attempt_id from the served attempts row: the reference's `id`
    // must become unmapped — proves the checker fails on real drift
    // rather than vacuously passing
    val broken = served(("/attempts", "get")) - "attempt_id"
    val missing = unmappedRespFields("/attempts", ref(("/attempts", "get")), broken)
    assert(missing == Seq("id"),
      s"checker failed to flag the injected drop of attempt_id: $missing")
  }

  test("response adaptation/override tables stay live (no stale entries)") {
    assume(available, s"reference checkout not present at $refYaml")
    val ref = loadRefResponses()
    val byPath = ref.map { case ((p, _), fs) => p -> fs }
    for (((p, f), _) <- respAdaptations)
      assert(byPath.get(p).exists(_.contains(f)), s"stale response adaptation: $p $f")
    for (((p, f), _) <- respOverrides)
      assert(byPath.get(p).exists(_.contains(f)), s"stale response override: $p $f")
  }

  test("adaptation and exclusion lists stay live (no stale entries)") {
    assume(available, s"reference checkout not present at $refYaml")
    val ref = loadRef()
    for (((p, m), _) <- excluded)
      assert(ref.get(p).exists(_.contains(m)), s"stale exclusion: $m $p")
    for (((p, m, q), _) <- adaptations)
      assert(ref.get(p).exists(_.get(m).exists(_.contains(q))),
        s"stale adaptation: $m $p $q")
  }
}
