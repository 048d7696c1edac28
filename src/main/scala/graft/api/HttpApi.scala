package graft.api

import java.net.InetSocketAddress
import java.sql.Timestamp
import java.time.Instant
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.functions.Buckets
import graft.operators.{DestinationStore, ListQuery, Metrics}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Thin HTTP shell over the typed request structs — the last user-facing
  * surface of the reference not yet exposed
  * (`/root/reference/internal/apirouter/log_handlers.go:41-60` limit
  * clamping, `metrics_handlers.go:53-117` measure/dimension allowlists,
  * `destination_handlers.go` CRUD). Routing and JSON rendering only: every
  * semantic decision (keyset cursors, limit clamps, measure catalogs,
  * resource guards, CRUD rules) already lives in
  * [[graft.operators.ListQuery]]/[[graft.operators.Metrics]]/
  * [[graft.operators.DestinationStore]]; the shell maps their typed
  * errors onto status codes:
  *
  *   - validation (`IllegalArgumentException`) → 400
  *   - [[Metrics.ResourceLimitExceeded]] → 400 (the reference surfaces the
  *     ClickHouse max_rows_to_group_by breach as a client error)
  *   - not-found → 404, duplicate create → 409, anything else → 500
  *
  * Built on the JDK's `com.sun.net.httpserver` — driver-side control
  * plane, no new dependencies; the data plane stays Spark jobs.
  */
object HttpApi {

  final case class Config(
      events: DataFrame,
      destTable: String,
      storeSecret: String,
      // commit-log table path backing `events`: when set, GET
      // /events/{id} plans its file set from the manifest key blooms
      // (CommitLog.scanForKey — driver-side tests, ~1 file read) instead
      // of filtering the full frame. None = frame filter, as before.
      eventsTable: Option[String] = None,
      defaultLimit: Int = 100,
      maxLimit: Int = 1000,
      // POST /api/v1/publish target: a spool directory a streaming file
      // source tails (`spark.readStream.text`) into the Runner's ingest
      // stage. None = publish route disabled (404), as when the reference
      // deploys the API without PublishMQ.
      publishSpool: Option[String] = None,
      // ingest topic allowlist (reference ErrRequiredTopic/ErrInvalidTopic,
      // publishmq/eventhandler.go:71-76); empty = any topic accepted
      availableTopics: Seq[String] = Nil,
      // denormalized attempts log (Runner.logSchema) for /attempts and
      // /metrics/attempts; None = those routes 404. A THUNK, re-invoked
      // per request, because a DataFrame's parquet file listing is frozen
      // at creation — a live log grows between requests (the credsDim
      // pattern, streaming/Sinks.scala)
      attempts: Option[() => DataFrame] = None,
      // tenant changelog table for the /tenants CRUD routes
      tenantTable: Option[String] = None,
      // retry-task store (Runner retryPath) for POST /retry
      retrySpool: Option[String] = None,
      // sink registry for /destination-types
      registry: Option[graft.streaming.Sinks.Registry] = None,
      // GK latency rollup table (Runner latencyRollupTable) — GET /metrics
      // reads delivery-latency quantiles from its sketch state; None
      // omits that family from the scrape
      latencyRollup: Option[String] = None,
      // per-event trace table (streaming/EventTrace.scala) — GET
      // /events/{id}/trace follows one event through receive → match →
      // deliver → log; None = route 404s
      traceTable: Option[String] = None)

  final class Server(val http: HttpServer) {
    def port: Int = http.getAddress.getPort
    def stop(): Unit = {
      http.stop(0)
      // the handler pool's core threads are non-daemon: without shutdown
      // a forked bench JVM that booted an API never exits after main
      http.getExecutor match {
        case es: java.util.concurrent.ExecutorService => es.shutdownNow(); ()
        case _ => ()
      }
    }
  }

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  private val EventDims = Set("event_type", "user_id")

  def start(spark: SparkSession, cfg: Config, port: Int = 0): Server = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // 8 handler threads: a serving deployment takes concurrent point
    // lookups; 4 measurably queued an 8-client load at the HTTP layer
    // before Spark ever saw the request (point_lookup_concurrent bench)
    http.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    // CRUD op sequencing continues from the persisted high-water mark of
    // BOTH changelogs (destinations and tenants share the counter), so
    // restarts never reuse an op_seq (last-write-wins stays sane)
    val opSeq = new java.util.concurrent.atomic.AtomicLong(
      initialOpSeq(spark, cfg))
    // publish idempotency window: the reference claims each event id in
    // Redis with a TTL and 409s a second claim
    // (`idempotence/idempotence.go:100-169`); the API-shell equivalent is
    // a bounded insertion-order LRU — the DURABLE guarantee stays with
    // the pipeline's watermark dedup + attempt-id log dedup
    val seenIds = java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, java.lang.Boolean](1024, 0.75f, false) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, java.lang.Boolean]): Boolean =
          size() > 65536
      })
    http.createContext("/", (ex: HttpExchange) => handle(spark, cfg, opSeq, seenIds, ex))
    http.start()
    new Server(http)
  }

  private def initialOpSeq(spark: SparkSession, cfg: Config): Long =
    try math.max(
      DestinationStore.highWaterOpSeq(spark, cfg.destTable),
      cfg.tenantTable.map(DestinationStore.highWaterOpSeq(spark, _)).getOrElse(0L))
    catch { case _: Exception => 0L } // empty/absent table

  // ----------------------------------------------------------- routing --

  private val EventsList = "/api/v1/([^/]+)/events".r
  private val EventGet = "/api/v1/([^/]+)/events/([^/]+)".r
  private val EventTraceGet = "/api/v1/([^/]+)/events/([^/]+)/trace".r
  private val MetricsEvents = "/api/v1/([^/]+)/metrics/events".r
  private val MetricsAttempts = "/api/v1/([^/]+)/metrics/attempts".r
  private val DestList = "/api/v1/([^/]+)/destinations".r
  private val DestOne = "/api/v1/([^/]+)/destinations/([^/]+)".r
  private val DestEnable = "/api/v1/([^/]+)/destinations/([^/]+)/enable".r
  private val DestDisable = "/api/v1/([^/]+)/destinations/([^/]+)/disable".r
  private val AttemptsList = "/api/v1/([^/]+)/attempts".r
  private val AttemptGet = "/api/v1/([^/]+)/attempts/([^/]+)".r
  private val DestAttempts = "/api/v1/([^/]+)/destinations/([^/]+)/attempts".r
  private val DestAttemptGet = "/api/v1/([^/]+)/destinations/([^/]+)/attempts/([^/]+)".r
  private val TenantOne = "/api/v1/tenants/([^/]+)".r
  private val TenantToken = "/api/v1/tenants/([^/]+)/token".r
  private val TenantPortal = "/api/v1/tenants/([^/]+)/portal".r
  private val DestTypeOne = "/api/v1/destination-types/([^/]+)".r

  private def handle(spark: SparkSession, cfg: Config,
                     opSeq: java.util.concurrent.atomic.AtomicLong,
                     seenIds: java.util.Map[String, java.lang.Boolean],
                     ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    val q = parseQuery(ex.getRequestURI.getRawQuery)
    val t0 = System.nanoTime()
    try {
      (method, path) match {
        case ("GET", "/healthz") =>
          // reference healthz: 200 while workers are healthy (503 on a
          // failed worker — this single-process engine is alive iff it
          // can answer, so serving the route IS the health check)
          sendJson(ex, 200, nf.objectNode().put("status", "healthy"))
        case ("GET", "/metrics") => metricsScrape(spark, cfg, ex)
        case ("GET", "/api/v1/openapi.json") =>
          // self-describing surface: the compiled-in contract, rendered
          // OpenAPI-shaped (reference ships docs/apis/openapi.yaml; the
          // SDK contract tests pin against it)
          sendJson(ex, 200, ApiContract.renderOpenApi)
        case ("POST", "/api/v1/publish") => publishEvent(cfg, seenIds, ex)
        case ("POST", "/api/v1/retry") => retryEvent(spark, cfg, ex)
        case ("GET", "/api/v1/topics") => listTopics(cfg, ex)
        case ("GET", "/api/v1/destination-types") => listDestTypes(cfg, ex)
        case ("GET", DestTypeOne(t)) => getDestType(cfg, t, ex)
        case ("GET", "/api/v1/tenants") => listTenantsRoute(spark, cfg, q, ex)
        case ("GET", TenantToken(id)) => tenantToken(spark, cfg, id, ex)
        case ("GET", TenantPortal(id)) => tenantPortal(spark, cfg, q, id, ex)
        case ("PUT", TenantOne(id)) => putTenant(spark, cfg, opSeq, id, ex)
        case ("GET", TenantOne(id)) => getTenant(spark, cfg, id, ex)
        case ("DELETE", TenantOne(id)) => deleteTenantRoute(spark, cfg, opSeq, id, ex)
        case ("GET", EventsList(tenant)) => listEvents(cfg, q, tenant, ex)
        case ("GET", EventTraceGet(_, id)) => cfg.traceTable match {
          case Some(t) => getEventTrace(spark, t, id, ex,
            otlp = q.get("format").exists(_.headOption.contains("otlp")))
          case None => sendError(ex, 404, "tracing not configured")
        }
        case ("GET", EventGet(_, id)) => cfg.eventsTable match {
          case Some(t) => getEventByKey(spark, cfg, t, id, ex)
          case None => getEvent(cfg, id, ex)
        }
        case ("GET", MetricsEvents(_)) => metricsEvents(spark, cfg, q, ex)
        case ("GET", MetricsAttempts(tenant)) => metricsAttempts(spark, cfg, q, tenant, ex)
        case ("GET", AttemptsList(tenant)) => listAttempts(cfg, q, tenant, ex)
        case ("GET", AttemptGet(tenant, id)) => getAttempt(cfg, tenant, id, ex)
        case ("GET", DestAttempts(tenant, dest)) =>
          listAttempts(cfg, q, tenant, ex, destScope = Some(dest))
        case ("GET", DestAttemptGet(tenant, _, id)) => getAttempt(cfg, tenant, id, ex)
        case ("GET", DestList(tenant)) => listDestinations(spark, cfg, q, tenant, ex)
        case ("POST", DestList(tenant)) => postDestination(spark, cfg, opSeq, tenant, ex)
        case ("GET", DestOne(tenant, id)) => getDestination(spark, cfg, tenant, id, ex)
        case ("PUT", DestOne(tenant, id)) =>
          putDestination(spark, cfg, opSeq, tenant, id, ex)
        case ("PATCH", DestOne(tenant, id)) =>
          patchDestination(spark, cfg, opSeq, tenant, id, ex)
        case ("DELETE", DestOne(tenant, id)) =>
          deleteDestination(spark, cfg, opSeq, tenant, id, ex)
        case ("PUT", DestEnable(tenant, id)) =>
          setDestinationDisabled(spark, cfg, opSeq, tenant, id, disabled = false, ex)
        case ("PUT", DestDisable(tenant, id)) =>
          setDestinationDisabled(spark, cfg, opSeq, tenant, id, disabled = true, ex)
        case _ => sendError(ex, 404, "no such route")
      }
    } catch {
      case e: Metrics.ResourceLimitExceeded => sendError(ex, 400, e.getMessage)
      case e: DestinationStore.ErrDestinationNotFound => sendError(ex, 404, e.getMessage)
      case e: DestinationStore.ErrDestinationDeleted => sendError(ex, 404, e.getMessage)
      case e: DestinationStore.ErrTenantNotFound => sendError(ex, 404, e.getMessage)
      case e: DestinationStore.ErrDuplicateDestination => sendError(ex, 409, e.getMessage)
      case e: DestinationStore.ErrMaxDestinationsPerTenantReached =>
        sendError(ex, 400, e.getMessage)
      case e: IllegalArgumentException => sendError(ex, 400, e.getMessage)
      case e: Exception => sendError(ex, 500, String.valueOf(e.getMessage))
    } finally {
      // operational accounting (reference emetrics APICalls /
      // APIResponseLatency): counted by ROUTE TEMPLATE so label
      // cardinality is bounded by the route table, not by tenants/ids.
      // The scrape route itself is excluded (scraping must not move the
      // counters it reports).
      if (path != "/metrics")
        graft.streaming.Emetrics.apiCall(method, routeTemplate(path),
          (System.nanoTime() - t0) / 1000000L)
      ex.close()
    }
  }

  /** The route TEMPLATE a concrete path matched — the bounded label the
    * metrics counters key on. Unmatched paths fold into one bucket. */
  private def routeTemplate(path: String): String = path match {
    case "/healthz" | "/api/v1/openapi.json" | "/api/v1/publish" |
         "/api/v1/retry" | "/api/v1/topics" | "/api/v1/destination-types" |
         "/api/v1/tenants" => path
    case DestTypeOne(_) => "/api/v1/destination-types/{type}"
    case TenantToken(_) => "/api/v1/tenants/{tenant}/token"
    case TenantPortal(_) => "/api/v1/tenants/{tenant}/portal"
    case TenantOne(_) => "/api/v1/tenants/{tenant}"
    case EventGet(_, _) => "/api/v1/{tenant}/events/{id}"
    case EventsList(_) => "/api/v1/{tenant}/events"
    case MetricsEvents(_) => "/api/v1/{tenant}/metrics/events"
    case MetricsAttempts(_) => "/api/v1/{tenant}/metrics/attempts"
    case DestAttemptGet(_, _, _) => "/api/v1/{tenant}/destinations/{id}/attempts/{attempt}"
    case DestAttempts(_, _) => "/api/v1/{tenant}/destinations/{id}/attempts"
    case DestEnable(_, _) => "/api/v1/{tenant}/destinations/{id}/enable"
    case DestDisable(_, _) => "/api/v1/{tenant}/destinations/{id}/disable"
    case DestOne(_, _) => "/api/v1/{tenant}/destinations/{id}"
    case DestList(_) => "/api/v1/{tenant}/destinations"
    case AttemptGet(_, _) => "/api/v1/{tenant}/attempts/{id}"
    case AttemptsList(_) => "/api/v1/{tenant}/attempts"
    case _ => "{unmatched}"
  }

  /** GET /metrics — Prometheus/OpenMetrics text exposition of the
    * pipeline's operational metrics ([[graft.streaming.Emetrics]]). */
  private def metricsScrape(spark: SparkSession, cfg: Config,
                            ex: HttpExchange): Unit = {
    val body = graft.streaming.Emetrics
      .render(spark, cfg.attempts, cfg.latencyRollup)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      "text/plain; version=0.0.4; charset=utf-8")
    ex.sendResponseHeaders(200, body.length)
    ex.getResponseBody.write(body)
  }

  // ---------------------------------------------------------- handlers --

  /** Reference parseLimit (`log_handlers.go:41-53`): absent/invalid →
    * default; positive values capped at max. */
  private[api] def parseLimit(raw: Option[String], dflt: Int, max: Int): Int = {
    val parsed = raw.flatMap(_.toIntOption).filter(_ > 0).getOrElse(dflt)
    math.min(parsed, max)
  }

  private def listEvents(cfg: Config, q: Map[String, Seq[String]],
                         tenant: String, ex: HttpExchange): Unit = {
    val inFilters = Seq("event_type" -> "event_type[]", "user_id" -> "user_id[]")
      .flatMap { case (colName, param) =>
        val vs = q.getOrElse(param, q.getOrElse(colName, Nil))
        if (vs.isEmpty) None
        else Some(colName -> vs.map(v =>
          if (colName == "user_id") v.toLongOption.getOrElse(
            throw new IllegalArgumentException(s"bad user_id: $v")): Any
          else v: Any))
      }.toMap
    val timeFilters =
      q.get("start").flatMap(_.headOption).map(s =>
        (ListQuery.Gte: ListQuery.TimeOp, parseInstant("start", s))).toSeq ++
      q.get("end").flatMap(_.headOption).map(s =>
        (ListQuery.Lte: ListQuery.TimeOp, parseInstant("end", s))).toSeq
    val req = ListQuery.Request(
      inFilters = inFilters,
      timeFilters = timeFilters,
      order = graft.operators.Keyset.Order.parse(
        q.get("order").flatMap(_.headOption).orNull),
      limit = parseLimit(q.get("limit").flatMap(_.headOption),
        cfg.defaultLimit, cfg.maxLimit),
      next = q.get("next").flatMap(_.headOption),
      prev = q.get("prev").flatMap(_.headOption))
    val page = ListQuery.list(cfg.events, req, "events", "ts", "event_id")
    val out = nf.objectNode()
    val arr = out.putArray("models")
    val schema = cfg.events.schema
    page.rows.foreach(r => arr.add(rowToJson(r, schema)))
    page.next.foreach(out.put("next", _))
    page.prev.foreach(out.put("prev", _))
    sendJson(ex, 200, out)
  }

  /** `POST /api/v1/publish` (reference `publish_handlers.go:37-120` +
    * `publishmq/eventhandler.go:71-76`): validate → apply ingest defaults
    * (missing id → generated, missing time → now, missing eligibility →
    * true, missing metadata → {}) → enqueue. The queue here is a spool
    * directory tailed by a streaming file source: one atomically-renamed
    * JSON file per accepted event (FileStreamSource lists whole files, so
    * rename-into-place is the no-partial-reads publish primitive). */
  private def publishEvent(cfg: Config,
                           seenIds: java.util.Map[String, java.lang.Boolean],
                           ex: HttpExchange): Unit = {
    val spool = cfg.publishSpool.getOrElse {
      sendError(ex, 404, "publish is not enabled"); return
    }
    val body = try mapper.readTree(ex.getRequestBody) catch {
      case _: Exception => null
    }
    if (body == null || !body.isObject) {
      sendError(ex, 422, "validation error: body must be a JSON object"); return
    }
    def strField(n: String): Option[String] =
      Option(body.get(n)).filter(_.isTextual).map(_.asText)
    val tenant = strField("tenant_id").getOrElse {
      sendError(ex, 422, "validation error: tenant_id is required"); return
    }
    val data = body.get("data")
    if (data == null || !data.isObject) {
      // the reference rejects null / non-object / invalid JSON data
      // payloads with 422 (publish_handlers.go:42-53)
      sendError(ex, 422, "validation error: data must be a valid JSON object")
      return
    }
    val topic = strField("topic")
    if (cfg.availableTopics.nonEmpty) {
      if (topic.isEmpty) {
        sendError(ex, 422, "validation error: topic is required"); return
      }
      if (!topic.contains("*") && !cfg.availableTopics.contains(topic.get)) {
        sendError(ex, 422, "validation error: topic is invalid"); return
      }
    }
    val id = strField("id").getOrElse(
      "evt_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    if (seenIds.putIfAbsent(id, java.lang.Boolean.TRUE) != null) {
      sendError(ex, 409, s"duplicate event id: $id"); return
    }
    val time = strField("time").getOrElse(
      Instant.now.truncatedTo(java.time.temporal.ChronoUnit.MILLIS).toString)

    val e = nf.objectNode()
    e.put("event_id", id)
    e.put("tenant_id", tenant)
    strField("destination_id").foreach(d => e.put("destination_id", d))
    topic.foreach(t => e.put("topic", t))
    e.put("eligible_for_retry",
      Option(body.get("eligible_for_retry")).filter(_.isBoolean)
        .forall(_.asBoolean))
    e.put("event_time", time)
    e.set[ObjectNode]("metadata",
      Option(body.get("metadata")).filter(_.isObject)
        .getOrElse(nf.objectNode()))
    e.set[ObjectNode]("data", data)

    // atomic publish: write outside the listing dir, rename into place
    // dot-prefixed files are hidden from Spark's file-source listing, so
    // the staging write is invisible until the rename
    val dir = java.nio.file.Paths.get(spool)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".pub-", ".tmp")
    java.nio.file.Files.write(tmp,
      mapper.writeValueAsBytes(e))
    java.nio.file.Files.move(tmp, dir.resolve(s"$id.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)

    // reference emetrics EventPublished/EventEligbible: counted at the
    // moment the publish is durably accepted into the spool
    graft.streaming.Emetrics.eventPublished(topic.getOrElse("*"),
      e.get("eligible_for_retry").asBoolean)
    val out = nf.objectNode()
    out.put("id", id)
    out.put("status", "accepted")
    sendJson(ex, 202, out)
  }

  private def getEvent(cfg: Config, id: String, ex: HttpExchange): Unit = {
    val eid = id.toLongOption.getOrElse(
      throw new IllegalArgumentException(s"bad event id: $id"))
    ListQuery.retrieve(cfg.events, "event_id", eid) match {
      case Some(row) => sendJson(ex, 200, rowToJson(row, cfg.events.schema))
      case None => sendError(ex, 404, s"event not found: $id")
    }
  }

  private def getEventByKey(spark: SparkSession, cfg: Config, table: String,
                            id: String, ex: HttpExchange): Unit = {
    val eid = id.toLongOption.getOrElse(
      throw new IllegalArgumentException(s"bad event id: $id"))
    val hit = graft.operators.CommitLog
      .scanForKey(spark, table, "event_id", eid)
      .limit(1).collect().headOption
    hit match {
      case Some(row) => sendJson(ex, 200, rowToJson(row, row.schema))
      case None => sendError(ex, 404, s"event not found: $id")
    }
  }

  /** One event's spans in pipeline order — the debugging view the
    * reference's OTel tracer exports per event; served from the trace
    * table via the same manifest-bloom point lookup as GET /events/{id}
    * (the r10 snapshot/bloom/relation caches make it request-cheap). */
  private def getEventTrace(spark: SparkSession, table: String,
                            id: String, ex: HttpExchange,
                            otlp: Boolean = false): Unit = {
    val spans = graft.streaming.EventTrace.forEvent(spark, table, id).collect()
    if (spans.isEmpty) { sendError(ex, 404, s"no trace for event: $id"); return }
    if (otlp) {
      // ?format=otlp — the OTLP/JSON encoding a standard collector
      // ingests (EventTrace.otlpJson documents the field mapping)
      val body = graft.streaming.EventTrace.otlpJson(spans.toSeq)
        .getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, body.length.toLong)
      ex.getResponseBody.write(body)
      ex.close()
      return
    }
    val arr = mapper.createArrayNode()
    spans.foreach(r => arr.add(rowToJson(r, spans.head.schema)))
    val root = mapper.createObjectNode()
    root.put("event_id", id)
    root.put("trace_id", spans.head.getAs[String]("trace_id"))
    root.set[com.fasterxml.jackson.databind.JsonNode]("spans", arr)
    sendJson(ex, 200, root)
  }

  private def metricsEvents(spark: SparkSession, cfg: Config,
                            q: Map[String, Seq[String]], ex: HttpExchange): Unit = {
    val measures = q.getOrElse("measures[]", q.getOrElse("measures", Nil))
    require(measures.nonEmpty, "at least one measures[] is required")
    val dimensions = q.getOrElse("dimensions[]", q.getOrElse("dimensions", Nil))
    val granularity = Buckets.Granularity.parse(
      q.get("granularity").flatMap(_.headOption).getOrElse(
        throw new IllegalArgumentException("granularity is required")))
    val start = parseInstant("start", q.get("start").flatMap(_.headOption)
      .getOrElse(throw new IllegalArgumentException("start is required")))
    val end = parseInstant("end", q.get("end").flatMap(_.headOption)
      .getOrElse(throw new IllegalArgumentException("end is required")))
    val filters = EventDims.toSeq.sorted.flatMap { d =>
      val vs = q.getOrElse(s"$d[]", Nil)
      if (vs.isEmpty) None else Some(d -> vs)
    }.toMap
    val req = Metrics.Request(start, end, granularity, measures, dimensions,
      filters, rowLimit = parseLimit(q.get("limit").flatMap(_.headOption),
        cfg.defaultLimit, 100000))
    Metrics.validate(req, Metrics.eventMeasures, EventDims)
    val res = Metrics.query(spark, cfg.events, req)
    try {
      val rows = res.df.collect()
      val schema = res.df.schema
      val out = nf.objectNode()
      out.put("truncated", res.truncated)
      val arr = out.putArray("buckets")
      rows.foreach(r => arr.add(rowToJson(r, schema)))
      sendJson(ex, 200, out)
    } finally res.cleanup()
  }

  private def listDestinations(spark: SparkSession, cfg: Config,
                               q: Map[String, Seq[String]], tenant: String,
                               ex: HttpExchange): Unit = {
    val recs = DestinationStore.list(spark, cfg.destTable, tenant,
      cfg.storeSecret,
      types = q.getOrElse("type[]", q.getOrElse("type", Nil)),
      topics = q.getOrElse("topics[]", q.getOrElse("topics", Nil)),
      ids = q.getOrElse("id[]", Nil))
    val arr = nf.arrayNode()
    recs.foreach(r => arr.add(destToJson(r)))
    sendJson(ex, 200, arr)
  }

  private def getDestination(spark: SparkSession, cfg: Config, tenant: String,
                             id: String, ex: HttpExchange): Unit =
    DestinationStore.retrieve(spark, cfg.destTable, tenant, id, cfg.storeSecret) match {
      case Some(rec) => sendJson(ex, 200, destToJson(rec))
      case None => sendError(ex, 404, s"destination not found: $id")
    }

  private def strMapOf(body: com.fasterxml.jackson.databind.JsonNode,
                       field: String): Map[String, String] = {
    val n = body.get(field)
    if (n == null || n.isNull) Map.empty
    else {
      require(n.isObject, s"$field must be an object")
      val it = n.properties.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
      b.result()
    }
  }

  private def createDestinationFromBody(
      spark: SparkSession, cfg: Config,
      opSeq: java.util.concurrent.atomic.AtomicLong, tenant: String,
      id: String, body: com.fasterxml.jackson.databind.JsonNode,
      ex: HttpExchange): Unit = {
    val typ = Option(body.get("type")).map(_.asText).getOrElse(
      throw new IllegalArgumentException("type is required"))
    val topicsNode = body.get("topics")
    require(topicsNode != null && topicsNode.isArray && topicsNode.size > 0,
      "topics must be a non-empty array")
    val topics = (0 until topicsNode.size).map(topicsNode.get(_).asText)
    val config = strMapOf(body, "config")
    val credentials = strMapOf(body, "credentials")
    // fail fast at create time (reference registry.ValidateDestination in
    // the Create handler): a malformed webhook URL or a Kafka destination
    // missing brokers must 422 here, not surface as delivery failures
    if (!validateDestOr422(ex, typ, config, credentials)) return
    val now = new Timestamp(System.currentTimeMillis())
    val rec = DestinationStore.DestinationRecord(
      tenant, id, typ, topics,
      Option(body.get("filter")).filterNot(_.isNull).map(_.toString),
      config, credentials,
      strMapOf(body, "delivery_metadata"),
      strMapOf(body, "metadata"), now, now, None, None)
    DestinationStore.create(spark, cfg.destTable, rec, cfg.storeSecret,
      opSeq.incrementAndGet())
    sendJson(ex, 201, destToJson(rec))
  }

  private def putDestination(spark: SparkSession, cfg: Config,
                             opSeq: java.util.concurrent.atomic.AtomicLong,
                             tenant: String, id: String, ex: HttpExchange): Unit = {
    val body = mapper.readTree(ex.getRequestBody)
    require(body != null && body.isObject, "body must be a JSON object")
    createDestinationFromBody(spark, cfg, opSeq, tenant, id, body, ex)
  }

  /** `POST /api/v1/{tenant}/destinations` (reference Create,
    * `destination_handlers.go:77-160`): create with an OPTIONAL id —
    * generated as a `des_`-prefixed uuid when absent (`idgen.go` shape). */
  private def postDestination(spark: SparkSession, cfg: Config,
                              opSeq: java.util.concurrent.atomic.AtomicLong,
                              tenant: String, ex: HttpExchange): Unit = {
    val body = mapper.readTree(ex.getRequestBody)
    require(body != null && body.isObject, "body must be a JSON object")
    val id = Option(body.get("id")).filterNot(_.isNull).map(_.asText)
      .filter(_.nonEmpty)
      .getOrElse("des_" + java.util.UUID.randomUUID().toString.replace("-", ""))
    createDestinationFromBody(spark, cfg, opSeq, tenant, id, body, ex)
  }

  /** `PATCH /api/v1/{tenant}/destinations/{id}` (reference Update,
    * `destination_handlers.go:162-250`): partial update — `type` is
    * immutable (400 on change), `topics` replaces-and-validates when
    * present, `config`/`credentials`/`metadata`/`delivery_metadata` apply
    * JSON merge-patch semantics (null value deletes the key), `filter`
    * replaces (explicit null clears). created_at/disabled state are
    * preserved. */
  private def patchDestination(spark: SparkSession, cfg: Config,
                               opSeq: java.util.concurrent.atomic.AtomicLong,
                               tenant: String, id: String, ex: HttpExchange): Unit = {
    val body = mapper.readTree(ex.getRequestBody)
    require(body != null && body.isObject, "body must be a JSON object")
    val orig = DestinationStore.retrieve(spark, cfg.destTable, tenant, id,
      cfg.storeSecret) match {
      case Some(r) => r
      case None => sendError(ex, 404, s"destination not found: $id"); return
    }
    Option(body.get("type")).filterNot(_.isNull).map(_.asText).foreach { t =>
      if (t != orig.dest_type)
        { sendError(ex, 400, "type cannot be updated"); return }
    }
    val topics = body.get("topics") match {
      case null => orig.topics
      case n =>
        require(n.isArray && n.size > 0, "topics must be a non-empty array")
        (0 until n.size).map(n.get(_).asText)
    }
    def mergePatch(cur: Map[String, String], field: String): Map[String, String] = {
      val n = body.get(field)
      // RFC 7396 distinction the SDK corpus pins
      // (`spec-sdk-tests/tests/destinations/webhook-merge-patch.test.ts`):
      // an ABSENT field is "no change", but a field PRESENT WITH null
      // replaces — i.e. clears the whole map. (For config/credentials the
      // merged result still passes provider schema validation, so nulling
      // a required field 422s rather than corrupting the destination.)
      if (n == null) cur
      else if (n.isNull) Map.empty
      else {
        require(n.isObject, s"$field must be an object")
        val it = n.properties.iterator()
        var out = cur
        while (it.hasNext) {
          val e = it.next()
          out = if (e.getValue.isNull) out - e.getKey
            else out + (e.getKey -> e.getValue.asText)
        }
        out
      }
    }
    val filter =
      if (!body.has("filter")) orig.filter_json
      else Option(body.get("filter")).filterNot(_.isNull).map(_.toString)
    val mergedConfig = mergePatch(orig.config, "config")
    val mergedCreds = mergePatch(orig.credentials, "credentials")
    // the MERGED maps are what delivery will see — validate those, so a
    // patch can't null out a required field (reference Update handler
    // validates the merged destination too)
    if (!validateDestOr422(ex, orig.dest_type, mergedConfig, mergedCreds))
      return
    val now = new Timestamp(System.currentTimeMillis())
    val rec = orig.copy(
      topics = topics,
      filter_json = filter,
      config = mergedConfig,
      credentials = mergedCreds,
      delivery_metadata = mergePatch(orig.delivery_metadata, "delivery_metadata"),
      metadata = mergePatch(orig.metadata, "metadata"),
      updated_at = now)
    DestinationStore.upsert(spark, cfg.destTable, rec, cfg.storeSecret,
      opSeq.incrementAndGet())
    sendJson(ex, 200, destToJson(rec))
  }

  private def deleteDestination(spark: SparkSession, cfg: Config,
                                opSeq: java.util.concurrent.atomic.AtomicLong,
                                tenant: String, id: String, ex: HttpExchange): Unit = {
    DestinationStore.delete(spark, cfg.destTable, tenant, id,
      opSeq.incrementAndGet(), new Timestamp(System.currentTimeMillis()))
    sendJson(ex, 200, nf.objectNode().put("deleted", id))
  }

  /** Enable/disable toggle (reference `destination_handlers.go`
    * Enable/Disable): sets or clears `disabled_at` via an upsert — the
    * same changelog row the alert auto-disable write-back appends, so the
    * streaming fanout's `disabled` filter observes both paths uniformly. */
  private def setDestinationDisabled(spark: SparkSession, cfg: Config,
                                     opSeq: java.util.concurrent.atomic.AtomicLong,
                                     tenant: String, id: String, disabled: Boolean,
                                     ex: HttpExchange): Unit = {
    val rec = DestinationStore.retrieve(spark, cfg.destTable, tenant, id,
      cfg.storeSecret).getOrElse {
        sendError(ex, 404, s"destination not found: $id"); return
      }
    val now = new Timestamp(System.currentTimeMillis())
    val updated = rec.copy(
      disabled_at = if (disabled) rec.disabled_at.orElse(Some(now)) else None,
      updated_at = now)
    DestinationStore.upsert(spark, cfg.destTable, updated, cfg.storeSecret,
      opSeq.incrementAndGet())
    sendJson(ex, 200, destToJson(updated))
  }

  /** `GET /api/v1/topics` (reference `topic_handlers.go` List): the
    * configured topic allowlist. */
  private def listTopics(cfg: Config, ex: HttpExchange): Unit = {
    val arr = nf.arrayNode()
    cfg.availableTopics.foreach(arr.add)
    sendJson(ex, 200, arr)
  }

  /** One provider's served metadata payload (reference
    * `metadata/providers/<type>/metadata.json` shape: type, label,
    * config_fields, credential_fields with the validation attributes). */
  private def destTypeJson(t: String): com.fasterxml.jackson.databind.node.ObjectNode = {
    val o = nf.objectNode().put("type", t)
    DestMetadata.providers.get(t).foreach { p =>
      o.put("label", p.label)
      def fieldArr(name: String, fs: Seq[DestMetadata.FieldSpec]): Unit = {
        val arr = o.putArray(name)
        fs.foreach { f =>
          val fo = nf.objectNode()
            .put("key", f.key).put("type", f.ftype)
            .put("label", f.label).put("required", f.required)
          f.default.foreach(fo.put("default", _))
          if (f.sensitive) fo.put("sensitive", true)
          f.pattern.foreach(fo.put("pattern", _))
          f.min.foreach(fo.put("min", _)); f.max.foreach(fo.put("max", _))
          f.minLength.foreach(fo.put("minlength", _))
          f.maxLength.foreach(fo.put("maxlength", _))
          if (f.options.nonEmpty) {
            val oa = fo.putArray("options"); f.options.foreach(oa.add)
          }
          arr.add(fo)
        }
      }
      fieldArr("config_fields", p.configFields)
      fieldArr("credential_fields", p.credentialFields)
    }
    o
  }

  /** `GET /api/v1/destination-types` (reference ListProviderMetadata,
    * `destination_handlers.go`): the registered sink types, each carrying
    * its full field schema from [[DestMetadata]]. */
  private def listDestTypes(cfg: Config, ex: HttpExchange): Unit = {
    val arr = nf.arrayNode()
    cfg.registry.map(_.types).getOrElse(Nil).foreach(t => arr.add(destTypeJson(t)))
    sendJson(ex, 200, arr)
  }

  private def getDestType(cfg: Config, t: String, ex: HttpExchange): Unit =
    if (cfg.registry.exists(_.types.contains(t)))
      sendJson(ex, 200, destTypeJson(t))
    else sendError(ex, 404, s"no such destination type: $t")

  // ------------------------------------------------------------- tenants --

  private def tenantTableOr404(cfg: Config, ex: HttpExchange): Option[String] = {
    val t = cfg.tenantTable
    if (t.isEmpty) sendError(ex, 404, "tenant store is not configured")
    t
  }

  /** `PUT /api/v1/tenants/:id` (reference `tenant_handlers.go:41-96`):
    * create (201) or update (200, PUT replaces metadata, preserves
    * created_at). */
  private def putTenant(spark: SparkSession, cfg: Config,
                        opSeq: java.util.concurrent.atomic.AtomicLong,
                        id: String, ex: HttpExchange): Unit = {
    val tt = tenantTableOr404(cfg, ex).getOrElse(return)
    val body = try mapper.readTree(ex.getRequestBody) catch { case _: Exception => null }
    val metadata: Map[String, String] =
      Option(body).flatMap(b => Option(b.get("metadata"))).filter(_.isObject)
        .map { n =>
          val it = n.properties.iterator()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
          b.result()
        }.getOrElse(Map.empty)
    val existing = DestinationStore.retrieveTenant(spark, tt, cfg.destTable, id)
    val now = new Timestamp(System.currentTimeMillis())
    val created = existing.map(_.created_at).getOrElse(now)
    DestinationStore.upsertTenant(spark, tt,
      DestinationStore.TenantRecord(id, metadata, created, now, None),
      opSeq.incrementAndGet())
    val view = DestinationStore.retrieveTenant(spark, tt, cfg.destTable, id).get
    sendJson(ex, if (existing.isDefined) 200 else 201, tenantToJson(view))
  }

  private def getTenant(spark: SparkSession, cfg: Config, id: String,
                        ex: HttpExchange): Unit = {
    val tt = tenantTableOr404(cfg, ex).getOrElse(return)
    DestinationStore.retrieveTenant(spark, tt, cfg.destTable, id) match {
      case Some(v) => sendJson(ex, 200, tenantToJson(v))
      case None => sendError(ex, 404, s"tenant not found: $id")
    }
  }

  /** `DELETE /api/v1/tenants/:id`: cascade delete (tombstones every
    * destination, then the tenant). The cascade consumes one op_seq per
    * destination, so a block is reserved up front — op_seq only needs to
    * be monotonic for last-write-wins, gaps are harmless. */
  private def deleteTenantRoute(spark: SparkSession, cfg: Config,
                                opSeq: java.util.concurrent.atomic.AtomicLong,
                                id: String, ex: HttpExchange): Unit = {
    val tt = tenantTableOr404(cfg, ex).getOrElse(return)
    val base = opSeq.getAndAdd(65536) + 1
    DestinationStore.deleteTenant(spark, tt, cfg.destTable, id, base,
      new Timestamp(System.currentTimeMillis()))
    sendJson(ex, 200, nf.objectNode().put("deleted", id))
  }

  /** `GET /api/v1/tenants/:id/token` (reference RetrieveToken issues a
    * tenant-scoped JWT signed with the configured secret): a compact
    * HS256 JWT over the store secret — enough for a caller to verify
    * integrity and read the tenant claim. */
  private def makeJwt(cfg: Config, id: String): String = {
    val b64 = java.util.Base64.getUrlEncoder.withoutPadding
    def enc(s: String) = b64.encodeToString(s.getBytes("UTF-8"))
    val nowSec = System.currentTimeMillis() / 1000
    val header = enc("""{"alg":"HS256","typ":"JWT"}""")
    val payload = enc(
      s"""{"sub":"${esc(id)}","iat":$nowSec,"exp":${nowSec + 86400}}""")
    val sig = b64.encodeToString(graft.functions.Crypto.hmac("HmacSHA256",
      cfg.storeSecret.getBytes("UTF-8"), s"$header.$payload".getBytes("UTF-8")))
    s"$header.$payload.$sig"
  }

  private def tenantToken(spark: SparkSession, cfg: Config, id: String,
                          ex: HttpExchange): Unit = {
    val tt = tenantTableOr404(cfg, ex).getOrElse(return)
    if (DestinationStore.retrieveTenant(spark, tt, cfg.destTable, id).isEmpty) {
      sendError(ex, 404, s"tenant not found: $id"); return
    }
    sendJson(ex, 200, nf.objectNode().put("token", makeJwt(cfg, id)))
  }

  /** `GET /api/v1/tenants` (reference `tenant_handlers.go:103-160`):
    * `{models: [...], count}` with optional `id[]` filter and clamped
    * `limit` over the id-ascending (or `dir=desc`) order. */
  private def listTenantsRoute(spark: SparkSession, cfg: Config,
                               q: Map[String, Seq[String]],
                               ex: HttpExchange): Unit = {
    val tt = tenantTableOr404(cfg, ex).getOrElse(return)
    val ids = q.getOrElse("id[]", q.getOrElse("id", Nil))
    val dirDesc = q.get("dir").flatMap(_.headOption).contains("desc")
    val limit = parseLimit(q.get("limit").flatMap(_.headOption),
      dflt = 100, max = 1000)
    val all = DestinationStore.listTenants(spark, tt, cfg.destTable, ids)
    val ordered = if (dirDesc) all.reverse else all
    val page = ordered.take(limit)
    val o = nf.objectNode()
    val arr = o.putArray("models")
    page.foreach(v => arr.add(tenantToJson(v)))
    o.put("count", page.size)
    sendJson(ex, 200, o)
  }

  /** `GET /api/v1/tenants/:id/portal?theme=` (reference RetrievePortal,
    * `tenant_handlers.go:214-245`): a portal redirect URL embedding a
    * fresh tenant-scoped JWT; theme passes through only when valid. */
  private def tenantPortal(spark: SparkSession, cfg: Config,
                           q: Map[String, Seq[String]], id: String,
                           ex: HttpExchange): Unit = {
    val tt = tenantTableOr404(cfg, ex).getOrElse(return)
    if (DestinationStore.retrieveTenant(spark, tt, cfg.destTable, id).isEmpty) {
      sendError(ex, 404, s"tenant not found: $id"); return
    }
    val theme = q.get("theme").flatMap(_.headOption)
      .filter(t => t == "dark" || t == "light")
    val host = Option(ex.getRequestHeaders.getFirst("Host")).getOrElse("localhost")
    val url = s"http://$host?token=${makeJwt(cfg, id)}" +
      theme.map(t => s"&theme=$t").getOrElse("")
    sendJson(ex, 200, nf.objectNode()
      .put("redirect_url", url).put("tenant_id", id))
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def tenantToJson(v: DestinationStore.TenantView): ObjectNode = {
    val o = nf.objectNode()
    o.put("id", v.tenant_id)
    o.put("destinations_count", v.destinations_count)
    val t = o.putArray("topics")
    v.topics.foreach(t.add)
    val m = o.putObject("metadata")
    v.metadata.foreach { case (k, x) => m.put(k, x) }
    o.put("created_at", v.created_at.toInstant.toString)
    o.put("updated_at", v.updated_at.toInstant.toString)
    o
  }

  // ------------------------------------------------------------ attempts --

  private def attemptsOr404(cfg: Config, ex: HttpExchange): Option[DataFrame] = {
    val a = cfg.attempts.map(_.apply())
    if (a.isEmpty) sendError(ex, 404, "attempts log is not configured")
    a
  }

  /** `GET /api/v1/:tenant/attempts` (reference ListAttempts,
    * `logstore/driver/driver.go:33-43` ListAttemptRequest): tenant-scoped
    * conjunctive filters + keyset cursors over the denormalized log.
    * `destScope` pins destination_id for the
    * `/destinations/:id/attempts` route (ListDestinationAttempts). */
  private def listAttempts(cfg: Config, q: Map[String, Seq[String]],
                           tenant: String, ex: HttpExchange,
                           destScope: Option[String] = None): Unit = {
    val df = attemptsOr404(cfg, ex).getOrElse(return)
    val inFilters: Map[String, Seq[Any]] =
      Map("tenant_id" -> Seq[Any](tenant)) ++
        Seq("event_id", "destination_id", "destination_type", "status",
            "topic").flatMap { c =>
          val vs = q.getOrElse(s"$c[]", q.getOrElse(c, Nil))
          if (vs.isEmpty) None else Some(c -> vs.map(identity[Any]))
        } ++
        destScope.map(d => "destination_id" -> Seq[Any](d))
    val timeFilters =
      q.get("start").flatMap(_.headOption).map(s =>
        (ListQuery.Gte: ListQuery.TimeOp, parseInstant("start", s))).toSeq ++
      q.get("end").flatMap(_.headOption).map(s =>
        (ListQuery.Lte: ListQuery.TimeOp, parseInstant("end", s))).toSeq
    val req = ListQuery.Request(
      inFilters = inFilters,
      timeFilters = timeFilters,
      order = graft.operators.Keyset.Order.parse(
        q.get("order").flatMap(_.headOption).orNull),
      limit = parseLimit(q.get("limit").flatMap(_.headOption),
        cfg.defaultLimit, cfg.maxLimit),
      next = q.get("next").flatMap(_.headOption),
      prev = q.get("prev").flatMap(_.headOption))
    val page = ListQuery.list(df, req, "attempts", "attempt_time", "attempt_id")
    val out = nf.objectNode()
    val arr = out.putArray("models")
    val schema = df.schema
    page.rows.foreach(r => arr.add(rowToJson(r, schema)))
    page.next.foreach(out.put("next", _))
    page.prev.foreach(out.put("prev", _))
    sendJson(ex, 200, out)
  }

  private def getAttempt(cfg: Config, tenant: String, id: String,
                         ex: HttpExchange): Unit = {
    val df = attemptsOr404(cfg, ex).getOrElse(return)
    ListQuery.retrieve(df.filter(col("tenant_id") === tenant), "attempt_id", id) match {
      case Some(row) => sendJson(ex, 200, rowToJson(row, df.schema))
      case None => sendError(ex, 404, s"attempt not found: $id")
    }
  }

  /** Reference attempt dimension/filter allowlist
    * (`metrics_handlers.go:58-60`). */
  private val AttemptDims = Set("tenant_id", "destination_id",
    "destination_type", "topic", "status", "code", "manual", "attempt_number")

  /** `GET /api/v1/:tenant/metrics/attempts`: the attempt-measure matrix
    * over the denormalized log, tenant-scoped. */
  private def metricsAttempts(spark: SparkSession, cfg: Config,
                              q: Map[String, Seq[String]], tenant: String,
                              ex: HttpExchange): Unit = {
    val df0 = attemptsOr404(cfg, ex).getOrElse(return)
    val df = df0.filter(col("tenant_id") === tenant)
      .withColumn("ts", col("attempt_time"))
    val measures = q.getOrElse("measures[]", q.getOrElse("measures", Nil))
    require(measures.nonEmpty, "at least one measures[] is required")
    val dimensions = q.getOrElse("dimensions[]", q.getOrElse("dimensions", Nil))
    val granularity = Buckets.Granularity.parse(
      q.get("granularity").flatMap(_.headOption).getOrElse(
        throw new IllegalArgumentException("granularity is required")))
    val start = parseInstant("start", q.get("start").flatMap(_.headOption)
      .getOrElse(throw new IllegalArgumentException("start is required")))
    val end = parseInstant("end", q.get("end").flatMap(_.headOption)
      .getOrElse(throw new IllegalArgumentException("end is required")))
    val filters = AttemptDims.toSeq.sorted.flatMap { d =>
      val vs = q.getOrElse(s"$d[]", Nil)
      if (vs.isEmpty) None else Some(d -> vs)
    }.toMap
    val req = Metrics.Request(start, end, granularity, measures, dimensions,
      filters, rowLimit = parseLimit(q.get("limit").flatMap(_.headOption),
        cfg.defaultLimit, 100000))
    Metrics.validate(req, Metrics.attemptMeasures, AttemptDims)
    val res = Metrics.query(spark, df, req, Metrics.attemptMeasures)
    try {
      val rows = res.df.collect()
      val schema = res.df.schema
      val out = nf.objectNode()
      out.put("truncated", res.truncated)
      val arr = out.putArray("buckets")
      rows.foreach(r => arr.add(rowToJson(r, schema)))
      sendJson(ex, 200, out)
    } finally res.cleanup()
  }

  // --------------------------------------------------------------- retry --

  /** `POST /api/v1/retry` (reference `retry_handlers.go:47-131`): look up
    * the latest attempt for (event, destination) → 404 if none; verify
    * the destination exists (404), is enabled (400) and still matches the
    * event (400); then publish a MANUAL delivery task (attempt+1) into
    * the retry-task store the delivery query tails. */
  private def retryEvent(spark: SparkSession, cfg: Config,
                         ex: HttpExchange): Unit = {
    val (attempts, spool) = (cfg.attempts, cfg.retrySpool) match {
      case (Some(a), Some(s)) => (a(), s)
      case _ => sendError(ex, 404, "retry is not enabled"); return
    }
    val body = try mapper.readTree(ex.getRequestBody) catch { case _: Exception => null }
    if (body == null || !body.isObject) {
      sendError(ex, 422, "validation error: body must be a JSON object"); return
    }
    def strField(n: String): Option[String] =
      Option(body.get(n)).filter(_.isTextual).map(_.asText)
    val eventId = strField("event_id").getOrElse {
      sendError(ex, 422, "validation error: event_id is required"); return
    }
    val destId = strField("destination_id").getOrElse {
      sendError(ex, 422, "validation error: destination_id is required"); return
    }
    // single log query, newest attempt wins (retry_handlers.go:57-77)
    val last = attempts
      .filter(col("event_id") === eventId && col("destination_id") === destId)
      .orderBy(col("attempt_number").desc)
      .limit(1).collect().headOption.getOrElse {
        sendError(ex, 404, s"event not found: $eventId"); return
      }
    val tenant = last.getAs[String]("tenant_id")
    val dest = DestinationStore.retrieve(spark, cfg.destTable, tenant, destId,
      cfg.storeSecret).getOrElse {
        sendError(ex, 404, s"destination not found: $destId"); return
      }
    if (dest.disabled_at.isDefined) {
      sendError(ex, 400, "destination is disabled"); return
    }
    // destination.MatchEvent parity: topic glob ∧ JSON filter over the
    // same envelope shape the streaming fanout matches on
    val topic = last.getAs[String]("topic")
    val data = last.getAs[String]("data")
    val metadata = Option(last.getAs[scala.collection.Map[String, String]]("metadata"))
      .map(_.toMap).getOrElse(Map.empty[String, String])
    val eventTime = last.getAs[Timestamp]("event_time")
    val matches = graft.functions.TopicMatch.matches(dest.topics, topic) &&
      dest.filter_json.forall { f =>
        val env = nf.objectNode()
        env.put("id", eventId)
        env.put("topic", topic)
        env.put("time", java.time.format.DateTimeFormatter
          .ofPattern("yyyy-MM-dd'T'HH:mm:ss'Z'").withZone(java.time.ZoneOffset.UTC)
          .format(eventTime.toInstant))
        val m = env.putObject("metadata")
        metadata.foreach { case (k, v) => m.put(k, v) }
        env.set[ObjectNode]("data", mapper.readTree(data))
        graft.functions.JsonMatch.matches(f, env.toString)
      }
    if (!matches) {
      sendError(ex, 400, "destination does not match event"); return
    }
    val attemptNumber = last.getAs[Int]("attempt_number") + 1
    graft.streaming.Runner.publishManualTask(spark,
      graft.streaming.Model.DeliveryTask(eventId, tenant, destId,
        attemptNumber, manual = true, eventTime, topic, data, metadata),
      spool)
    val out = nf.objectNode()
    out.put("event_id", eventId)
    out.put("destination_id", destId)
    out.put("attempt", attemptNumber)
    sendJson(ex, 202, out)
  }

  // ------------------------------------------------------------- plumbing --

  private def parseInstant(name: String, s: String): Instant =
    try Instant.parse(s)
    catch {
      case _: Exception =>
        s.toLongOption.map(Instant.ofEpochMilli).getOrElse(
          throw new IllegalArgumentException(s"bad $name timestamp: $s"))
    }

  private[api] def parseQuery(raw: String): Map[String, Seq[String]] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(dec(k) -> dec(v))
        case Array(k) => Some(dec(k) -> "")
        case _ => None
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** Generic Row → JSON on the DataFrame schema (timestamps as ISO-8601
    * UTC, maps/arrays structurally). */
  private[api] def rowToJson(row: Row, schema: StructType): ObjectNode = {
    val o = nf.objectNode()
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) o.putNull(f.name)
      else f.dataType match {
        case StringType => o.put(f.name, row.getString(i))
        case LongType => o.put(f.name, row.getLong(i))
        case IntegerType => o.put(f.name, row.getInt(i))
        case DoubleType => o.put(f.name, row.getDouble(i))
        case FloatType => o.put(f.name, row.getFloat(i))
        case BooleanType => o.put(f.name, row.getBoolean(i))
        case TimestampType =>
          o.put(f.name, row.getTimestamp(i).toInstant.toString)
        case _: MapType =>
          val m = o.putObject(f.name)
          row.getMap[Any, Any](i).foreach { case (k, v) =>
            m.put(String.valueOf(k), String.valueOf(v)) }
        case _: ArrayType =>
          val a = o.putArray(f.name)
          row.getSeq[Any](i).foreach(v => a.add(String.valueOf(v)))
        case _ => o.put(f.name, String.valueOf(row.get(i)))
      }
    }
    o
  }

  private def destToJson(r: DestinationStore.DestinationRecord): ObjectNode = {
    val o = nf.objectNode()
    o.put("tenant_id", r.tenant_id)
    o.put("destination_id", r.destination_id)
    o.put("type", r.dest_type)
    val t = o.putArray("topics")
    r.topics.foreach(t.add)
    r.filter_json.foreach(f => o.set[ObjectNode]("filter", mapper.readTree(f)))
    def putMap(name: String, m: Map[String, String]): Unit = {
      val n = o.putObject(name)
      m.foreach { case (k, v) => n.put(k, v) }
    }
    putMap("config", r.config)
    putMap("credentials", r.credentials)
    putMap("delivery_metadata", r.delivery_metadata)
    putMap("metadata", r.metadata)
    o.put("created_at", r.created_at.toInstant.toString)
    o.put("updated_at", r.updated_at.toInstant.toString)
    r.disabled_at.foreach(d => o.put("disabled_at", d.toInstant.toString))
    o
  }

  private def sendJson(ex: HttpExchange, code: Int,
                       node: com.fasterxml.jackson.databind.JsonNode): Unit = {
    val bytes = mapper.writeValueAsBytes(node)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def sendError(ex: HttpExchange, code: Int, msg: String): Unit =
    sendJson(ex, code, nf.objectNode().put("error", msg))

  /** 422 with the per-field detail list (reference
    * `errorhandler_middleware.go:70-79`: StatusUnprocessableEntity,
    * message "validation error", data = the formatted details). */
  private def sendValidationError(
      ex: HttpExchange,
      errs: Seq[DestMetadata.ValidationError]): Unit = {
    val o = nf.objectNode().put("error", "validation error")
    val arr = o.putArray("data")
    errs.foreach(e =>
      arr.add(nf.objectNode().put("field", e.field).put("type", e.errType)))
    sendJson(ex, 422, o)
  }

  /** Run the provider field-schema validation for a destination about to
    * be written; true = valid, false = a 422 was already sent. */
  private def validateDestOr422(
      ex: HttpExchange, tpe: String, config: Map[String, String],
      credentials: Map[String, String]): Boolean = {
    val errs = DestMetadata.validate(tpe, config, credentials)
    if (errs.nonEmpty) sendValidationError(ex, errs)
    errs.isEmpty
  }
}
