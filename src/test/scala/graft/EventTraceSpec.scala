package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.streaming.EventTrace
import org.apache.spark.sql.functions._

/** The per-event trace stream (streaming/EventTrace.scala): span counts,
  * ordering and parent chains for a known workload; deterministic-id
  * replay idempotency; and the `GET /events/{id}/trace` serving path. */
class EventTraceSpec extends GraftSuite {

  private def ts(s: Int) = new java.sql.Timestamp(s * 1000L)

  test("known workload: exact span counts, pipeline ordering, parent " +
      "chain; replayed emission adds nothing") {
    val spark2 = spark
    import spark2.implicits._
    val table = java.nio.file.Files
      .createTempDirectory("graft_trace").toString + "/traces"

    // e1 fans out to d1+d2 (d2 fails then gets logged too); e2 → d1 only
    val events = Seq(
      ("e1", "t1", ts(10)), ("e2", "t1", ts(11)))
      .toDF("event_id", "tenant_id", "event_time")
    val fanout = Seq(
      ("e1", "t1", "d1", ts(10)), ("e1", "t1", "d2", ts(10)),
      ("e2", "t1", "d1", ts(11)))
      .toDF("event_id", "tenant_id", "destination_id", "event_time")
    val attempts = Seq(
      ("e1", "t1", "d1", 1, "success", ts(12)),
      ("e1", "t1", "d2", 1, "failed", ts(13)),
      ("e2", "t1", "d1", 1, "success", ts(12)))
      .toDF("event_id", "tenant_id", "destination_id", "attempt_number",
        "status", "attempt_time")
    val logged = attempts.withColumn("logged_at",
      col("attempt_time") + expr("INTERVAL 1 SECOND"))

    EventTrace.append(EventTrace.receiveSpans(events), table, Some("r1"))
    EventTrace.append(EventTrace.matchSpans(fanout), table, Some("m1"))
    EventTrace.append(EventTrace.deliverSpans(attempts), table, Some("d1"))
    EventTrace.append(EventTrace.logSpans(logged), table, Some("l1"))

    val t1 = EventTrace.forEvent(spark, table, "e1").collect()
    assert(t1.length == 7, s"expected 1+2+2+2 spans, got ${t1.length}")
    assert(t1.map(_.getAs[String]("stage")).toSeq ==
      Seq("receive", "match", "match", "deliver", "deliver", "log", "log"))
    // timestamps are the carried stage stamps, monotone through the chain
    val at = t1.map(_.getAs[java.sql.Timestamp]("at").getTime)
    assert(at.zip(at.tail).forall { case (a, b) => a <= b })
    // parent chain: match → receive; deliver(d2) → match(d2); log → deliver
    val byId = t1.map(r => r.getAs[String]("span_id") -> r).toMap
    val receive = t1.head
    t1.filter(_.getAs[String]("stage") == "match").foreach { m =>
      assert(m.getAs[String]("parent_span_id") == receive.getAs[String]("span_id"))
    }
    t1.filter(_.getAs[String]("stage") == "deliver").foreach { d =>
      val p = byId(d.getAs[String]("parent_span_id"))
      assert(p.getAs[String]("stage") == "match" &&
        p.getAs[String]("destination_id") == d.getAs[String]("destination_id"))
    }
    t1.filter(_.getAs[String]("stage") == "log").foreach { l =>
      val p = byId(l.getAs[String]("parent_span_id"))
      assert(p.getAs[String]("stage") == "deliver" &&
        p.getAs[String]("destination_id") == l.getAs[String]("destination_id"))
    }
    // the failed attempt's status rides its deliver span
    assert(t1.exists(r => r.getAs[String]("stage") == "deliver" &&
      r.getAs[String]("destination_id") == "d2" &&
      r.getAs[String]("status") == "failed"))
    // one trace id across every span of the event
    assert(t1.map(_.getAs[String]("trace_id")).distinct.length == 1)

    // replayed epoch (same spans, new token): deterministic span ids
    // dedup — nothing added
    EventTrace.append(EventTrace.matchSpans(fanout), table, Some("m2"))
    assert(EventTrace.forEvent(spark, table, "e1").count() == 7)
    // token replay: no-op commit
    val v = graft.operators.CommitLog.snapshot(table).version
    EventTrace.append(EventTrace.logSpans(logged), table, Some("l1"))
    assert(graft.operators.CommitLog.snapshot(table).version == v)

    assert(EventTrace.forEvent(spark, table, "e2").count() == 4)

    // compaction makes the read repair PERMANENT: the re-emitted
    // duplicates exist physically until the month compacts...
    // (a scan's file listing freezes at creation — build each frame fresh)
    def rawE1() = graft.operators.CommitLog.scan(spark, table)
      .filter(col("event_id") === "e1").count()
    assert(rawE1() > 7, "expected physical duplicates pre-compaction")
    EventTrace.compact(spark, table, "1970-01")
    assert(rawE1() == 7, "compaction left duplicate span rows")
    // ...and the rebuilt blooms index EVENT_ID (bloomCol), so the point
    // lookup still prunes correctly instead of losing rows to blooms
    // built over the dedup id
    assert(EventTrace.forEvent(spark, table, "e1").count() == 7)
    val (surv, total) = graft.operators.CommitLog.filesForKey(table, "no-such")
    assert(surv.size < total, "miss probe should prune compacted files")

    // GET /events/{id}/trace serves the same view over HTTP
    val base = java.nio.file.Files.createTempDirectory("graft_trace_api").toString
    val server = graft.api.HttpApi.start(spark, graft.api.HttpApi.Config(
      events = events.withColumnRenamed("event_time", "ts"),
      destTable = s"$base/destinations",
      storeSecret = "s",
      traceTable = Some(table)))
    try {
      val client = HttpClient.newHttpClient()
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      def get(path: String) = {
        val r = client.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${server.port}$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        (r.statusCode(), mapper.readTree(r.body()))
      }
      val (c1, body) = get("/api/v1/t1/events/e1/trace")
      assert(c1 == 200 && body.get("spans").size == 7, body)
      assert(body.get("event_id").asText == "e1")
      assert(body.get("spans").get(0).get("stage").asText == "receive")
      assert(body.get("spans").get(6).get("stage").asText == "log")
      assert(get("/api/v1/t1/events/nope/trace")._1 == 404)

      // ?format=otlp — the OTLP/JSON encoding a collector ingests:
      // resourceSpans → scopeSpans → spans, hex ids (32/16), string
      // unix-nano stamps, proto status codes
      val (c2, otlp) = get("/api/v1/t1/events/e1/trace?format=otlp")
      assert(c2 == 200, otlp)
      val rs = otlp.get("resourceSpans")
      assert(rs != null && rs.size == 1, otlp)
      val resAttrs = rs.get(0).get("resource").get("attributes")
      assert(resAttrs.get(0).get("key").asText == "service.name")
      assert(resAttrs.get(0).get("value").get("stringValue").asText == "graft")
      val scope = rs.get(0).get("scopeSpans").get(0)
      assert(scope.get("scope").get("name").asText == "graft.eventtrace")
      val spans = scope.get("spans")
      assert(spans.size == 7, otlp)
      val hex32 = "[0-9a-f]{32}".r
      val hex16 = "[0-9a-f]{16}".r
      val byId = (0 until spans.size).map(spans.get)
        .map(s => s.get("spanId").asText -> s).toMap
      (0 until spans.size).map(spans.get).foreach { s =>
        assert(hex32.matches(s.get("traceId").asText), s)
        assert(hex16.matches(s.get("spanId").asText), s)
        assert(s.get("kind").asInt == 1)
        // unix-nano as STRING (proto3 JSON uint64 mapping), ms-exact
        val nanos = s.get("startTimeUnixNano").asText
        assert(nanos.toLong % 1000000L == 0L && nanos.toLong > 0L)
        assert(s.get("endTimeUnixNano").asText == nanos)
        // parent links survive the 8-byte truncation: every non-root
        // parentSpanId resolves to another span in the trace
        Option(s.get("parentSpanId")).foreach { p =>
          assert(byId.contains(p.asText), s"dangling parent $p")
        }
      }
      // the failed d2 attempt exports STATUS_CODE_ERROR; successes OK
      val statuses = (0 until spans.size).map(spans.get)
        .map(s => (s.get("name").asText,
          s.get("status").get("code").asInt))
      assert(statuses.count(_ == ("deliver", 2)) == 1, statuses)
      assert(statuses.count(s => s._1 == "deliver" && s._2 == 1) == 1)
      assert(statuses.count(_._2 == 1) == 6)
      // attributes carry the graft identifiers
      val first = spans.get(0)
      val attrKeys = (0 until first.get("attributes").size)
        .map(i => first.get("attributes").get(i).get("key").asText).toSet
      assert(attrKeys.contains("graft.event_id"))
      assert(attrKeys.contains("graft.tenant_id"))
    } finally server.stop()
  }
}
