package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PER-EVENT TRACE STREAM (reference `internal/eventtracer/
  * eventtracer.go:40-100` — Receive / StartDelivery / Deliver spans with
  * trace/span ids stamped on the event and task): one span row per stage
  * transition — receive → match → deliver → log — written to an
  * opevents-style commit-log table so a debugging user can follow one
  * event through the pipeline with `GET /events/{id}/trace`.
  *
  * Spark-first differences from the OTel tracer, both deliberate:
  *   - ids are DETERMINISTIC (md5 of stage + natural keys) instead of
  *     random: micro-batch replays re-emit the SAME span rows, and the
  *     trace table's span_id dedup makes re-emission a no-op — the same
  *     effectively-once contract every other log consumer here follows.
  *     Random OTel ids would duplicate spans on every replayed epoch.
  *   - span timestamps are the CARRIED stage stamps (event_time,
  *     attempt_time, logged_at), not wall-clock-at-emission: the trace
  *     reads identically no matter when the batch that wrote it ran.
  *
  * Scale shape: every builder is a pure column projection of a frame the
  * pipeline already materializes (zero extra joins or shuffles — the
  * append's month repartition is the only exchange), and the serving
  * read is a manifest-bloom point lookup on event_id
  * ([[graft.operators.CommitLog.scanForKey]] — files carry event_id
  * blooms even though rows dedup by span_id). */
object EventTrace {

  private def traceId = md5(col("event_id"))

  private val spanCols = Seq("event_id", "tenant_id", "trace_id", "span_id",
    "parent_span_id", "stage", "stage_seq", "destination_id", "attempt",
    "status", "at")

  private def spanId(stage: String, parts: org.apache.spark.sql.Column*) =
    md5(concat_ws(":", (lit(stage) +: parts): _*))

  /** Stage 0 — publish accepted (reference `Receive`): one span per
    * event; `at` = the event's publish time. Input: any frame with
    * event_id, tenant_id, event_time (the ingest output). */
  def receiveSpans(events: DataFrame): DataFrame =
    events.select(
      col("event_id"), col("tenant_id"),
      traceId.as("trace_id"),
      spanId("receive", col("event_id")).as("span_id"),
      lit(null).cast("string").as("parent_span_id"),
      lit("receive").as("stage"), lit(0).as("stage_seq"),
      lit(null).cast("string").as("destination_id"),
      lit(null).cast("int").as("attempt"),
      lit("ok").as("status"),
      col("event_time").as("at"))

  /** Stage 1 — destination matched (one span per fanout edge, parent =
    * the receive span). Input: [[Pipeline.matchFanout]] output. */
  def matchSpans(fanout: DataFrame): DataFrame =
    fanout.select(
      col("event_id"), col("tenant_id"),
      traceId.as("trace_id"),
      spanId("match", col("event_id"), col("destination_id")).as("span_id"),
      spanId("receive", col("event_id")).as("parent_span_id"),
      lit("match").as("stage"), lit(1).as("stage_seq"),
      col("destination_id"),
      lit(null).cast("int").as("attempt"),
      lit("ok").as("status"),
      col("event_time").as("at"))

  /** Stage 2 — delivery attempted (reference `Deliver` +
    * `RecordDeliveryResult`): one span per attempt, status carried from
    * the attempt outcome, parent = the match span. Input: attempt rows
    * (attempt_number, status, attempt_time). */
  def deliverSpans(attempts: DataFrame): DataFrame =
    attempts.select(
      col("event_id"), col("tenant_id"),
      traceId.as("trace_id"),
      spanId("deliver", col("event_id"), col("destination_id"),
        col("attempt_number")).as("span_id"),
      spanId("match", col("event_id"), col("destination_id"))
        .as("parent_span_id"),
      lit("deliver").as("stage"), lit(2).as("stage_seq"),
      col("destination_id"),
      col("attempt_number").cast("int").as("attempt"),
      col("status"),
      col("attempt_time").as("at"))

  /** Stage 3 — attempt durably logged: one span per logged attempt row,
    * parent = its deliver span. Input: the log-sink batch (carries
    * logged_at). */
  def logSpans(logged: DataFrame): DataFrame =
    logged.select(
      col("event_id"), col("tenant_id"),
      traceId.as("trace_id"),
      spanId("log", col("event_id"), col("destination_id"),
        col("attempt_number")).as("span_id"),
      spanId("deliver", col("event_id"), col("destination_id"),
        col("attempt_number")).as("parent_span_id"),
      lit("log").as("stage"), lit(3).as("stage_seq"),
      col("destination_id"),
      col("attempt_number").cast("int").as("attempt"),
      lit("ok").as("status"),
      col("logged_at").as("at"))

  /** Append span rows to the trace table: in-batch dedup by span_id,
    * token idempotency per epoch (a replayed foreachBatch epoch carries
    * the same token and no-ops the commit). A re-emission under a NEW
    * token lands duplicate physical rows — the deterministic ids make
    * them EXACT duplicates, so read-side dedup hides them and month
    * compaction removes them permanently: the same
    * effectively-once-with-read-repair contract as the attempts log
    * (S4/O5). Manifest blooms go on event_id so the serving read prunes
    * files driver-side. */
  def append(spans: DataFrame, table: String,
             token: Option[String] = None): Long =
    graft.operators.CommitLog.append(
      spans.select(spanCols.map(col): _*), table,
      idCol = "span_id", tsCol = "at", token = token,
      keyBlooms = true, bloomCol = Some("event_id"))

  /** Compact one month of the trace table: dedups by span_id (making
    * the read repair permanent — re-emitted duplicate rows vanish from
    * the raw scan) while rebuilding the manifest blooms over EVENT_ID,
    * the probe column — compacting with the default id-column blooms
    * would wrongly prune every `GET /events/{id}/trace`. */
  def compact(spark: SparkSession, table: String, month: String): Unit =
    graft.operators.CommitLog.compactMonth(spark, table, month,
      idCol = "span_id", tsCol = "at", bloomCol = Some("event_id"))

  /** One event's trace, pipeline order (the `GET /events/{id}/trace`
    * read): manifest-bloom file pruning, then stage order with the
    * carried stamps as tie-breaks. */
  def forEvent(spark: SparkSession, table: String, eventId: String): DataFrame =
    graft.operators.CommitLog.scanForKey(spark, table, "event_id", eventId)
      .select(spanCols.map(col): _*)
      .dropDuplicates("span_id") // read repair (see append)
      .orderBy(col("stage_seq"), col("at"), col("span_id"))

  /** OTLP/JSON export of one event's spans (the shape a standard OTel
    * collector ingests: resourceSpans → scopeSpans → spans with hex ids
    * and unix-nano timestamps — the published OTLP JSON encoding;
    * reference surface `internal/otel/`). Field mapping:
    *   - traceId = the md5 trace id (16 bytes = 32 hex, exact fit);
    *   - spanId/parentSpanId = the md5 span ids TRUNCATED to 8 bytes
    *     (OTLP span ids are 64-bit) — deterministic, so parent links
    *     stay consistent across spans;
    *   - start == end = the carried stage stamp in nanos (spans here
    *     are point events: each records a stage TRANSITION, not an
    *     interval);
    *   - status: failed attempts export STATUS_CODE_ERROR (2), all
    *     else STATUS_CODE_OK (1); stage/destination/attempt ride as
    *     attributes. */
  def otlpJson(spans: Seq[org.apache.spark.sql.Row]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val rs = root.putArray("resourceSpans").addObject()
    val attrs = rs.putObject("resource").putArray("attributes")
    val svc = attrs.addObject()
    svc.put("key", "service.name")
    svc.putObject("value").put("stringValue", "graft")
    val ss = rs.putArray("scopeSpans").addObject()
    ss.putObject("scope").put("name", "graft.eventtrace")
    val arr = ss.putArray("spans")
    spans.foreach { r =>
      def s(c: String): String = r.getAs[String](c)
      val o = arr.addObject()
      o.put("traceId", s("trace_id"))
      o.put("spanId", s("span_id").take(16))
      Option(s("parent_span_id")).foreach(p =>
        o.put("parentSpanId", p.take(16)))
      o.put("name", s("stage"))
      o.put("kind", 1) // SPAN_KIND_INTERNAL
      val nanos = r.getAs[java.sql.Timestamp]("at").getTime * 1000000L
      // OTLP JSON encodes uint64 nanos as STRINGS (proto3 JSON mapping)
      o.put("startTimeUnixNano", nanos.toString)
      o.put("endTimeUnixNano", nanos.toString)
      val oa = o.putArray("attributes")
      def attr(k: String, v: String): Unit = if (v != null) {
        val a = oa.addObject()
        a.put("key", k)
        a.putObject("value").put("stringValue", v)
        ()
      }
      attr("graft.event_id", s("event_id"))
      attr("graft.tenant_id", s("tenant_id"))
      attr("graft.destination_id", s("destination_id"))
      if (!r.isNullAt(r.fieldIndex("attempt"))) {
        val a = oa.addObject()
        a.put("key", "graft.attempt")
        a.putObject("value").put("intValue",
          r.getAs[Int]("attempt").toString)
        ()
      }
      val code = if (s("status") == "failed") 2 else 1
      o.putObject("status").put("code", code)
      ()
    }
    mapper.writeValueAsString(root)
  }
}
