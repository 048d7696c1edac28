package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Oracled gates for the round-10 surface: the per-event trace span
  * builders (streaming/EventTrace.scala — deterministic md5 ids over
  * carried stamps, so DuckDB replays them exactly) and the data-quality
  * suite's failure-row readouts (operators/Quality.scala). */
object TraceQualityOps {

  def defs: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(

    // receive + match spans over the events table: every id is a pure
    // md5 of stage + natural keys, every stamp is the carried event
    // time — the whole trace layer is DuckDB-replayable, which is the
    // point of the deterministic-id design (random OTel ids could never
    // be oracled). Synthetic fanout: event → destination d(event_id%3).
    "trace_spans" -> ((s, dir) => {
      val ev0 = Tables.events(s, dir)
      val ev = ev0.select(
        col("event_id").cast("string").as("event_id"),
        concat(lit("t"), pmod(col("user_id"), lit(10))).as("tenant_id"),
        col("ts").as("event_time"))
      val fan = ev0.select(
        col("event_id").cast("string").as("event_id"),
        concat(lit("t"), pmod(col("user_id"), lit(10))).as("tenant_id"),
        col("ts").as("event_time"),
        concat(lit("d"), pmod(col("event_id"), lit(3))).as("destination_id"))
      graft.streaming.EventTrace.receiveSpans(ev)
        .unionByName(graft.streaming.EventTrace.matchSpans(fan))
        .select(col("event_id"), col("tenant_id"), col("trace_id"),
          col("span_id"), col("parent_span_id"), col("stage"),
          col("stage_seq"), col("destination_id"), col("status"),
          unix_millis(col("at")).as("at_ms"))
        .orderBy(col("stage_seq"), col("event_id"), col("destination_id"))
    }),

    // the FULL four-stage chain (receive → match → deliver → log) with
    // synthetic attempts: status branches on the event's value sign,
    // stage stamps advance by fixed intervals — every id, parent link
    // and stamp is a pure function DuckDB replays, so the whole trace
    // pipeline (not just the first two builders) is hash-gated
    "trace_full_chain" -> ((s, dir) => {
      val ev0 = Tables.events(s, dir)
      val base = ev0.select(
        col("event_id").cast("string").as("event_id"),
        concat(lit("t"), pmod(col("user_id"), lit(10))).as("tenant_id"),
        col("ts").as("event_time"),
        concat(lit("d"), pmod(col("event_id"), lit(3))).as("destination_id"),
        col("value"))
      val attempts = base.select(col("event_id"), col("tenant_id"),
        col("destination_id"), lit(1).as("attempt_number"),
        when(col("value") >= 0.0, lit("success")).otherwise(lit("failed"))
          .as("status"),
        (col("event_time") + expr("INTERVAL 2 SECONDS")).as("attempt_time"))
      val logged = attempts.withColumn("logged_at",
        col("attempt_time") + expr("INTERVAL 1 SECOND"))
      graft.streaming.EventTrace.deliverSpans(attempts)
        .unionByName(graft.streaming.EventTrace.logSpans(logged))
        .select(col("event_id"), col("trace_id"), col("span_id"),
          col("parent_span_id"), col("stage"), col("stage_seq"),
          col("destination_id"), col("attempt"), col("status"),
          unix_millis(col("at")).as("at_ms"))
        .orderBy(col("stage_seq"), col("event_id"))
    }),

    // failure-row readout of the quality suite (the debugging half):
    // lineitem rows violating a user range constraint, via the operator
    // API — not a hand-written filter
    "quality_failure_rows" -> ((s, dir) => {
      import graft.operators.Quality
      Quality.failureRows(Tables.lineitem(s, dir),
          Quality.InRange("disc", "l_discount", 0.0, 0.06))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_discount") * 100.0, 0).cast("long").as("disc_pct"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // group-cardinality failures: every row of each oversized group
    // (orders with more than 7 line items), via Quality.failureRows
    "quality_group_failures" -> ((s, dir) => {
      import graft.operators.Quality
      Quality.failureRows(Tables.lineitem(s, dir),
          Quality.MaxPerGroup("fat", Seq("l_orderkey"), 7L))
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }))

  def oracles: Map[String, String] = Map(
    "trace_spans" ->
      """WITH ev AS (
        |  SELECT CAST(event_id AS VARCHAR) AS eid,
        |    't' || CAST(user_id % 10 AS VARCHAR) AS ten,
        |    epoch_ms(ts::TIMESTAMP) AS at_ms,
        |    'd' || CAST(event_id % 3 AS VARCHAR) AS did
        |  FROM events)
        |SELECT eid AS event_id, ten AS tenant_id, md5(eid) AS trace_id,
        |  md5('receive:' || eid) AS span_id,
        |  CAST(NULL AS VARCHAR) AS parent_span_id,
        |  'receive' AS stage, 0 AS stage_seq,
        |  CAST(NULL AS VARCHAR) AS destination_id, 'ok' AS status, at_ms
        |FROM ev
        |UNION ALL
        |SELECT eid, ten, md5(eid),
        |  md5('match:' || eid || ':' || did),
        |  md5('receive:' || eid), 'match', 1, did, 'ok', at_ms
        |FROM ev
        |ORDER BY stage_seq, event_id, destination_id""".stripMargin,
    "trace_full_chain" ->
      """WITH ev AS (
        |  SELECT CAST(event_id AS VARCHAR) AS eid,
        |    'd' || CAST(event_id % 3 AS VARCHAR) AS did,
        |    CASE WHEN value >= 0.0 THEN 'success' ELSE 'failed' END AS st,
        |    epoch_ms(ts::TIMESTAMP) AS t0
        |  FROM events)
        |SELECT eid AS event_id, md5(eid) AS trace_id,
        |  md5('deliver:' || eid || ':' || did || ':1') AS span_id,
        |  md5('match:' || eid || ':' || did) AS parent_span_id,
        |  'deliver' AS stage, 2 AS stage_seq, did AS destination_id,
        |  1 AS attempt, st AS status, t0 + 2000 AS at_ms
        |FROM ev
        |UNION ALL
        |SELECT eid, md5(eid),
        |  md5('log:' || eid || ':' || did || ':1'),
        |  md5('deliver:' || eid || ':' || did || ':1'),
        |  'log', 3, did, 1, 'ok', t0 + 3000
        |FROM ev
        |ORDER BY stage_seq, event_id""".stripMargin,
    "quality_failure_rows" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(round(l_discount * 100.0) AS BIGINT) AS disc_pct
        |FROM lineitem
        |WHERE l_discount < 0.0 OR l_discount > 0.06
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "quality_group_failures" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY 1 HAVING count(*) > 7)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
