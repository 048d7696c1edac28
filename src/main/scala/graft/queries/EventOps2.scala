package graft.queries

import graft.core.Tables
import graft.operators.{CommitLog, Logstore, TemporalJoins}
import graft.plans.JsonMatchExpr
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal-join, Catalyst-extension and storage-roundtrip gate queries. */
object EventOps2 {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // native json_match Expression inside WholeStageCodegen (real doGenCode,
    // one Jackson parse per row — the measured-fastest form).
    "json_filter_native" -> ((s, dir) => {
      JsonMatchExpr.register(s)
      Tables.events(s, dir)
        .filter(expr("""json_match('{"k":{"$lt":30}}', props)"""))
        .select(col("event_id"), col("user_id"),
          get_json_object(col("props"), "$.k").cast("double").as("k"))
        .orderBy(col("event_id"))
    }),

    // $or schema: exercises the evaluator's disjunction walk end-to-end.
    "json_filter_complex" -> ((s, dir) => {
      JsonMatchExpr.register(s)
      Tables.events(s, dir)
        .filter(expr("""json_match('{"$or":[{"k":{"$gte":90}},{"k":{"$lte":5}}]}', props)"""))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    // as-of join: for each purchase, the most recent click by the same user
    // at or before it (union + single window pass — one shuffle on user_id).
    "asof_click_before_purchase" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("click_id"))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("asof_click_id").as("prior_click_id"),
          unix_millis(col("asof_ts")).as("prior_click_ms"))
        .orderBy(col("event_id"))
    }),

    // bounded range join: same-user event pairs within 60 s (bucketed
    // equi-join — no theta-join explosion).
    "range_join_60s" -> ((s, dir) => {
      TemporalJoins.rangeJoinPairs(Tables.events(s, dir),
          keyCol = "user_id", tsCol = "ts", idCol = "event_id",
          windowMillis = 60000L)
        .select(col("k").as("user_id"), col("id_a"), col("id_b"), col("gap_ms"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // storage roundtrip: events → month-partitioned sorted store → pruned
    // scan + aggregate. Exercises the S4 write path inside the gate; the
    // oracle reads the original table, so the roundtrip must be lossless.
    "logstore_roundtrip" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_store").toString
      Logstore.insertMany(Tables.events(s, dir)
          .select("event_id", "ts", "user_id", "event_type", "value"),
        path, idCol = "event_id", tsCol = "ts")
      Logstore.scan(s, path)
        .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // the commit-log table format end to end: the SAME batch appended twice
    // (at-least-once ingest), compacted per month (concurrent-writer-safe
    // path), then manifest-planned scan — the aggregate must equal the
    // source exactly (dups gone, nothing lost, nothing resurrected).
    "logstore_commitlog" -> ((s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft_cltx").toString
      val batch = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      CommitLog.append(batch, table, idCol = "event_id", tsCol = "ts")
      CommitLog.append(batch, table, idCol = "event_id", tsCol = "ts") // replay
      CommitLog.snapshot(table).files.map(_.month).distinct.foreach(m =>
        CommitLog.compactMonth(s, table, m, idCol = "event_id", tsCol = "ts"))
      CommitLog.scan(s, table)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    })
  )

  def oracles: Map[String, String] = Map(
    "json_filter_native" ->
      """SELECT event_id, user_id, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) < 30
        |ORDER BY event_id""".stripMargin,
    "json_filter_complex" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 90
        |   OR CAST(json_extract_string(props, '$.k') AS DOUBLE) <= 5
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "asof_click_before_purchase" ->
      """SELECT p.event_id, p.user_id, epoch_ms(p.ts::TIMESTAMP) AS ts_ms,
        |  c.click_id AS prior_click_id, epoch_ms(c.ts::TIMESTAMP) AS prior_click_ms
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type='click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "range_join_60s" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_ms(b.ts::TIMESTAMP) - epoch_ms(a.ts::TIMESTAMP) AS gap_ms
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND epoch_ms(b.ts::TIMESTAMP) > epoch_ms(a.ts::TIMESTAMP)
        |  AND epoch_ms(b.ts::TIMESTAMP) <= epoch_ms(a.ts::TIMESTAMP) + 60000
        |ORDER BY id_a, id_b""".stripMargin,
    "logstore_roundtrip" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-08' AND ts::TIMESTAMP < TIMESTAMP '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "logstore_commitlog" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
