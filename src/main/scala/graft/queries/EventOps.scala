package graft.queries

import graft.core.Tables
import graft.functions.{JsonMatch, TopicMatch}
import graft.operators.Keyset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-log query operators over the driver `events` table
  * (event_id, ts, user_id, event_type, value, props).
  *
  * Cover SURVEY §2: P1 conjunctive IN+time filters, P3 time bounds, P4 topic
  * glob, P6 JSON filter, O1/O2 keyset pagination, O6 latest-per-key, and the
  * batch renderings of the alerting semantics (T6 consecutive failures) and
  * retry scheduling (T5 backoff) as window/gaps-and-islands plans.
  *
  * Timestamps are emitted as epoch-millis BIGINT (`ts_ms`) — both engines
  * truncate ns→ms identically, so hashes line up.
  */
object EventOps {

  private def events(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P3: IN-list + inclusive/exclusive time range, pushdown-friendly
    // (range goes through ts_ns so it reaches the parquet scan).
    "filter_in_time_range" -> ((s, dir) => {
      events(s, dir)
        .filter(col("event_type").isin("purchase", "signup") &&
          Tables.tsRangeNs(java.time.Instant.parse("2024-01-10T00:00:00Z"),
            java.time.Instant.parse("2024-01-20T00:00:00Z")) &&
          col("value") > 100.0)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    // P4: `*`-glob topic patterns compiled to codegen'd rlike (no UDF).
    "topic_glob_match" -> ((s, dir) => {
      events(s, dir)
        .filter(TopicMatch.matchesExpr(col("event_type"), Seq("pur*", "*gnup")))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // P6: JSON filter + projection through ONE parse per row:
    // json_match_project returns (empty | singleton) array<struct>, so the
    // explode both filters non-matching rows and carries the extracted
    // field — the previous filter(json_match) + get_json_object pair
    // parsed props twice (VERDICT r5 #3).
    "json_filter_gte" -> ((s, dir) => {
      graft.plans.JsonMatchExpr.register(s)
      events(s, dir)
        .select(col("event_id"), col("user_id"),
          explode(call_function("json_match_project",
            lit("""{"k":{"$gte":50}}"""), col("props"), lit("k"))).as("m"))
        .select(col("event_id"), col("user_id"),
          col("m.k").cast("double").as("k"))
        // total order without orderBy's range-sampling pass: a global sort
        // EXECUTES THE CHILD TWICE (once to sample range bounds); the
        // match+explode is the expensive side and the output is ~5% of
        // input, so shuffle the small result to one partition and sort
        // there — identical ordering, single child execution
        .repartition(1).sortWithinPartitions("event_id")
    }),

    // O6/J3: latest event per user — window top-1.
    "latest_event_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("event_type"))
        .orderBy(col("user_id"))
    }),

    // O1/O2: keyset pagination — two page-walk steps fused into one plan:
    // page 2 of size 50 ordered by (ts, event_id) asc. The Spark side walks
    // through the real cursor machinery (n+1 probe → cursor → seek
    // predicate); the seek predicate is what makes this O(page) at 100 TB
    // (time bound prunes partitions) instead of OFFSET's O(skip).
    "keyset_page2" -> ((s, dir) => {
      val df = events(s, dir)
      val p1 = Keyset.page(df, "evt", "ts", "event_id", Keyset.Asc, 50)
      val p2 = Keyset.page(df, "evt", "ts", "event_id", Keyset.Asc, 50, next = p1.next)
      import s.implicits._
      p2.rows.map(r => (r.getAs[Long]("event_id"),
          r.getAs[java.sql.Timestamp]("ts").getTime,
          r.getAs[String]("event_type")))
        .toDF("event_id", "ts_ms", "event_type")
    }),

    // A3/A4: conditional counts + ratio per user (alert-style error rates).
    "error_rate_by_user" -> ((s, dir) => {
      events(s, dir).groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          count(when(col("event_type") === "error", 1)).as("n_errors"),
          (count(when(col("event_type") === "error", 1)).cast("double") /
            count(lit(1)).cast("double")).as("error_rate"))
        .orderBy(col("user_id"))
    }),

    // T6 as batch: longest consecutive-error streak per user
    // (gaps-and-islands via two row_numbers — all window ops, no state).
    "consecutive_error_streaks" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val byUserErr = Window.partitionBy(col("user_id"), col("is_err"))
        .orderBy(col("ts"), col("event_id"))
      events(s, dir)
        .withColumn("is_err", (col("event_type") === "error").cast("int"))
        .withColumn("grp", row_number().over(byUser) - row_number().over(byUserErr))
        .filter(col("is_err") === 1)
        .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("streak"))
        .groupBy(col("user_id")).agg(max(col("streak")).as("max_error_streak"))
        .orderBy(col("user_id"))
    }),

    // T5 as batch: exponential-backoff retry schedule for each error event —
    // attempt_number = per-user error sequence, next_retry = ts + 30s·2^(n-1),
    // capped at 10 retries (reference backoff defaults, config.go:168-170).
    "retry_backoff_schedule" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, dir).filter(col("event_type") === "error")
        .withColumn("attempt_number", row_number().over(w))
        .filter(col("attempt_number") <= 10)
        .select(col("event_id"), col("user_id"), col("attempt_number"),
          (unix_millis(col("ts")) +
            expr("30000 * shiftleft(1L, attempt_number - 1)")).as("next_retry_ms"))
        .orderBy(col("event_id"))
    }),

    // sessionization: 30-min-gap sessions per user (lag + running sum).
    "sessionize_30min" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 1800000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_sess")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(unix_millis(col("ts"))).as("session_start_ms"))
        .select(col("user_id"), col("session_id"), col("n_events"), col("session_start_ms"))
        .orderBy(col("user_id"), col("session_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "filter_in_time_range" ->
      """SELECT event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms, user_id, event_type, value
        |FROM events
        |WHERE event_type IN ('purchase','signup')
        |  AND ts::TIMESTAMP >= TIMESTAMP '2024-01-10' AND ts::TIMESTAMP < TIMESTAMP '2024-01-20'
        |  AND value > 100.0
        |ORDER BY event_id""".stripMargin,
    "topic_glob_match" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE regexp_matches(event_type, '^pur.*$') OR regexp_matches(event_type, '^.*gnup$')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "json_filter_gte" ->
      """SELECT event_id, user_id, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
        |ORDER BY event_id""".stripMargin,
    "latest_event_per_user" ->
      """SELECT user_id, event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms, event_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "keyset_page2" ->
      """SELECT event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms, event_type FROM events
        |ORDER BY ts, event_id LIMIT 50 OFFSET 50""".stripMargin,
    "error_rate_by_user" ->
      """SELECT user_id, count(*) AS n_events,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_errors,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS DOUBLE) / CAST(count(*) AS DOUBLE) AS error_rate
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "consecutive_error_streaks" ->
      """SELECT user_id, max(streak) AS max_error_streak FROM (
        |  SELECT user_id, grp, count(*) AS streak FROM (
        |    SELECT user_id, ts, event_type,
        |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      - row_number() OVER (PARTITION BY user_id, (event_type='error') ORDER BY ts, event_id) AS grp
        |    FROM events) WHERE event_type = 'error' GROUP BY user_id, grp)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "retry_backoff_schedule" ->
      """SELECT event_id, user_id, attempt_number,
        |  epoch_ms(ts::TIMESTAMP) + 30000 * (1::BIGINT << (attempt_number - 1)) AS next_retry_ms
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS attempt_number
        |  FROM events WHERE event_type = 'error')
        |WHERE attempt_number <= 10 ORDER BY event_id""".stripMargin,
    "sessionize_30min" ->
      """SELECT user_id, session_id, count(*) AS n_events, min(epoch_ms(ts::TIMESTAMP)) AS session_start_ms
        |FROM (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM (
        |    SELECT user_id, ts, event_id,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |        OR epoch_ms(ts::TIMESTAMP) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)::TIMESTAMP) > 1800000
        |        THEN 1 ELSE 0 END AS new_sess
        |    FROM events))
        |GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin
  )
}
