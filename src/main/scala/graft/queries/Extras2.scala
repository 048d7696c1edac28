package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-outer join churn, moment-based exact statistics, and ordered array
  * aggregation. */
object Extras2 {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P8/§2.9: message partition-key extraction — JMESPath-subset template
    // over the JSON payload with event-id fallback (codegen'd fast path;
    // reference partitionkey.go:11-40).
    "partition_key_extract" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.select(col("event_id"),
        graft.functions.PartitionKey.column("k", col("props"),
          col("event_id").cast("string")).as("pkey"),
        graft.functions.PartitionKey.column("missing.path", col("props"),
          col("event_id").cast("string")).as("pkey_fallback"))
        .orderBy(col("event_id"))
    }),

    // FULL OUTER JOIN: week-1 vs week-4 user activity → churn classes.
    "full_outer_user_churn" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      def week(start: String, end: String) = e
        .filter(col("ts") >= lit(start).cast("timestamp") &&
          col("ts") < lit(end).cast("timestamp"))
        .select(col("user_id")).distinct()
      val w1 = week("2024-01-01", "2024-01-08").withColumn("in_w1", lit(1))
      val w4 = week("2024-01-22", "2024-01-29").withColumn("in_w4", lit(1))
      w1.join(w4, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          when(col("in_w1").isNotNull && col("in_w4").isNotNull, "retained")
            .when(col("in_w1").isNotNull, "churned")
            .otherwise("new").as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .orderBy(col("status"))
    }),

    // exact moment-based statistics: mean/stddev from integer Σx, Σx²
    // (associative integer sums → deterministic; the two-pass-free way to
    // compute stable stats at scale).
    "value_stats_by_type" -> ((s, dir) => {
      val cents = round(col("value") * 100.0, 0).cast("long")
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(cents).as("s1"), sum(cents * cents).as("s2"))
        .select(col("event_type"), col("n"),
          round(col("s1").cast("double") / (col("n") * 100).cast("double"), 6).as("mean"),
          round(sqrt((col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("n").cast("double"))
            / (col("n") - 1).cast("double")) / 100.0, 6).as("stddev"))
        .orderBy(col("event_type"))
    }),

    // INTERSECT (completes the §2.6 set-op family with setops_users).
    "intersect_users" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.filter(col("event_type") === "purchase" && col("value") > 200.0)
        .select(col("user_id")).distinct()
        .intersect(e.filter(col("event_type") === "error")
          .select(col("user_id")).distinct())
        .orderBy(col("user_id"))
    }),

    // P2 array membership: users whose event-type set overlaps a target
    // list (the reference's hasAny(matched_destination_ids, [ids]) shape).
    "array_overlap_users" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_set(col("event_type"))).as("types"))
        .filter(arrays_overlap(col("types"), array(lit("error"), lit("signup"))))
        .select(col("user_id"), array_join(col("types"), ",").as("types_csv"))
        .orderBy(col("user_id"))
    }),

    // ordered array aggregation: each user's first five event types.
    // Z-order (Morton) clustering key over (custkey, order epoch-day) —
    // the layout primitive behind multi-dimensional scan pruning
    // (operators/Layout.scala). Exact integer normalization + unrolled
    // bit interleave: DuckDB recomputes the key bit-for-bit.
    "zorder_key" -> ((s, dir) => {
      import graft.operators.Layout
      val o = Tables.orders(s, dir)
        .withColumn("odays", datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long"))
      val r = o.agg(min(col("o_custkey")), max(col("o_custkey")),
        min(col("odays")), max(col("odays"))).head()
      o.select(col("o_orderkey"),
        Layout.zvalue(
          Layout.normalize(col("o_custkey"), r.getLong(0), r.getLong(1)),
          Layout.normalize(col("odays"), r.getLong(2), r.getLong(3))).as("zkey"))
    }),

    "user_event_paths" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))).as("seq"))
        .select(col("user_id"),
          array_join(transform(slice(col("seq"), 1, 5), x => x.getField("event_type")), ",").as("path5"))
        .orderBy(col("user_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "zorder_key" ->
      s"""WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    (o_orderdate::DATE - DATE '1970-01-01') AS odays FROM orders),
        |b AS (SELECT min(o_custkey) AS mnx, max(o_custkey) AS mxx,
        |  min(odays) AS mnd, max(odays) AS mxd FROM o),
        |n AS (SELECT o_orderkey,
        |  ((o_custkey - b.mnx) * 65535) // (b.mxx - b.mnx) AS x,
        |  ((odays - b.mnd) * 65535) // (b.mxd - b.mnd) AS y
        |  FROM o, b)
        |SELECT o_orderkey,
        |  ${graft.operators.Layout.zvalueSql("x", "y")} AS zkey
        |FROM n""".stripMargin,
    "partition_key_extract" ->
      """SELECT event_id,
        |  coalesce(nullif(json_extract_string(props, '$.k'), ''), CAST(event_id AS VARCHAR)) AS pkey,
        |  coalesce(nullif(json_extract_string(props, '$.missing.path'), ''), CAST(event_id AS VARCHAR)) AS pkey_fallback
        |FROM events ORDER BY event_id""".stripMargin,
    "full_outer_user_churn" ->
      """WITH w1 AS (SELECT DISTINCT user_id FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-01' AND ts::TIMESTAMP < TIMESTAMP '2024-01-08'),
        |w4 AS (SELECT DISTINCT user_id FROM events
        |  WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-22' AND ts::TIMESTAMP < TIMESTAMP '2024-01-29')
        |SELECT CASE WHEN w1.user_id IS NOT NULL AND w4.user_id IS NOT NULL THEN 'retained'
        |            WHEN w1.user_id IS NOT NULL THEN 'churned' ELSE 'new' END AS status,
        |  count(*) AS n
        |FROM w1 FULL OUTER JOIN w4 ON w1.user_id = w4.user_id
        |GROUP BY status ORDER BY status""".stripMargin,
    "value_stats_by_type" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(round(value*100.0) AS BIGINT)) AS s1,
        |    sum(CAST(round(value*100.0) AS BIGINT) * CAST(round(value*100.0) AS BIGINT)) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT event_type, n,
        |  round(CAST(s1 AS DOUBLE) / CAST(n*100 AS DOUBLE), 6) AS mean,
        |  round(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/CAST(n AS DOUBLE))
        |    / CAST(n-1 AS DOUBLE)) / 100.0, 6) AS stddev
        |FROM m ORDER BY event_type""".stripMargin,
    "intersect_users" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type='purchase' AND value > 200.0
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type='error'
        |ORDER BY user_id""".stripMargin,
    "array_overlap_users" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv
        |FROM events GROUP BY user_id
        |HAVING list_has_any(list_sort(list(DISTINCT event_type)), ['error','signup'])
        |ORDER BY user_id""".stripMargin,
    "user_event_paths" ->
      """SELECT user_id,
        |  array_to_string((list(event_type ORDER BY ts::TIMESTAMP, event_id))[:5], ',') AS path5
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
