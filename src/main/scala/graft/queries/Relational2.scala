package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second relational wave: multi-dim grouping (rollup/cube), pivot,
  * semi/anti joins, set operations, percentiles, histograms, top-k per
  * group, point lookup. All exact → DuckDB-oracled. */
object Relational2 {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ROLLUP: hierarchical subtotals in one pass (partial-agg friendly).
    "rollup_order_stats" -> ((s, dir) => {
      Tables.orders(s, dir)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("o_totalprice") * 100.0, 0).cast("long")) / 100.0).as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    // CUBE over the two low-cardinality lineitem flags.
    "cube_lineitem_flags" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    }),

    // PIVOT: event_type → columns (conditional-count expansion).
    "pivot_event_counts" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .count()
        .na.fill(0L)
        .orderBy(col("user_id"))
    }),

    // LEFT SEMI: parts that have at least one max-quantity lineitem.
    "semi_join_parts" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).filter(col("l_quantity") >= 49.0)
      Tables.part(s, dir)
        .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy(col("p_partkey"))
    }),

    // LEFT ANTI: customers with no orders at all.
    "anti_join_customers" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    // set ops: (big purchasers ∪ error-prone users) ∖ signup users.
    "setops_users" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val buyers = e.filter(col("event_type") === "purchase" && col("value") > 300.0)
        .select(col("user_id"))
      val erroring = e.filter(col("event_type") === "error").select(col("user_id"))
      val signups = e.filter(col("event_type") === "signup").select(col("user_id"))
      buyers.union(erroring).distinct().except(signups.distinct())
        .orderBy(col("user_id"))
    }),

    // exact percentiles (interpolated) per event_type.
    "value_percentiles" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.25)"), 6).as("p25"),
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.95)"), 6).as("p95"))
        .orderBy(col("event_type"))
    }),

    // fixed-width histogram over value.
    "value_histogram" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(floor(col("value") / 50.0).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),

    // top-3 events per user by value (window top-k, no global sort).
    "top3_per_user" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("rn"), col("event_id"), col("value"))
        .orderBy(col("user_id"), col("rn"))
    }),

    // point lookup (pushdown to one row-group).
    "retrieve_event" -> ((s, dir) => {
      Tables.events(s, dir).filter(col("event_id") === 4242L)
        .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    })
  )

  def oracles: Map[String, String] = Map(
    "rollup_order_stats" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  sum(CAST(round(o_totalprice*100.0) AS BIGINT))/100.0 AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "cube_lineitem_flags" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "pivot_event_counts" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type='click') AS click,
        |  count(*) FILTER (WHERE event_type='view') AS view,
        |  count(*) FILTER (WHERE event_type='purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type='signup') AS signup,
        |  count(*) FILTER (WHERE event_type='error') AS error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "semi_join_parts" ->
      """SELECT p_partkey, p_brand FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_partkey = p_partkey AND l_quantity >= 49.0)
        |ORDER BY p_partkey""".stripMargin,
    "anti_join_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "setops_users" ->
      """(SELECT DISTINCT user_id FROM events WHERE event_type='purchase' AND value > 300.0
        | UNION
        | SELECT DISTINCT user_id FROM events WHERE event_type='error')
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type='signup'
        |ORDER BY user_id""".stripMargin,
    "value_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 6) AS p25,
        |  round(quantile_cont(value, 0.5), 6) AS p50,
        |  round(quantile_cont(value, 0.95), 6) AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(value/50.0) AS BIGINT) AS bin, count(*) AS n
        |FROM events GROUP BY bin ORDER BY bin""".stripMargin,
    "top3_per_user" ->
      """SELECT user_id, rn, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin,
    "retrieve_event" ->
      """SELECT event_id, epoch_ms(ts::TIMESTAMP) AS ts_ms, user_id, event_type, value, props
        |FROM events WHERE event_id = 4242""".stripMargin
  )
}
