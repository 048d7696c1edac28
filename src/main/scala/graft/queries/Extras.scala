package graft.queries

import graft.core.Tables
import graft.operators.Skew
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HAVING, read-side dedup (O5), and skew-salted aggregation gates. */
object Extras {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A10: HAVING over grouped counts.
    "having_active_users" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 70)
        .orderBy(col("user_id"))
    }),

    // O5 read-repair: duplicated input collapses to exact results.
    "dedup_read_repair" -> ((s, dir) => {
      val e = Tables.events(s, dir).select("event_id", "event_type", "value")
      e.union(e) // simulate unmerged duplicate parts
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100.0, 0).cast("long")) / 100.0).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // skew-salted two-phase aggregation == direct aggregation.
    "salted_agg_by_type" -> ((s, dir) => {
      val cents = Tables.events(s, dir)
        .select(col("event_type"),
          round(col("value") * 100.0, 0).cast("long").as("cents"))
      Skew.saltedAgg(cents, Seq("event_type"), salts = 16, Seq(
          ("n", count(lit(1)), p => sum(col(p))),
          ("cents", sum(col("cents")), p => sum(col(p)))))
        .select(col("event_type"), col("n"),
          (col("cents") / 100.0).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // skew-salted broadcast-replica JOIN == the plain join (left-family
    // row identity is spec-pinned; this gate oracles a full workload:
    // events enriched with a 150-row user dimension, rolled up per
    // (segment, event_type)).
    "salted_join_enrich" -> ((s, dir) => {
      val dim = Tables.customer(s, dir).filter(col("c_custkey") < 150)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      val enriched = Skew.saltedJoin(
        Tables.events(s, dir).select(col("user_id"), col("event_type")),
        dim, Seq("user_id"), salts = 8)
      enriched.groupBy(col("segment"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("segment"), col("event_type"))
    })
  )

  def oracles: Map[String, String] = Map(
    "having_active_users" ->
      """SELECT user_id, count(*) AS n FROM events
        |GROUP BY user_id HAVING count(*) > 70 ORDER BY user_id""".stripMargin,
    "dedup_read_repair" ->
      """SELECT event_type, count(*) AS n,
        |  sum(CAST(round(value*100.0) AS BIGINT))/100.0 AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "salted_agg_by_type" ->
      """SELECT event_type, count(*) AS n,
        |  sum(CAST(round(value*100.0) AS BIGINT))/100.0 AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "salted_join_enrich" ->
      """SELECT c_mktsegment AS segment, event_type, count(*) AS n
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE c_custkey < 150
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
