package graft.queries

import graft.core.Tables
import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gates for the HLL sketch-rollup operator ([[graft.operators.Sketches]]).
  *
  * Gate design (the `approx_stats_check` pattern for approximate
  * operators): the rollup's EXACT side — group coverage and the
  * incrementally-maintained per-group row counts — hash-matches DuckDB's
  * recompute, while the HLL estimate is pinned as a BOOLEAN tolerance
  * contract (|est − exact| ≤ max(5 %, 1)) that the oracle expects TRUE.
  * A drifted estimate, a lost batch, a non-idempotent replay, or a
  * mis-merged group all flip a hashed cell.
  */
object SketchOps {

  /** Shifted 3-month event stream + the rollup build shared by both
    * gates: three incremental batches (split by event_id % 3) through the
    * sketch table, with the middle batch REPLAYED under its original
    * token — the no-op must leave counts exact. */
  private def buildRollup(s: SparkSession, dir: String): (DataFrame, String) = {
    val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"),
        expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"))
      .withColumn("ev_month", date_format(col("ts"), "yyyy-MM"))
    val table = java.nio.file.Files
      .createTempDirectory("graft_sketch").toString + "/rollup"
    val t0 = 1704067200000L // 2024-01-01T00:00Z
    (0 until 3).foreach { b =>
      Sketches.updateDistinctRollup(
        ev.filter(pmod(col("event_id"), lit(3)) === b), table,
        Seq("ev_month", "event_type"), "user_id",
        new java.sql.Timestamp(t0 + b * 3600000L), token = Some(s"sk-$b"))
    }
    Sketches.updateDistinctRollup( // replayed batch 1: token → no-op
      ev.filter(pmod(col("event_id"), lit(3)) === 1), table,
      Seq("ev_month", "event_type"), "user_id",
      new java.sql.Timestamp(t0 + 3600000L), token = Some("sk-1"))
    (ev, table)
  }

  private def estOk(est: org.apache.spark.sql.Column,
                    exact: org.apache.spark.sql.Column) =
    (abs(est - exact) <= greatest(exact * lit(0.05), lit(1.0))).as("est_ok")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // stored-grain readout: (month, type) rows with the table's exact
    // n_rows and the estimate-tolerance boolean
    "sketch_distinct_rollup" -> ((s, dir) => {
      val (ev, table) = buildRollup(s, dir)
      val exact = ev.groupBy("ev_month", "event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      Sketches.estimates(s, table, Seq("ev_month", "event_type"))
        .join(exact, Seq("ev_month", "event_type"))
        .select(col("ev_month"), col("event_type"), col("n_rows"),
          estOk(col("distinct_est"), col("n_exact")))
    }),

    // coarser-grain re-aggregation from sketches alone — the union-only
    // query exact distinct cannot answer without re-reading facts: per
    // event_type across all months, straight off the state table
    "sketch_union_across" -> ((s, dir) => {
      val (ev, table) = buildRollup(s, dir)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      Sketches.estimateAcross(s, table, Seq("event_type"))
        .join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_rows"),
          estOk(col("distinct_est"), col("n_exact")))
    })
  )

  def oracles: Map[String, String] = Map(
    "sketch_distinct_rollup" ->
      """WITH ev AS (
        |  SELECT ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts,
        |    user_id, event_type
        |  FROM events)
        |SELECT strftime(ts, '%Y-%m') AS ev_month, event_type,
        |  CAST(count(user_id) AS BIGINT) AS n_rows, TRUE AS est_ok
        |FROM ev GROUP BY 1, 2""".stripMargin,
    "sketch_union_across" ->
      """SELECT event_type,
        |  CAST(count(user_id) AS BIGINT) AS n_rows, TRUE AS est_ok
        |FROM events GROUP BY 1""".stripMargin
  )
}
