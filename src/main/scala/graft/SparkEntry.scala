package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's gate query; each key has
  * a matching DuckDB-runnable oracle in `oracleSql` (column names aligned —
  * the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Hourly error-rate metrics with dense fill — the reference engine's
    * signature analytical shape (filter → bucket → conditional agg → fill). */
  def entry(spark: SparkSession): DataFrame =
    MetricsQueries.defs("metrics_count_hourly")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++ Relational4.defs ++
      Relational5.defs ++ Analytics.defs ++
      EventOps.defs ++ EventOps2.defs ++ MetricsQueries.defs ++
      TextOps.defs ++ DedupOps.defs ++ VectorOps.defs ++ Extras.defs ++
      SamplingOps.defs ++ Extras2.defs ++ CurationOps.defs ++
      StoreOps.defs ++ PackingOps.defs ++ SketchOps.defs ++
      TraceQualityOps.defs ++ RankProjOps.defs ++ FeatureOps.defs ++
      EvalOps.defs

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Relational2.oracles ++ Relational3.oracles ++ Relational4.oracles ++
      Relational5.oracles ++ Analytics.oracles ++
      EventOps.oracles ++ EventOps2.oracles ++ MetricsQueries.oracles ++
      TextOps.oracles ++ DedupOps.oracles ++ VectorOps.oracles ++
      Extras.oracles ++ SamplingOps.oracles ++ Extras2.oracles ++
      CurationOps.oracles ++ StoreOps.oracles ++ PackingOps.oracles ++
      SketchOps.oracles ++ TraceQualityOps.oracles ++ RankProjOps.oracles ++
      FeatureOps.oracles ++ EvalOps.oracles
}
