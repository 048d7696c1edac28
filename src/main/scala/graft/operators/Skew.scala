package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers.
  *
  * AQE's skew-join splitting handles joins; for AGGREGATIONS over a few hot
  * keys (one tenant producing 90% of events — exactly the reference's bench
  * shape, 2 tenants at 90/10), pre-splitting a hot key across salts bounds
  * any single task. Spark's hash aggregate already does map-side partial
  * aggregation, which removes most skew for algebraic aggregates — salting
  * matters when per-key state is large (collect_list/distinct-heavy aggs) or
  * when AQE is off. Provided as an explicit operator so pipelines can opt in
  * per aggregation.
  */
object Skew {

  /** Two-phase salted aggregation for (count, sum)-style algebraic
    * aggregates: phase 1 groups on (key, salt) — hot keys split across
    * `salts` tasks; phase 2 merges the partials per key.
    *
    * @param aggs (name, phase1 agg over input, phase2 merge over partials)
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int,
                aggs: Seq[(String, Column, String => Column)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val phase1 = salted
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(aggs.head._2.as(s"_p_${aggs.head._1}"),
        aggs.tail.map(a => a._2.as(s"_p_${a._1}")): _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head._3(s"_p_${aggs.head._1}").as(aggs.head._1),
        aggs.tail.map(a => a._3(s"_p_${a._1}").as(a._1)): _*)
  }

  /** Salted count+sum, the common case. */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, keyCols, salts, Seq(
      ("n", count(lit(1)), (p: String) => sum(col(p))),
      ("total", sum(col(valueCol)), (p: String) => sum(col(p)))))
}
