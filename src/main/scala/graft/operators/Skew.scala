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

  /** Salted equi-join for a skewed big side when AQE's runtime skew split
    * can't apply (stream-stream joins, AQE off, or a shuffle join whose
    * hot key lands one task with 90% of the rows): the big side tags each
    * row with a per-row salt, the small side replicates across all
    * `salts` via an explode, and the join key becomes (key, salt) — the
    * hot key's rows spread over `salts` tasks. Small-side cost is
    * `salts×` replication, so keep it for genuinely small dimensions.
    *
    * Left-family joins only: each big row matches exactly its salt
    * replica, so inner/left/semi/anti results are row-identical to the
    * unsalted join (spec-pinned); right/full would see the replicas. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 salts: Int = 16, joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports left-family joins, not $joinType")
    val b = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts.toLong)))
    val s = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    b.join(s, keyCols :+ "_salt", joinType).drop("_salt")
  }
}
