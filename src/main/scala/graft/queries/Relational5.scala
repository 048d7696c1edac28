package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fifth relational wave — the LAST three TPC-H shapes, completing all 22
  * on the reduced star schema. The testdata ships no partsupp table, so
  * each query's supplier×part relation is derived from lineitem (the
  * "offer" a supplier has actually made for a part), keeping the
  * characteristic plan shape:
  *
  *  - q2: per-group min over a derived relation, joined back on
  *    (group, min) — the correlated-min-subquery decorrelation.
  *  - q11: grouped value vs a scalar fraction of the global total —
  *    HAVING against a 1-row broadcast.
  *  - q20: conditional-sum threshold per (supplier, part) feeding a
  *    semi join — the nested-IN decorrelation.
  *
  * Determinism: all money/quantity aggregates integerize before summing
  * (Relational.moneySum rationale); threshold comparisons happen on exact
  * longs (cross-multiplied where a fraction is involved) so no boundary
  * row can flip on shuffle order.
  */
object Relational5 {

  private def moneySum(c: Column, scale: Long) =
    sum(round(c * scale.toDouble, 0).cast("long"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q2 shape: minimum-cost supplier per part within one region. The
    // "supply cost" is the supplier's best (lowest) observed unit price
    // for the part, in exact cents. Both aggregations key on l_partkey,
    // so the second groupBy reuses the first's exchange; the (part, min)
    // relation re-joins broadcast (≤ one row per selected part).
    "q2_min_cost_supplier" -> ((s, dir) => {
      val eu = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
      val sel = Tables.part(s, dir).filter(col("p_size") === 15)
        .select(col("p_partkey"))
      val offers = Tables.lineitem(s, dir)
        .join(broadcast(sel), col("l_partkey") === col("p_partkey"), "left_semi")
        .join(broadcast(eu.select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(round(col("l_extendedprice") / col("l_quantity") * 100.0, 0)
          .cast("long")).as("cost_cents"))
      val minCost = offers.groupBy(col("l_partkey"))
        .agg(min(col("cost_cents")).as("min_cents"))
        .withColumnRenamed("l_partkey", "mc_partkey")
      offers
        .join(broadcast(minCost), col("l_partkey") === col("mc_partkey") &&
          col("cost_cents") === col("min_cents"))
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("l_partkey").as("p_partkey"),
          (col("cost_cents") / 100.0).as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // q11 shape: per-part "stock value" from one nation's suppliers,
    // kept only where it clears a fixed fraction of the nation's total.
    // The total is a second aggregate OVER THE SAME grouped relation
    // (exchange reuse), broadcast as one row; the fraction compare is
    // cross-multiplied into exact longs (value·1000 > total) so no
    // boundary part flips on double rounding.
    "q11_important_stock" -> ((s, dir) => {
      val supp7 = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_7")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val perPart = Tables.lineitem(s, dir)
        .join(broadcast(supp7), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(moneySum(col("l_extendedprice"), 100).as("value_cents"))
      val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_cents") * 1000L > col("total_cents"))
        .select(col("l_partkey").as("p_partkey"),
          (col("value_cents") / 100.0).as("part_value"))
        .orderBy(col("part_value").desc, col("p_partkey"))
    }),

    // q20 shape: suppliers of 'small…' parts who concentrated more than
    // half of a part's lifetime shipped quantity into 1998 — the
    // availqty > ½·shipped correlate, decorrelated into ONE conditional
    // aggregation per (supplier, part) and a semi join into the
    // NATION_2 supplier list. Quantities compare as exact cents
    // (qty98·2 > qty_all, both longs).
    "q20_potential_promo" -> ((s, dir) => {
      val smallParts = Tables.part(s, dir)
        .filter(col("p_name").startsWith("small"))
        .select(col("p_partkey"))
      val y98 = col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp")
      val qtyCents = round(col("l_quantity") * 100.0, 0).cast("long")
      val concentrated = Tables.lineitem(s, dir)
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(
          sum(when(y98, qtyCents).otherwise(0L)).as("qty98_cents"),
          sum(qtyCents).as("qty_all_cents"))
        .filter(col("qty98_cents") * 2L > col("qty_all_cents"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .join(concentrated, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_name"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q2_min_cost_supplier" ->
      """WITH eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice / l_quantity * 100.0) AS BIGINT)) AS cost_cents
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
        |    AND l_suppkey IN (SELECT s_suppkey FROM eu)
        |  GROUP BY 1, 2),
        |mc AS (
        |  SELECT l_partkey AS mc_partkey, min(cost_cents) AS min_cents
        |  FROM offers GROUP BY 1)
        |SELECT s_acctbal, s_name, n_name, o.l_partkey AS p_partkey,
        |  o.cost_cents / 100.0 AS supply_cost
        |FROM offers o
        |JOIN mc ON o.l_partkey = mc.mc_partkey AND o.cost_cents = mc.min_cents
        |JOIN eu ON o.l_suppkey = eu.s_suppkey
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q11_important_stock" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |    WHERE n_name = 'NATION_7')
        |  GROUP BY 1)
        |SELECT l_partkey AS p_partkey, value_cents / 100.0 AS part_value
        |FROM per_part
        |WHERE value_cents * 1000 > (SELECT sum(value_cents) FROM per_part)
        |ORDER BY part_value DESC, p_partkey""".stripMargin,
    "q20_potential_promo" ->
      """WITH conc AS (
        |  SELECT l_suppkey
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
        |      AND l_shipdate < TIMESTAMP '1999-01-01'
        |      THEN CAST(round(l_quantity * 100.0) AS BIGINT) ELSE 0 END) * 2
        |    > sum(CAST(round(l_quantity * 100.0) AS BIGINT)))
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2' AND s_suppkey IN (SELECT l_suppkey FROM conc)
        |ORDER BY s_name""".stripMargin
  )
}
