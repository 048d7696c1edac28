package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational gate queries over the TPC-H-ish tables.
  *
  * Cover SURVEY §2: S-scans with pushdown (P1/P3), broadcast joins (J1),
  * conditional aggregation (A1-A6), top-k (O1), distinct.
  *
  * Determinism rule for float aggregates: doubles are scaled to integer
  * cents/basis-points BEFORE summing (integer addition is associative →
  * identical across partition orders and engines), then divided by the scale
  * as a final double op. A plain `sum(double)` would be last-ulp
  * nondeterministic under shuffle and could never hash-match the oracle.
  */
object Relational {

  /** sum(expr * scale) as exact integer, emitted as double value. */
  private def moneySum(c: org.apache.spark.sql.Column, scale: Long) =
    sum(round(c * scale.toDouble, 0).cast("long"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1-A6: grouped conditional aggregation over the biggest fact table.
    "q1_pricing_summary" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (moneySum(col("l_quantity"), 100) / 100.0).as("sum_qty"),
          (moneySum(col("l_extendedprice"), 100) / 100.0).as("sum_base_price"),
          (moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000) / 10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // J-joins: customer ⋈ orders ⋈ lineitem, group, top-10 (broadcast dims).
    "q3_top_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"))
        .agg((moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // multi-join through small broadcast dims (region→nation→customer).
    "q5_region_revenue" -> ((s, dir) => {
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000) / 10000.0).as("revenue"))
        .orderBy(col("n_name"))
    }),

    // P1/P3: projection + filter — both must reach the parquet scan.
    "scan_project_filter" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-02-01").cast("timestamp") &&
          col("l_quantity") > 45.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // O1: distributed top-k (TakeOrderedAndProject, not a full sort).
    "topk_orders_by_price" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // distinct over a join (semi-join shape).
    "distinct_order_priorities" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .select(col("o_orderpriority")).distinct()
        .orderBy(col("o_orderpriority"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(round(l_quantity*100.0) AS BIGINT))/100.0 AS sum_qty,
        |  sum(CAST(round(l_extendedprice*100.0) AS BIGINT))/100.0 AS sum_base_price,
        |  sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT))/10000.0 AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey,
        |  sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT))/10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT))/10000.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-02-01'
        |  AND l_quantity > 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "topk_orders_by_price" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "distinct_order_priorities" ->
      """SELECT DISTINCT o_orderpriority FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' ORDER BY o_orderpriority""".stripMargin
  )
}
