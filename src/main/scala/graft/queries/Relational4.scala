package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth relational wave: the remaining TPC-H query shapes expressible on
  * the reduced star schema (no partsupp table, no commit/receipt dates —
  * predicates are adapted, the characteristic PLAN SHAPE of each query is
  * kept: double-aliased dimension joins, conditional market-share ratios,
  * outer-join histograms, view + scalar-max subqueries, disjunctive
  * pushdown, correlated EXISTS/NOT-EXISTS pairs, anti-join + scalar-avg).
  *
  * Determinism: every float aggregate is integerized before summing (see
  * Relational.moneySum rationale); ratios divide the two exact integer sums
  * in one IEEE double op with identical association order in both engines.
  */
object Relational4 {

  private def moneySum(c: Column, scale: Long) =
    sum(round(c * scale.toDouble, 0).cast("long"))

  private def revenueSum =
    (moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000) / 10000.0)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q7 shape: the same dimension joined twice under different roles
    // (supplier nation vs customer nation), grouped by the role pair + year.
    "q7_nation_volume" -> ((s, dir) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revenueSum.as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // q8 shape: market share = conditional sum / total sum per year. Both
    // sums are exact integers; the share is ONE double division (bit-exact
    // across engines under any aggregation order).
    "q8_market_share" -> ((s, dir) => {
      val asiaCust = Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val vol = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000.0, 0).cast("long")
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", vol).otherwise(0L)).as("nation_cents"),
          sum(vol).as("total_cents"))
        .select(col("o_year"),
          (col("nation_cents").cast("double") / col("total_cents").cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // q9 shape (sans ps_supplycost): profit by supplier nation × order year
    // for a p_name-substring part family; descending year within nation.
    "q9_product_profit" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).filter(col("p_name").contains("widget"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(revenueSum.as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // q10 shape: top-20 customers by returned-item revenue in one quarter.
    "q10_returned_items" -> ((s, dir) => {
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revenueSum.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // q13 shape: LEFT OUTER join with a join-condition filter (not a WHERE —
    // customers with zero qualifying orders must survive as c_count = 0),
    // then a histogram of the per-customer counts.
    "q13_customer_distribution" -> ((s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_orderpriority") =!= "1-URGENT")
      Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // q14 shape: promo revenue share for one month — conditional integer
    // sums, then 100·a/b with identical association order in both engines.
    "q14_promo_revenue" -> ((s, dir) => {
      val vol = round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 10000.0, 0).cast("long")
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", vol).otherwise(0L)).as("promo_cents"),
          sum(vol).as("total_cents"))
        .select((lit(100.0) * col("promo_cents").cast("double") /
          col("total_cents").cast("double")).as("promo_revenue"))
    }),

    // q15 shape: per-supplier quarterly revenue view, then suppliers whose
    // revenue equals the view's scalar max (1-row broadcast, no sort).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 10000).as("total_cents"))
      val best = rev.agg(max(col("total_cents")).as("best_cents"))
      rev.join(broadcast(best), col("total_cents") === col("best_cents"))
        .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("total_cents") / 10000.0).as("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // q18 shape: orders whose total quantity clears a threshold (grouped
    // HAVING feeding a semi-ish join), with the group sum carried through.
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(moneySum(col("l_quantity"), 100).as("qty_cents"))
        .filter(col("qty_cents") > 300L * 100L)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"), col("o_totalprice"),
          (col("qty_cents") / 100.0).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // q19 shape: one aggregate under an OR-of-ANDs predicate spanning both
    // join sides — the disjunction must still prune (brand ∈ set, qty ≤ max
    // bound are pushable residuals).
    "q19_discounted_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1.0, 11.0)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10.0, 20.0)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20.0, 30.0)))
        .agg(revenueSum.as("revenue"))
    }),

    // q21 shape: correlated EXISTS + NOT EXISTS pair over the same fact
    // table — expressed through the SQL API so Catalyst plans the
    // decorrelation (left-semi + left-anti joins on orderkey with residual
    // inequality predicates). "Late" is adapted to ship > order + 60 days.
    "q21_waiting_suppliers" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("v21_lineitem")
      Tables.orders(s, dir).createOrReplaceTempView("v21_orders")
      Tables.supplier(s, dir).createOrReplaceTempView("v21_supplier")
      Tables.nation(s, dir).createOrReplaceTempView("v21_nation")
      s.sql(
        """SELECT s_name, count(*) AS numwait
          |FROM v21_supplier JOIN v21_nation ON s_nationkey = n_nationkey
          |JOIN v21_lineitem l1 ON s_suppkey = l1.l_suppkey
          |JOIN v21_orders ON o_orderkey = l1.l_orderkey
          |WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
          |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          |  AND EXISTS (SELECT 1 FROM v21_lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (SELECT 1 FROM v21_lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
          |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
    }),

    // Ranking-window family not yet oracled elsewhere: percent_rank,
    // cume_dist, ntile and first/last_value frames over one partition
    // pass. Doubles as a determinism check on rank ties (the ORDER BY
    // includes the key, so ranks are total).
    "window_rank_funcs" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("v_wr_customer")
      s.sql(
        """SELECT c_custkey, c_nationkey,
          |  percent_rank() OVER w AS pr,
          |  cume_dist() OVER w AS cd,
          |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          |  first_value(c_custkey) OVER w AS first_k,
          |  last_value(c_custkey) OVER
          |    (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
          |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k
          |FROM v_wr_customer
          |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
          |ORDER BY c_custkey""".stripMargin)
    }),

    // UNPIVOT (stack): wide per-flag measures back to long form — the
    // inverse of the oracled PIVOT gate.
    "unpivot_lineitem_measures" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          moneySum(col("l_quantity"), 100).as("qty_cents"),
          moneySum(col("l_extendedprice"), 100).as("price_cents"),
          moneySum(col("l_discount"), 10000).as("disc_dm"))
        .select(col("l_returnflag"),
          expr("stack(3, 'qty_cents', qty_cents, 'price_cents', price_cents," +
            " 'disc_dm', disc_dm) AS (measure, value)"))
        .orderBy(col("l_returnflag"), col("measure"))
    }),

    // GROUPING SETS (the irregular cousin of the oracled CUBE/ROLLUP
    // gates): an explicit, non-hierarchical set list — per-flag×status,
    // per-status alone, grand total, but NOT per-flag — with grouping()
    // markers disambiguating subtotal NULLs from (hypothetical) data NULLs.
    "grouping_sets_lineitem" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("v_gs_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
          |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
          |  sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS qty_cents,
          |  count(*) AS n
          |FROM v_gs_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_linestatus), ())
          |ORDER BY g_rf, g_ls,
          |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    }),

    // q21 AGAIN as per-order aggregates: "another supplier exists" ⟺
    // distinct suppliers ≥ 2; "no other supplier shipped late" ⟺ distinct
    // LATE suppliers = 1 — the decorrelated plan's two lineitem self-joins
    // collapse into ONE aggregation pass (numwait = that supplier's late
    // lineitems, matching row-per-l1 semantics). MEASURED at sf0.1: 1.75 s
    // vs 1.59 s for the join form — the double countDistinct costs an
    // Expand (3× rows through the exchange) that outweighs the saved
    // joins while the semi/anti sides still broadcast; the trade flips
    // only when the build sides outgrow broadcast. Kept as the oracled
    // equivalence witness for multi-distinct aggregation.
    "q21_waiting_agg" -> ((s, dir) => {
      val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
      val perOrder = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderstatus"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(late, col("l_suppkey"))).as("n_late_supp"),
          max(when(late, col("l_suppkey"))).as("late_supp"),
          count(when(late, lit(1))).as("n_late_items"))
        .filter(col("o_orderstatus") === "F" &&
          col("n_supp") >= 2 && col("n_late_supp") === 1)
      val supp5 = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_5")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      perOrder.join(broadcast(supp5), col("late_supp") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_late_items")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    }),

    // q22 shape: scalar-average subquery threshold + anti join against
    // recent orders. The average is sum(cents)/100/count — exact integers
    // divided in a fixed order, so the threshold is bit-identical in both
    // engines (a naive avg(double) would be shuffle-order-dependent and
    // could flip boundary rows).
    "q22_idle_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val thr = c.filter(col("c_acctbal") > 0.0)
        .agg(moneySum(col("c_acctbal"), 100).as("bal_cents"), count(lit(1)).as("n"))
        .select((col("bal_cents").cast("double") / 100.0 / col("n")).as("thr"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      c.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          (moneySum(col("c_acctbal"), 100) / 100.0).as("totacctbal"))
        .orderBy(col("c_nationkey"))
    })
  )

  private val rev10k =
    "sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT))/10000.0"

  def oracles: Map[String, String] = Map(
    "q7_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year, $rev10k AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1','NATION_2')
        |  AND n2.n_name IN ('NATION_1','NATION_2')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """WITH vols AS (
        |  SELECT year(o_orderdate) AS o_year,
        |    CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT) AS vol,
        |    n2.n_name AS supp_nation
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(vol) AS DOUBLE) AS mkt_share
        |FROM vols GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q9_product_profit" ->
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year, $rev10k AS sum_profit
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $rev10k AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q13_customer_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT)
        |    ELSE 0 END) AS DOUBLE)
        |  / CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT)) AS DOUBLE)
        |  AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice*(1.0-l_discount)*10000.0) AS BIGINT)) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents/10000.0 AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    sum(CAST(round(l_quantity*100.0) AS BIGINT)) AS qty_cents
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(round(l_quantity*100.0) AS BIGINT)) > 30000)
        |SELECT c_name, c_custkey, o_orderkey, epoch_ms(o_orderdate) AS o_date_ms,
        |  o_totalprice, qty_cents/100.0 AS sum_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_discounted_revenue" ->
      s"""SELECT $rev10k AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1.0 AND 11.0)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10.0 AND 20.0)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin,
    "q21_waiting_agg" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND n_name = 'NATION_5'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "window_rank_funcs" ->
      """SELECT c_custkey, c_nationkey,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  first_value(c_custkey) OVER w AS first_k,
        |  last_value(c_custkey) OVER
        |    (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "unpivot_lineitem_measures" ->
      """WITH agg AS (
        |  SELECT l_returnflag,
        |    sum(CAST(round(l_quantity*100.0) AS BIGINT)) AS qty_cents,
        |    sum(CAST(round(l_extendedprice*100.0) AS BIGINT)) AS price_cents,
        |    sum(CAST(round(l_discount*10000.0) AS BIGINT)) AS disc_dm
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, measure, CAST(value AS BIGINT) AS value
        |FROM agg UNPIVOT (value FOR measure IN (qty_cents, price_cents, disc_dm))
        |ORDER BY l_returnflag, measure""".stripMargin,
    "grouping_sets_lineitem" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT) AS qty_cents,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus), ())
        |ORDER BY g_rf, g_ls,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_nationkey, count(*) AS numcust,
        |  sum(CAST(round(c_acctbal*100.0) AS BIGINT))/100.0 AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (
        |  SELECT CAST(sum(CAST(round(c_acctbal*100.0) AS BIGINT)) AS DOUBLE) / 100.0 / count(*)
        |  FROM customer WHERE c_acctbal > 0.0)
        |AND NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
