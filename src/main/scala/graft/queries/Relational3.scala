package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Third relational wave: predicate-only aggregates, conditional join
  * aggregation, a correlated subquery through the SQL API (Catalyst
  * decorrelation), window frames, and the scalar-function families. */
object Relational3 {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q6-style: pure filter + single aggregate (the pushdown showcase).
    "q6_revenue_forecast" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") >= 0.03 && col("l_discount") <= 0.05 &&
          col("l_quantity") < 24.0)
        .agg((sum(round(col("l_extendedprice") * col("l_discount") * 10000.0, 0)
          .cast("long")) / 10000.0).as("revenue"))
    }),

    // q12-style: join + per-group conditional counts.
    "q12_priority_by_status" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // q17-style correlated subquery via the SQL API → Catalyst decorrelates
    // into an aggregate + join; we assert semantics, Catalyst picks the plan.
    "q17_small_quantity" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("v_lineitem")
      Tables.part(s, dir).createOrReplaceTempView("v_part")
      s.sql(
        """SELECT p_brand,
          |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
          |FROM v_lineitem JOIN v_part ON p_partkey = l_partkey
          |WHERE l_quantity < (
          |  SELECT 0.2 * avg(l_quantity) FROM v_lineitem li
          |  WHERE li.l_partkey = v_part.p_partkey)
          |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
    }),

    // window frames: 7-day moving average of daily revenue.
    // q4-shaped correlated EXISTS: orders with any lineitem shipped more
    // than 90 days after the order date. The correlated non-equi EXISTS
    // lowers to ONE left-semi hash join on orderkey with the range
    // predicate as a join residual — no decorrelation subquery machinery,
    // no second scan of orders.
    "q4_late_shipments" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // q16-shaped NOT IN + distinct count: per (brand, type), distinct
    // suppliers excluding a blocklist subquery. NOT IN over a non-null
    // key column lowers to a broadcast left-anti join; the distinct
    // count is the only shuffle that scales with data.
    "q16_supplier_variety" -> ((s, dir) => {
      val bad = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_size") <= 10),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
        .limit(50)
    }),

    // 7-day trailing MA WITHOUT the single-partition window (r14, VERDICT
    // r13 task #8): rank the day grain with the distributed
    // Ranking.globalRowNumber, then each day contributes its cents to the
    // 7 target ranks it trails (explode ×7 → groupBy rank → join back).
    // sum-of-longs is order-free, so the ma7 double is bit-identical to
    // the old rowsBetween(-6,0) frame; n7 = count of contributing rows
    // reproduces the short leading frames (min(rk,7)).
    "moving_avg_revenue" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100.0, 0).cast("long")).as("cents"))
      val ranked = graft.operators.Ranking.globalRowNumber(
        daily, Seq(col("day")), rankCol = "rk")
      val contrib = ranked
        .select(col("rk"), col("cents").as("c"),
          explode(expr("sequence(0, 6)")).as("_o")) // generator must be top-level
        .select((col("rk") + col("_o")).as("rk7"), col("c"))
        .groupBy(col("rk7")).agg(sum(col("c")).as("s7"), count(lit(1)).as("n7"))
      ranked.join(contrib, col("rk") === col("rk7"))
        .withColumn("ma7", col("s7").cast("double") /
          (col("n7") * 100).cast("double"))
        .select(unix_millis(col("day")).as("day_ms"),
          (col("cents") / 100.0).as("revenue"), round(col("ma7"), 6).as("ma7"))
        .orderBy(col("day_ms"))
    }),

    // scalar-function families (§2.7): string/date/math/conditional in one.
    "scalar_functions" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderkey") % 100 === 0)
        .select(
          col("o_orderkey"),
          upper(col("o_orderstatus")).as("status_u"),
          substring(col("o_orderpriority"), 1, 1).as("prio_code"),
          length(col("o_orderpriority")).as("prio_len"),
          concat_ws("|", col("o_orderstatus"), col("o_orderpriority")).as("joined"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          (floor(log10(col("o_totalprice"))) + 1).cast("long").as("price_digits"),
          pow(lit(2.0), (col("o_orderkey") % 10).cast("double")).as("pow2"),
          when(col("o_totalprice") > 150000.0, "big").otherwise("small").as("bucket"))
        .orderBy(col("o_orderkey"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q6_revenue_forecast" ->
      """SELECT sum(CAST(round(l_extendedprice * l_discount * 10000.0) AS BIGINT))/10000.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.05 AND l_quantity < 24.0""".stripMargin,
    "q12_priority_by_status" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_line_count,
        |  count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q17_small_quantity" ->
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity < (
        |  SELECT 0.2 * avg(l_quantity) FROM lineitem li
        |  WHERE li.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q4_late_shipments" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 10 AND l_suppkey NOT IN
        |  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type LIMIT 50""".stripMargin,
    "moving_avg_revenue" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', o_orderdate) AS day,
        |    sum(CAST(round(o_totalprice*100.0) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT epoch_ms(day::TIMESTAMP) AS day_ms, cents/100.0 AS revenue,
        |  round(CAST(sum(cents) OVER w AS DOUBLE)
        |    / CAST(count(*) OVER w * 100 AS DOUBLE), 6) AS ma7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day_ms""".stripMargin,
    "scalar_functions" ->
      """SELECT o_orderkey,
        |  upper(o_orderstatus) AS status_u,
        |  substr(o_orderpriority, 1, 1) AS prio_code,
        |  length(o_orderpriority) AS prio_len,
        |  concat_ws('|', o_orderstatus, o_orderpriority) AS joined,
        |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  day(o_orderdate) AS dom,
        |  CAST(floor(log10(o_totalprice)) + 1 AS BIGINT) AS price_digits,
        |  pow(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS pow2,
        |  CASE WHEN o_totalprice > 150000.0 THEN 'big' ELSE 'small' END AS bucket
        |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin
  )
}
