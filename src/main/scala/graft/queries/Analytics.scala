package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-analytics operator family over the events stream + star schema:
  * ordered-step funnels, cohort retention, iterative PageRank, a
  * deequ-style data-quality constraint suite, and exponentially-weighted
  * trailing aggregates. (Reference scope: the engine's event tables power
  * exactly these dashboard shapes downstream of delivery metrics —
  * cf. /root/reference/internal/logstore/chlogstore/metrics.go query
  * matrix; these widen it with the stateful/iterative shapes.)
  *
  * Scale notes, per operator:
  *  - funnel: three aggregations + two joins ALL keyed on user_id — one
  *    shuffle partitioning reused end-to-end; step tables only shrink.
  *  - cohort: first-touch table is user-keyed (same reuse); the final
  *    matrix is |cohorts|×|offsets| (tiny at any SF).
  *  - pagerank: ranks/degrees co-partition on node; each iteration is one
  *    shuffle; contributions sum as exact longs (×1e9) so results are
  *    bit-stable under any partitioning — the property that lets the
  *    DuckDB oracle replay iterations as chained CTEs.
  *  - constraints: one conditional-agg pass per table + one anti-join;
  *    output is one row per constraint.
  *  - EMA: facts first collapse to the bounded day grain (shuffle), then
  *    a ≤30-day self range-join runs on the tiny dimension — the weights
  *    are powers of 0.5 (exact in binary FP, so both engines agree to the
  *    last bit; 0.9^k would differ in the last ulp between libm and Java).
  */
object Analytics {

  private def step(ev: DataFrame, typ: String) =
    ev.filter(col("event_type") === typ)
      .select(col("user_id"), col("ts"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered-step funnel with a 7-day per-step window: a user counts for
    // step N only with an event strictly after their step-N-1 time and
    // within 7 days of it. min(ts) per user per step keeps every table
    // user-keyed: groupBy→join→groupBy→join→groupBy, one partitioning.
    "funnel_steps" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val t1 = step(ev, "view").groupBy(col("user_id"))
        .agg(min(col("ts")).as("t1"))
      val t2 = step(ev, "click").join(t1, Seq("user_id"))
        .filter(col("ts") > col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 7 DAY"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = step(ev, "purchase").join(t2, Seq("user_id"))
        .filter(col("ts") > col("t2") &&
          col("ts") <= col("t2") + expr("INTERVAL 7 DAY"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      t1.agg(count(lit(1)).as("users")).withColumn("st", lit("1_view"))
        .unionByName(
          t2.agg(count(lit(1)).as("users")).withColumn("st", lit("2_click")))
        .unionByName(
          t3.agg(count(lit(1)).as("users")).withColumn("st", lit("3_purchase")))
        .select(col("st"), col("users"))
        .orderBy(col("st"))
    }),

    // Weekly cohort retention matrix: cohort = Monday-truncated week of a
    // user's FIRST event; each (cohort, weeks-since) cell counts distinct
    // active users. Offsets are exact integer math on epoch millis.
    "cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
      val first = ev.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
      ev.join(first, Seq("user_id"))
        .withColumn("week_offset",
          floor((unix_millis(date_trunc("week", col("ts"))) -
            unix_millis(col("cohort_week"))) / lit(604800000L)))
        .groupBy(unix_millis(col("cohort_week")).as("cohort_week_ms"),
          col("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort_week_ms"), col("week_offset"))
    }),

    // PageRank (3 iterations, d = 0.85) over the customer↔supplier trade
    // graph (an edge per distinct trading pair, both directions, so no
    // dangling mass). Per-iteration contributions round to exact 1e-9
    // units before the shuffle-sum — rank values are then identical
    // whatever the partitioning, and DuckDB replays the same three
    // iterations as CTEs to the bit.
    "pagerank_trade" -> ((s, dir) => {
      // long node ids in the compute (customer → 2k, supplier → 2k+1):
      // the distinct, degree count and three contribution shuffles move
      // 8-byte keys; the 'c…'/'s…' labels render once in the readout
      // (measured: string-keyed graph 4.2 s → long-keyed 2.x s at sf0.1)
      // both sides of the orderkey→custkey mapping are fact-sized at
      // scale — the shuffle join is the right plan (measured: forcing a
      // broadcast here is a wash at sf0.1 and wrong at 100 TB)
      val pairs = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2L).as("a"),
          (col("l_suppkey") * 2L + 1L).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
      // degree rides the SAME src shuffle as the cached edge frame (a
      // partition-wide count window), replacing the r9 aggregate+join —
      // one preamble shuffle and a join operator gone (measured: the
      // preamble, not the iterations, dominated after the AQE-off fix)
      val e = edges.withColumn("d", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      // AQE off for the whole loop+readout: each iteration's plan shape
      // is fixed (cached edges, node-keyed shuffles), and AQE's
      // per-shuffle job materialization put ~10 driver round trips on
      // the ~0.3 s local scheduling floor (measured r9: the loop was
      // stage-floor-bound, not data-bound)
      graft.core.Caching.noAqeScope(s) {
      val prevW = s.conf.get("spark.sql.shuffle.partitions", "32")
      // 8 balances the two regimes sharing this scope: the preamble
      // lineitem⋈orders join is DATA-bound (wants width), the iteration
      // loop is stage-floor-bound (wants fewer tasks). Width 4 measured
      // indistinguishable (r11: steady 1.9-2.0 s both ways, inside the
      // cross-JVM noise band) while under-parallelizing the join.
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      graft.core.Caching.withCached(e) {
        // rank init groups the CACHED src-partitioned frame — partial-agg
        // only, no extra shuffle, no recompute of the preamble subtree
        var ranks = e.groupBy(col("src").as("node"))
          .agg(lit(1.0).as("rank"))
        (1 to 3).foreach { _ =>
          // ranks (node-count-sized) shuffles TO the cached edge
          // partitioning each round; the edges themselves never move.
          // Deliberately NOT a broadcast: a billion-node graph's rank
          // table outgrows the driver, the node-keyed shuffle does not.
          ranks = e.join(ranks, col("src") === col("node"))
            .select(col("dst"),
              round(col("rank") / col("d") * 1e9, 0).cast("long").as("contrib"))
            .groupBy(col("dst"))
            .agg((lit(0.15) + lit(0.85) * (sum(col("contrib")) / lit(1e9)))
              .as("rank"))
            .withColumnRenamed("dst", "node")
        }
        // top-25 collects INSIDE the cache scope (driver-bounded result;
        // a lazy frame would recompute the whole loop post-unpersist);
        // labels render here only — order by the rendered label to match
        // the oracle's string tie-break
        val out = ranks
          .select(
            when(col("node") % 2L === 0L,
              concat(lit("c"), (col("node") / 2L).cast("long")))
              .otherwise(concat(lit("s"), ((col("node") - 1L) / 2L).cast("long")))
              .as("node"),
            col("rank"))
          .orderBy(col("rank").desc, col("node")).limit(25)
        s.createDataFrame(
          java.util.Arrays.asList(out.collect(): _*), out.schema)
      }
      } finally s.conf.set("spark.sql.shuffle.partitions", prevW)
      }
    }),

    // Deequ-style constraint suite: completeness, uniqueness, range, set
    // membership, referential integrity, and a per-group cardinality
    // bound — one row per constraint with its exact violation count.
    // Shapes: one conditional-agg pass per table, one anti join (ref
    // integrity), one grouped HAVING (cardinality); all counts are longs.
    "dq_constraints" -> ((s, dir) => {
      // the gate runs through the REUSABLE suite API
      // (operators/Quality.scala) — two tables, two suites, one union;
      // each suite's row-level checks share a single aggregate pass
      import graft.operators.Quality
      import graft.operators.Quality._
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val oChecks = Quality.check(o, Seq(
        NotNull("orders.o_orderkey.not_null", "o_orderkey"),
        Unique("orders.o_orderkey.unique", Seq("o_orderkey")),
        FailsWhen("orders.o_totalprice.positive", col("o_totalprice") <= 0.0),
        InSet("orders.o_orderstatus.in_set", "o_orderstatus",
          Seq("F", "O", "P"))))
      val lChecks = Quality.check(l, Seq(
        InRange("lineitem.l_discount.range_0_01", "l_discount", 0.0, 0.1),
        InRange("lineitem.l_quantity.range_1_50", "l_quantity", 1.0, 50.0),
        // deliberately failing check: exercises nonzero violation counts
        FailsWhen("lineitem.l_tax.max_005", col("l_tax") > 0.05),
        RefIntegrity("lineitem.l_orderkey.ref_orders", Seq("l_orderkey"),
          o, Seq("o_orderkey")),
        MaxPerGroup("lineitem.per_order.max_7_lines", Seq("l_orderkey"), 7L)))
      oChecks.unionByName(lChecks).orderBy(col("check_name"))
    }),

    // Statistical constraint shapes (r11): dataset-level mean/stddev
    // bounds ride the shared aggregate pass; NoAnomalies counts rows
    // beyond a z-score against the column's own moments (the
    // Analytics z-machinery as a declarable constraint). One check is
    // deliberately failing to exercise the 0/1 stat verdict.
    "dq_statistical" -> ((s, dir) => {
      import graft.operators.Quality
      import graft.operators.Quality._
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      Quality.check(l, Seq(
        MeanInRange("lineitem.l_discount.mean_004_006", "l_discount",
          0.04, 0.06),
        // deliberately failing: quantity mean ~25.5, bound at 10
        MeanInRange("lineitem.l_quantity.mean_low", "l_quantity", 0.0, 10.0),
        StddevInRange("lineitem.l_quantity.stddev_10_20", "l_quantity",
          10.0, 20.0)))
        .unionByName(Quality.check(o, Seq(
          NoAnomalies("orders.o_totalprice.z3", "o_totalprice", 3.0))))
        .orderBy(col("check_name"))
    }),

    // Markov transition matrix over the event stream: per-user
    // consecutive event-type pairs (lag window keyed by user — ONE
    // shuffle), then global (prev → next) counts with row probabilities
    // as one exact-integer division. The user-keyed window is the only
    // stateful pass; the matrix itself is |types|² rows.
    "event_transitions" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
      val counts = pairs.groupBy(col("prev_type"),
          col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("prev_type"))
        .agg(sum(col("n")).as("row_total"))
      counts.join(broadcast(totals), Seq("prev_type"))
        .select(col("prev_type"), col("next_type"), col("n"),
          (col("n").cast("double") / col("row_total").cast("double")).as("p"))
        .orderBy(col("prev_type"), col("next_type"))
    }),

    // RFM segmentation: per-user recency (days since last purchase,
    // anchored at the stream's max ts — no wall clock), frequency, exact
    // monetary cents; quartile codes via ntile over (metric, user_id) —
    // the tie-broken total order both engines share. NOTE the global
    // ntile sorts one partition; at 100 TB the quartile thresholds would
    // come from the GK-quantile rollup state and broadcast instead —
    // this gate pins the segmentation SEMANTICS.
    "rfm_segments" -> ((s, dir) => {
      val purchases = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("value"))
      val anchor = purchases.agg(max(col("ts")).as("anchor"))
      val per = purchases.crossJoin(broadcast(anchor))
        .groupBy(col("user_id"))
        .agg(
          datediff(to_date(first(col("anchor"))), to_date(max(col("ts"))))
            .as("recency_days"),
          count(lit(1)).as("frequency"),
          sum(round(col("value") * 100.0, 0).cast("long")).as("monetary_cents"))
      // r13: the three quartile passes ride the DISTRIBUTED ntile
      // (range partition + driver offsets — Ranking.ntile), not an
      // unpartitioned window: the per-user frame is user-cardinality
      // sized, which at 100 TB is a 10⁸-row SinglePartition sort in the
      // old shape. Three rank passes + hash joins back on user_id —
      // more absolute work at toy SF, the only shape that scales.
      graft.core.Caching.withCached(per) {
        def quart(c: String, ascBest: Boolean, out: String) = {
          val o = if (ascBest) Seq(col(c).asc, col("user_id").asc)
            else Seq(col(c).desc, col("user_id").asc)
          graft.operators.Ranking.ntile(per.select(col("user_id"), col(c)),
              4, o, bucketCol = out)
            .select(col("user_id"), col(out))
        }
        per
          .join(quart("recency_days", ascBest = true, "r_q"), "user_id")
          .join(quart("frequency", ascBest = false, "f_q"), "user_id")
          .join(quart("monetary_cents", ascBest = false, "m_q"), "user_id")
          .select(col("user_id"), col("recency_days").cast("long").as("recency_days"),
            col("frequency"),
            (col("monetary_cents") / 100.0).as("monetary"),
            concat(col("r_q").cast("string"), col("f_q").cast("string"),
              col("m_q").cast("string")).as("rfm"))
          .orderBy(col("user_id"))
          .localCheckpoint() // pin: `per` unpersists when this scope exits
      }
    }),

    // Time-series GAP FILL + linear interpolation: premium orders
    // (totalprice > 400k) land on ~half the calendar days; every missing
    // day gets prev + (next−prev)·(pos/len) between its observed
    // neighbors (exact-cent endpoints, one double expression both
    // engines compute identically). r14 (VERDICT r13 task #8): the
    // prev/next scan is no longer an unpartitioned window — observed days
    // get a distributed global rank, consecutive ranks pair by equi-join
    // into [prev_d, next_d) intervals, and each interval EMITS its gap
    // days via sequence-explode (which also generates the slot calendar,
    // so the old slots×obs left join disappears too). Slots span
    // min..max observed day, so every slot has both neighbors by
    // construction — the old edge branches never fired and need no
    // analog here.
    "gap_fill_interpolate" -> ((s, dir) => {
      val obs = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice") * 100.0, 0).cast("long"))
          .as("rev_cents"))
      val ranked = graft.operators.Ranking.globalRowNumber(
          obs, Seq(col("day")), rankCol = "rk")
        .select(col("day").as("prev_d"), col("rev_cents").as("prev_v"), col("rk"))
      val nxt = ranked.select((col("rk") - 1).as("rk"),
        col("prev_d").as("next_d"), col("prev_v").as("next_v"))
      ranked.join(nxt, Seq("rk"), "left") // last observed day: next_* null
        .select(col("prev_d"), col("prev_v"), col("next_d"), col("next_v"),
          explode(expr(
            "sequence(prev_d, coalesce(date_sub(next_d, 1), prev_d), interval 1 day)"))
            .as("day"))
        .withColumn("filled_cents",
          when(col("day") === col("prev_d"), col("prev_v"))
            .otherwise(round(
              col("prev_v") + (col("next_v") - col("prev_v")) *
                datediff(col("day"), col("prev_d")).cast("double") /
                datediff(col("next_d"), col("prev_d")).cast("double"), 0)
              .cast("long")))
        .select(unix_millis(col("day").cast("timestamp")).as("day_ms"),
          (col("day") === col("prev_d")).cast("int").as("observed"),
          (col("filled_cents") / 100.0).as("revenue"))
        .orderBy(col("day_ms"))
    }),

    // Z-score anomaly detection on the daily revenue series. Mean and
    // variance come from EXACT integer moments with one fixed-order double
    // expression, so the z values — and the |z| > 2.5 boundary — are
    // bit-identical in both engines, unlike a built-in stddev whose
    // accumulation order floats. The moments accumulate as decimal(38,0):
    // a bigint second moment wraps SILENTLY in non-ANSI Spark once daily
    // revenue reaches ~9e7 (sf≥1: sum of ~2.4k squares of ~8e15 ≈ 2e19 >
    // Long.MaxValue) while DuckDB promotes BIGINT sums to HUGEINT — the
    // decimal path matches that promotion exactly (both convert the same
    // exact integer to double with IEEE round-to-nearest at the end).
    // The moments are a 1-row broadcast; no second pass, no window.
    "revenue_anomalies" -> ((s, dir) => {
      val daily = Tables.orders(s, dir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(round(col("o_totalprice"), 0).cast("long")).as("rev_d"))
      val revDec = col("rev_d").cast("decimal(38,0)")
      val mo = daily.agg(count(lit(1)).as("n"), sum(revDec).as("s1"),
        sum(revDec * revDec).as("s2"))
      val z = (col("rev_d") - col("s1").cast("double") / col("n")) /
        sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("n")) /
          (col("n") - 1L))
      daily.crossJoin(broadcast(mo))
        .withColumn("z", z)
        .filter(abs(col("z")) > 2.5)
        .select(unix_millis(col("day").cast("timestamp")).as("day_ms"),
          col("rev_d").as("revenue"), col("z"))
        .orderBy(col("day_ms"))
    }),

    // Exponentially-weighted trailing revenue: daily order revenue (exact
    // cents) convolved with 0.5^age over a 30-day window. Facts collapse
    // to the day grain FIRST; the range self-join then runs on a
    // dimension whose size is fixed by the calendar, not the SF.
    "ema_daily_revenue" -> ((s, dir) => {
      val daily = emaDaily(s, dir)
      // cache the day-grain frame (|days| rows): the self range join
      // otherwise compiles TWO subtrees that each re-aggregate the whole
      // fact table -- at the 105M-row bench point that one duplicate scan
      // was the entire gap to DuckDB (2.5 s -> 1.4 s)
      graft.core.Caching.withCached(daily) {
        emaJoined(daily).localCheckpoint()
      }
    })
  )

  /** ema interior, split so plan-shape specs can assert on the
    * pre-checkpoint tree (the gate wraps it in withCached +
    * localCheckpoint). floor(x*100 + 0.5), not round(x*100): Spark's
    * Round on DoubleType allocates a BigDecimal PER ROW (measured: the
    * dominant per-row cost of the 105M-row bench point); floor is a
    * native op returning LONG and agrees with both Spark round (HALF_UP)
    * and DuckDB round (half-away) on positive near-integer cent values
    * -- prices carry 2 decimals, so x*100 is never near a half boundary. */
  private[graft] def emaDaily(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5)).as("rev_cents"))

  private[graft] def emaJoined(daily: DataFrame): DataFrame = {
    val a = daily.select(col("day"), col("rev_cents"))
    val b = daily.select(col("day").as("bday"), col("rev_cents").as("brev"))
    a.join(b, datediff(col("day"), col("bday")).between(0, 29))
      .groupBy(col("day"), col("rev_cents"))
      // round() before the long cast: Spark's double->long cast truncates
      // while DuckDB's rounds -- the explicit round makes both exact on
      // the already-exact product (cents x a power of two)
      .agg(sum(round(col("brev") *
          pow(lit(0.5), datediff(col("day"), col("bday")).cast("double")), 0)
        .cast("long")).as("ew_cents"))
      .select(unix_millis(col("day").cast("timestamp")).as("day_ms"),
        (col("rev_cents") / 100.0).as("revenue"),
        (col("ew_cents") / 100.0).as("ew_revenue"))
      .orderBy(col("day_ms"))
  }

  def oracles: Map[String, String] = Map(
    "funnel_steps" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > t1.t1
        |    AND e.ts <= t1.t1 + INTERVAL 7 DAY GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > t2.t2
        |    AND e.ts <= t2.t2 + INTERVAL 7 DAY GROUP BY 1)
        |SELECT st, users FROM (
        |  SELECT '1_view' AS st, count(*) AS users FROM t1
        |  UNION ALL SELECT '2_click', count(*) FROM t2
        |  UNION ALL SELECT '3_purchase', count(*) FROM t3)
        |ORDER BY st""".stripMargin,
    "cohort_retention" ->
      """WITH first_touch AS (
        |  SELECT user_id, date_trunc('week', min(ts)::TIMESTAMP) AS cohort_week
        |  FROM events GROUP BY 1)
        |SELECT epoch_ms(cohort_week) AS cohort_week_ms,
        |  CAST(floor((epoch_ms(date_trunc('week', e.ts::TIMESTAMP))
        |    - epoch_ms(cohort_week)) / 604800000.0) AS BIGINT) AS week_offset,
        |  count(DISTINCT e.user_id) AS active_users
        |FROM events e JOIN first_touch f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "pagerank_trade" ->
      """WITH pairs AS (
        |  SELECT DISTINCT 'c' || o_custkey AS a, 's' || l_suppkey AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION ALL SELECT b AS src, a AS dst FROM pairs),
        |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
        |r0 AS (SELECT src AS node, 1.0 AS rank FROM deg),
        |r1 AS (
        |  SELECT e.dst AS node,
        |    0.15 + 0.85 * (sum(CAST(round(r.rank / deg.d * 1e9) AS BIGINT)) / 1e9) AS rank
        |  FROM edges e JOIN r0 r ON e.src = r.node JOIN deg ON deg.src = e.src
        |  GROUP BY 1),
        |r2 AS (
        |  SELECT e.dst AS node,
        |    0.15 + 0.85 * (sum(CAST(round(r.rank / deg.d * 1e9) AS BIGINT)) / 1e9) AS rank
        |  FROM edges e JOIN r1 r ON e.src = r.node JOIN deg ON deg.src = e.src
        |  GROUP BY 1),
        |r3 AS (
        |  SELECT e.dst AS node,
        |    0.15 + 0.85 * (sum(CAST(round(r.rank / deg.d * 1e9) AS BIGINT)) / 1e9) AS rank
        |  FROM edges e JOIN r2 r ON e.src = r.node JOIN deg ON deg.src = e.src
        |  GROUP BY 1)
        |SELECT node, rank FROM r3 ORDER BY rank DESC, node LIMIT 25""".stripMargin,
    "dq_constraints" ->
      """WITH v AS (
        |  SELECT 'orders.o_orderkey.not_null' AS check_name,
        |    (SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS violations
        |  UNION ALL SELECT 'orders.o_orderkey.unique',
        |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |  UNION ALL SELECT 'orders.o_totalprice.positive',
        |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0.0)
        |  UNION ALL SELECT 'orders.o_orderstatus.in_set',
        |    (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('F','O','P'))
        |  UNION ALL SELECT 'lineitem.l_discount.range_0_01',
        |    (SELECT count(*) FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.1)
        |  UNION ALL SELECT 'lineitem.l_quantity.range_1_50',
        |    (SELECT count(*) FROM lineitem WHERE l_quantity < 1.0 OR l_quantity > 50.0)
        |  UNION ALL SELECT 'lineitem.l_tax.max_005',
        |    (SELECT count(*) FROM lineitem WHERE l_tax > 0.05)
        |  UNION ALL SELECT 'lineitem.l_orderkey.ref_orders',
        |    (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
        |  UNION ALL SELECT 'lineitem.per_order.max_7_lines',
        |    (SELECT count(*) FROM (SELECT l_orderkey FROM lineitem
        |     GROUP BY 1 HAVING count(*) > 7)))
        |SELECT check_name, violations,
        |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
        |FROM v ORDER BY check_name""".stripMargin,
    "dq_statistical" ->
      """WITH v AS (
        |  SELECT 'lineitem.l_discount.mean_004_006' AS check_name,
        |    (SELECT CASE WHEN avg(l_discount) < 0.04 OR avg(l_discount) > 0.06
        |       THEN 1 ELSE 0 END FROM lineitem) AS violations
        |  UNION ALL SELECT 'lineitem.l_quantity.mean_low',
        |    (SELECT CASE WHEN avg(l_quantity) < 0.0 OR avg(l_quantity) > 10.0
        |       THEN 1 ELSE 0 END FROM lineitem)
        |  UNION ALL SELECT 'lineitem.l_quantity.stddev_10_20',
        |    (SELECT CASE WHEN stddev_samp(l_quantity) < 10.0
        |       OR stddev_samp(l_quantity) > 20.0 THEN 1 ELSE 0 END FROM lineitem)
        |  UNION ALL SELECT 'orders.o_totalprice.z3',
        |    (SELECT count(*) FROM orders,
        |       (SELECT avg(o_totalprice) AS m, stddev_samp(o_totalprice) AS s
        |        FROM orders) st
        |     WHERE st.s > 0 AND abs(o_totalprice - st.m) > 3.0 * st.s))
        |SELECT check_name, CAST(violations AS BIGINT) AS violations,
        |  CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
        |FROM v ORDER BY check_name""".stripMargin,
    "event_transitions" ->
      """WITH p AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type AS next_type, count(*) AS n
        |      FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, sum(n) AS row_total FROM c GROUP BY 1)
        |SELECT c.prev_type, c.next_type, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) / CAST(row_total AS DOUBLE) AS p
        |FROM c JOIN t USING (prev_type) ORDER BY 1, 2""".stripMargin,
    "rfm_segments" ->
      """WITH pur AS (
        |  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT max(ts) AS anchor FROM pur),
        |per AS (
        |  SELECT user_id,
        |    datediff('day', CAST(max(ts) AS DATE),
        |      CAST((SELECT anchor FROM a) AS DATE)) AS recency_days,
        |    count(*) AS frequency,
        |    sum(CAST(round(value * 100.0) AS BIGINT)) AS monetary_cents
        |  FROM pur GROUP BY 1)
        |SELECT user_id, recency_days, CAST(frequency AS BIGINT) AS frequency,
        |  monetary_cents / 100.0 AS monetary,
        |  CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS VARCHAR) ||
        |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS VARCHAR) ||
        |  CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS VARCHAR)
        |    AS rfm
        |FROM per ORDER BY user_id""".stripMargin,
    "gap_fill_interpolate" ->
      """WITH obs AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS rev_cents
        |  FROM orders WHERE o_totalprice > 400000.0 GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM obs),
        |slots AS (
        |  SELECT CAST(unnest(generate_series(d0::TIMESTAMP, d1::TIMESTAMP,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b),
        |j AS (SELECT s.day, o.rev_cents FROM slots s LEFT JOIN obs o ON s.day = o.day),
        |f AS (
        |  SELECT day, rev_cents,
        |    last_value(rev_cents IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    last_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
        |    first_value(rev_cents IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    first_value(CASE WHEN rev_cents IS NOT NULL THEN day END IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
        |  FROM j)
        |SELECT epoch_ms(day::TIMESTAMP) AS day_ms,
        |  CAST(CASE WHEN rev_cents IS NOT NULL THEN 1 ELSE 0 END AS INT) AS observed,
        |  CASE
        |    WHEN rev_cents IS NOT NULL THEN rev_cents
        |    WHEN prev_v IS NULL THEN next_v
        |    WHEN next_v IS NULL THEN prev_v
        |    ELSE CAST(round(prev_v + (next_v - prev_v)
        |      * CAST(datediff('day', prev_d, day) AS DOUBLE)
        |      / CAST(datediff('day', prev_d, next_d) AS DOUBLE)) AS BIGINT)
        |  END / 100.0 AS revenue
        |FROM f ORDER BY day_ms""".stripMargin,
    "revenue_anomalies" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    sum(CAST(round(o_totalprice) AS BIGINT)) AS rev_d
        |  FROM orders GROUP BY 1),
        |s AS (
        |  SELECT count(*) AS n, sum(rev_d) AS s1,
        |    sum(rev_d::HUGEINT * rev_d::HUGEINT) AS s2
        |  FROM daily)
        |SELECT epoch_ms(day::TIMESTAMP) AS day_ms,
        |  CAST(rev_d AS BIGINT) AS revenue,
        |  (rev_d - CAST(s1 AS DOUBLE) / n)
        |    / sqrt((CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1)) AS z
        |FROM daily, s
        |WHERE abs((rev_d - CAST(s1 AS DOUBLE) / n)
        |    / sqrt((CAST(s2 AS DOUBLE)
        |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1))) > 2.5
        |ORDER BY day_ms""".stripMargin,
    "ema_daily_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    -- floor(x*100 + 0.5), bit-identical to the Spark side's
        |    -- formula (round(x*100) can differ when x*100+0.5 rounds up
        |    -- in double arithmetic though frac < 0.5)
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT epoch_ms(a.day::TIMESTAMP) AS day_ms,
        |  a.rev_cents / 100.0 AS revenue,
        |  sum(CAST(round(b.rev_cents * power(0.5, datediff('day', b.day, a.day))) AS BIGINT))
        |    / 100.0 AS ew_revenue
        |FROM daily a JOIN daily b
        |  ON datediff('day', b.day, a.day) BETWEEN 0 AND 29
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin
  )
}
