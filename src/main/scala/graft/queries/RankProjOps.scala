package graft.queries

import graft.core.Tables
import graft.operators.{Projection, Ranking}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gates for the distributed-ranking and dimensionality-reduction
  * operators ([[graft.operators.Ranking]], [[graft.operators.Projection]]).
  *
  * Every gate here is exactly DuckDB-replayable: global ranks and NTILE
  * under a total order are engine-independent, the covariance is rounded
  * at the cross-engine fixed point (6 dp), and the JL matrix is
  * md5-derived so the oracle REBUILDS it in SQL — the same content-hash
  * determinism trick the sampling family uses. */
object RankProjOps {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Global row_number over ALL orders (total order: price desc, key) —
    // aggregated per priority so the gate pins EVERY rank, not a top slice.
    // The plan has no SinglePartition exchange (RankingSpec pins it).
    "global_rank_agg" -> ((s, dir) => {
      Ranking.globalRowNumber(Tables.orders(s, dir),
          Seq(col("o_totalprice").desc, col("o_orderkey")), parts = 32)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("rank")).as("rank_sum"), count(lit(1)).as("n"),
          min(col("rank")).as("rank_min"), max(col("rank")).as("rank_max"))
        .orderBy(col("o_orderpriority"))
    }),

    // SQL NTILE(10) semantics at scale: equi-depth deciles of
    // l_extendedprice (tiebreak orderkey, linenumber → total order);
    // per-bucket count and exact value bounds.
    "ntile_deciles" -> ((s, dir) => {
      Ranking.equidepthHistogram(Tables.lineitem(s, dir),
        col("l_extendedprice"), k = 10,
        tiebreak = Seq(col("l_orderkey"), col("l_linenumber")))
    }),

    // SKETCH-path equi-depth: GK boundaries (ε = 0.005, deterministic
    // worst-case rank bound) + codegen assignment — no sort, no range
    // exchange. The contract gate: exact total (oracled), 10 non-empty
    // buckets, every population within the 2εn bound, non-overlapping
    // bounds.
    "equidepth_gk_check" -> ((s, dir) => {
      val (k, eps) = (10, 0.005)
      val rows = Ranking.equidepthApprox(Tables.lineitem(s, dir),
        col("l_extendedprice"), k, eps).collect().sortBy(_.getInt(0))
      val n = rows.map(_.getLong(1)).sum
      val target = n.toDouble / k
      val maxDevOk = rows.map(r => math.abs(r.getLong(1) - target)).max <= 2 * eps * n + 1
      val monotone = rows.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) <= b.getDouble(2) + 1e-9
        case _ => true
      }
      s.createDataFrame(Seq((n, rows.length, maxDevOk, monotone)))
        .toDF("n_total", "k_buckets", "max_dev_ok", "bounds_monotone")
    }),

    // INCREMENTAL equi-depth (VERDICT r11 task #7): month-grain GK state
    // maintained over 3 batches (one replayed — token no-op on both the
    // fact log and the rollup), then RETENTION drops January from facts
    // AND state; boundaries re-read from the merged remaining sketches at
    // O(state) — no fact re-sketch — and must still bucket the retained
    // facts within the 2εn population bound. n_total is DuckDB-oracled;
    // state_matches_facts pins that the state's row count FORGOT exactly
    // the dropped month.
    "incremental_equidepth_check" -> ((s, dir) => {
      import graft.operators.{CommitLog, Sketches}
      val base = java.nio.file.Files.createTempDirectory("graft_ieq").toString
      val (fact, state) = (s"$base/fact", s"$base/qstate")
      val (k, eps) = (10, 0.005)
      val ev = Tables.events(s, dir).select(
          col("event_id"),
          expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"),
          col("value"))
        .withColumn("fmonth", date_format(col("ts"), "yyyy-MM"))
      val at = java.sql.Timestamp.valueOf("2024-04-01 00:00:00")
      def feed(b: Int, tok: String): Unit = {
        // one scan per feed: the fact append and the rollup update are
        // two consumers of the same batch (scan + timestampadd + month
        // derivation ran twice per feed before — guide §1.2 "don't
        // compute things twice"). The two commits hit DIFFERENT tables
        // and neither reads the other's output, so they OVERLAP on two
        // driver threads (guide §2.6) — only the feeds themselves stay
        // ordered (rollup state b merges into state b−1).
        val batch = ev.filter(pmod(col("event_id"), lit(3)) === b)
        graft.core.Caching.withCached(batch) {
          graft.core.Concurrent.all(
            () => { CommitLog.append(batch, fact, idCol = "event_id",
              tsCol = "ts", token = Some(s"f$tok")); () },
            () => Sketches.updateQuantileRollup(batch, state, Seq("fmonth"),
              "value", at, eps = eps, token = Some(s"q$tok")))
        }
      }
      (0 until 3).foreach(b => feed(b, b.toString))
      feed(1, "1") // replayed batch: must no-op or the sketches double-count
      // retention drop: two independent tables again — overlap
      graft.core.Concurrent.all(
        () => { CommitLog.dropMonthsBefore(fact, keepFromMonth = "2024-02"); () },
        () => { CommitLog.deleteWhere(s, state, col("fmonth") < "2024-02",
          idCol = "rollup_id", tsCol = "updated_at"); () })
      val (hist, nState) = graft.operators.Ranking.equidepthFromState(
        s, state, CommitLog.scan(s, fact), col("value"), k)
      val rows = hist.collect().sortBy(_.getInt(0))
      val n = rows.map(_.getLong(1)).sum
      val target = n.toDouble / k
      val maxDevOk = rows.map(r => math.abs(r.getLong(1) - target)).max <= 2 * eps * n + 1
      val monotone = rows.sliding(2).forall {
        case Array(a, b) => a.getDouble(3) <= b.getDouble(2) + 1e-9
        case _ => true
      }
      s.createDataFrame(Seq((n, rows.length, maxDevOk, monotone, nState == n)))
        .toDF("n_total", "k_buckets", "max_dev_ok", "bounds_monotone",
          "state_matches_facts")
    }),

    // GROUPED incremental equi-depth (VERDICT r12 task #7): per-dimension
    // discretization — one boundary scale per event_type — off the SAME
    // maintained rollup state (the state already carries its group
    // columns), same 3-batch + replay + retention-drop maintenance cycle.
    // Verdicts per group: 2εn_g population bound, monotone bounds, and
    // the per-group state-vs-facts count witness.
    "incremental_equidepth_by_type" -> ((s, dir) => {
      import graft.operators.{CommitLog, Sketches}
      val base = java.nio.file.Files.createTempDirectory("graft_ieqg").toString
      val (fact, state) = (s"$base/fact", s"$base/qstate")
      val (k, eps) = (8, 0.005)
      val ev = Tables.events(s, dir).select(
          col("event_id"),
          expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"),
          col("event_type"), col("value"))
        .withColumn("fmonth", date_format(col("ts"), "yyyy-MM"))
      val at = java.sql.Timestamp.valueOf("2024-04-01 00:00:00")
      def feed(b: Int, tok: String): Unit = {
        // one scan per feed (same two-consumer caching as
        // incremental_equidepth_check above), and the same two-table
        // commit overlap (guide §2.6)
        val batch = ev.filter(pmod(col("event_id"), lit(3)) === b)
        graft.core.Caching.withCached(batch) {
          graft.core.Concurrent.all(
            () => { CommitLog.append(batch, fact, idCol = "event_id",
              tsCol = "ts", token = Some(s"f$tok")); () },
            () => Sketches.updateQuantileRollup(batch, state,
              Seq("event_type", "fmonth"), "value", at, eps = eps,
              token = Some(s"q$tok")))
        }
      }
      (0 until 3).foreach(b => feed(b, b.toString))
      feed(1, "1") // replayed batch: must no-op or the sketches double-count
      // retention drop: two independent tables again — overlap
      graft.core.Concurrent.all(
        () => { CommitLog.dropMonthsBefore(fact, keepFromMonth = "2024-02"); () },
        () => { CommitLog.deleteWhere(s, state, col("fmonth") < "2024-02",
          idCol = "rollup_id", tsCol = "updated_at"); () })
      val hist = graft.operators.Ranking.equidepthFromStateBy(
        s, state, Seq("event_type"), CommitLog.scan(s, fact),
        col("value"), k).collect()
      val out = hist.groupBy(_.getString(0)).toSeq.map { case (et, rows0) =>
        val rows = rows0.sortBy(_.getInt(1))
        val n = rows.map(_.getLong(2)).sum
        val target = n.toDouble / k
        val maxDevOk = rows.map(r => math.abs(r.getLong(2) - target)).max <= 2 * eps * n + 1
        val monotone = rows.sliding(2).forall {
          case Array(a, b) => a.getDouble(4) <= b.getDouble(3) + 1e-9
          case _ => true
        }
        (et, n, rows.length, maxDevOk, monotone, rows.head.getLong(5) == n)
      }
      s.createDataFrame(out.sortBy(_._1))
        .toDF("event_type", "n_total", "k_buckets", "max_dev_ok",
          "bounds_monotone", "state_matches_facts")
        .withColumn("k_buckets", col("k_buckets").cast("int"))
        .orderBy(col("event_type"))
    }),

    // One-pass covariance of the first 8 embedding dims via the
    // graft_vec_sum moments aggregate. quantScale makes the GATE exact:
    // coordinates quantize to integers (floor(x·10⁴ + 0.5) — identical in
    // any engine), so both sides sum exact integers and the comparison
    // cannot flake on float summation order (a raw-double sum folds
    // left-to-right here, incrementally in DuckDB's covar_pop — a 1-ulp
    // difference at a 0.5e-6 rounding boundary would flip the 6th dp).
    "pca_covariance" -> ((s, dir) =>
      Projection.covarianceDF(Tables.embeddings(s, dir), "embedding", dim = 8,
          quantScale = Some(1e4))
        .orderBy(col("i"), col("j"))),

    // INCREMENTAL covariance: per-label moments state maintained across
    // three appends (one replayed — token no-op), covariance read from
    // state alone; DuckDB recomputes covar_pop from scratch over ALL rows.
    "incremental_pca_covariance" -> ((s, dir) => {
      import graft.operators.Sketches
      val table = java.nio.file.Files.createTempDirectory("graft_ipca").toString
      // quantized intake (same contract as pca_covariance): the maintained
      // moments are exact integer sums, so state merged across batches is
      // bit-identical to a from-scratch pass REGARDLESS of batch split —
      // exactly the property an incremental-vs-rebuild gate should pin
      val emb = Tables.embeddings(s, dir)
        .withColumn("embedding", Projection.quantizeVec(col("embedding"), 1e4))
      val at = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
      (0 until 3).foreach { b =>
        Sketches.updateMomentsRollup(emb.filter(pmod(col("vec_id"), lit(3)) === b),
          table, Seq("label"), "embedding", dim = 6, at = at, token = Some(s"m$b"))
      }
      // replayed batch: the token must no-op or the moments double-count
      Sketches.updateMomentsRollup(emb.filter(pmod(col("vec_id"), lit(3)) === 1),
        table, Seq("label"), "embedding", dim = 6, at = at, token = Some("m1"))
      Projection.covarianceFromState(s, table, Seq("label"), dim = 6,
          quantScale = Some(1e4))
        .orderBy(col("label"), col("i"), col("j"))
    }),

    // PCA contract check over 16 dims / top-4 components: the eigenvalue
    // mass is DuckDB-verified (Σλ = Σ var_pop — the trace), the
    // eigen-structure invariants (orthonormality, residuals, ordering,
    // λ1 ≥ max single-dim variance) are exact driver-side booleans.
    "pca_check" -> ((s, dir) => {
      val dim = 16
      val (_, _, cov) = Projection.covariance(Tables.embeddings(s, dir), "embedding", dim)
      val (eigs, vecs) = Projection.jacobiEigen(cov)
      val top = vecs.take(4)
      def dot(a: Array[Double], b: Array[Double]): Double =
        a.zip(b).map { case (x, y) => x * y }.sum
      val orthonormalOk = (for (i <- top.indices; j <- top.indices) yield
        math.abs(dot(top(i), top(j)) - (if (i == j) 1.0 else 0.0))).max < 1e-8
      val residualOk = top.indices.forall { i =>
        val v = top(i)
        val cv = Array.tabulate(dim)(r => dot(cov(r), v))
        cv.zip(v).map { case (a, b) => math.abs(a - eigs(i) * b) }.max < 1e-6
      }
      val sortedOk = eigs.sliding(2).forall(p => p(0) >= p(1) - 1e-12)
      val maxVar = (0 until dim).map(i => cov(i)(i)).max
      val l1GeMaxvar = eigs(0) >= maxVar - 1e-9
      val totalVar = BigDecimal(eigs.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      s.createDataFrame(Seq((totalVar, orthonormalOk, residualOk, sortedOk, l1GeMaxvar)))
        .toDF("total_var", "orthonormal_ok", "residual_ok", "sorted_ok", "l1_ge_maxvar")
    }),

    // Johnson–Lindenstrauss ±1 projection 64 → 8, md5-sign matrix —
    // DuckDB rebuilds the matrix from md5() and replays every entry. The
    // quantized variant keeps the 64-term per-component sum in exact LONG
    // arithmetic so the replay is order-independent (same rationale as
    // pca_covariance; the double-path jlProject is pinned against this one
    // in RankProjSpec within quantization error).
    "jl_projection" -> ((s, dir) => {
      Projection.jlProjectQuantized(Tables.embeddings(s, dir), "embedding",
          dim = 64, k = 8, scale = 1e4)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("p", "v")))
        .select(col("vec_id"), (col("p") + 1).cast("long").as("comp"),
          round(col("v"), 6).as("proj"))
        .orderBy(col("vec_id"), col("comp"))
    }))

  def oracles: Map[String, String] = Map(
    "global_rank_agg" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders)
        |SELECT o_orderpriority, CAST(sum(rank) AS BIGINT) AS rank_sum,
        |       count(*) AS n, min(rank) AS rank_min, max(rank) AS rank_max
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "ntile_deciles" ->
      """WITH t AS (
        |  SELECT l_extendedprice,
        |         ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS bucket
        |  FROM lineitem)
        |SELECT bucket, count(*) AS n, min(l_extendedprice) AS lo,
        |       max(l_extendedprice) AS hi
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "equidepth_gk_check" ->
      // count(col), not count(*): equidepthApprox excludes NULL values
      // before bucketing, so the oracle total must pin the NON-NULL count
      // or the gate would fail on a nullable column doing exactly what the
      // operator documents
      """SELECT count(l_extendedprice) AS n_total, CAST(10 AS INT) AS k_buckets,
        |       true AS max_dev_ok, true AS bounds_monotone
        |FROM lineitem""".stripMargin,

    "incremental_equidepth_by_type" ->
      """SELECT event_type, count(*) AS n_total, CAST(8 AS INT) AS k_buckets,
        |       true AS max_dev_ok, true AS bounds_monotone,
        |       true AS state_matches_facts
        |FROM (SELECT event_type, ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts2, value
        |      FROM events)
        |WHERE strftime(ts2::TIMESTAMP, '%Y-%m') >= '2024-02'
        |  AND value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "incremental_equidepth_check" ->
      """SELECT count(*) AS n_total, CAST(10 AS INT) AS k_buckets,
        |       true AS max_dev_ok, true AS bounds_monotone,
        |       true AS state_matches_facts
        |FROM (SELECT ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts2, value
        |      FROM events)
        |WHERE strftime(ts2::TIMESTAMP, '%Y-%m') >= '2024-02'
        |  AND value IS NOT NULL""".stripMargin,

    // Integer-scaled raw-moment replay (NOT covar_pop — its incremental
    // double updates are order-dependent): quantize q = floor(v·10⁴+0.5),
    // sum exact BIGINTs, and mirror the Scala association exactly —
    // (Σqq/n − (Σqᵢ/n)(Σqⱼ/n)) / 10⁸ — so both engines perform the SAME
    // four IEEE divisions on the SAME exact integers.
    "pca_covariance" ->
      """WITH x AS (
        |  SELECT vec_id, i,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 8) AS t(i))
        |SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
        |       round((CAST(sum(a.q * b.q) AS DOUBLE) / count(*)
        |              - (CAST(sum(a.q) AS DOUBLE) / count(*)) * (CAST(sum(b.q) AS DOUBLE) / count(*)))
        |             / 100000000.0, 6) + 0.0 AS cov  -- +0.0: fold -0.0 → 0.0 (Spark's HALF_UP never emits -0.0)
        |FROM x a JOIN x b USING (vec_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "incremental_pca_covariance" ->
      """WITH x AS (
        |  SELECT label, vec_id, i,
        |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 6) AS t(i))
        |SELECT a.label AS label, CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
        |       round((CAST(sum(a.q * b.q) AS DOUBLE) / count(*)
        |              - (CAST(sum(a.q) AS DOUBLE) / count(*)) * (CAST(sum(b.q) AS DOUBLE) / count(*)))
        |             / 100000000.0, 6) + 0.0 AS cov
        |FROM x a JOIN x b USING (vec_id)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "pca_check" ->
      """WITH x AS (
        |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 16) AS t(i))
        |SELECT round(sum(vp), 6) AS total_var, true AS orthonormal_ok,
        |       true AS residual_ok, true AS sorted_ok, true AS l1_ge_maxvar
        |FROM (SELECT var_pop(v) AS vp FROM x GROUP BY i)""".stripMargin,

    // exact-LONG sum of q·(±1), then the SAME two divisions both sides:
    // (Σ / 10⁴) / √8 — order-independent, engine-independent
    "jl_projection" ->
      """WITH m AS (
        |  SELECT i, j,
        |         CASE WHEN substr(md5(i::VARCHAR || '_' || j::VARCHAR), 1, 1) < '8'
        |              THEN 1 ELSE -1 END AS r
        |  FROM generate_series(1, 8) AS s(i), generate_series(1, 64) AS t(j)),
        |x AS (
        |  SELECT vec_id, j,
        |         CAST(floor(CAST(embedding[j] AS DOUBLE) * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM embeddings, generate_series(1, 64) AS t(j))
        |SELECT x.vec_id AS vec_id, CAST(m.i AS BIGINT) AS comp,
        |       round((CAST(sum(x.q * m.r) AS DOUBLE) / 10000.0) / sqrt(8.0), 6) + 0.0 AS proj
        |FROM x JOIN m USING (j)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
