package graft.queries

import graft.core.Tables
import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gates for the sketch-rollup operators ([[graft.operators.Sketches]]):
  * HLL distinct counts and GK quantiles as mergeable commit-log state.
  *
  * Gate design (the `approx_stats_check` pattern for approximate
  * operators): the rollup's EXACT side — group coverage and the
  * incrementally-maintained per-group row counts — hash-matches DuckDB's
  * recompute, while the sketch readout is pinned as a BOOLEAN contract
  * the oracle expects TRUE (HLL: |est − exact| ≤ max(5 %, 1); GK: the
  * two-sided rank bound). A drifted estimate, a lost batch, a
  * non-idempotent replay, or a mis-merged group all flip a hashed cell.
  */
object SketchOps {

  /** Shifted 3-month event stream + the rollup build shared by the
    * gates: three incremental batches (split by event_id % 3) through the
    * sketch table, with the middle batch REPLAYED under its original
    * token — the no-op must leave counts exact. `update` is the rollup
    * family member under test (HLL distinct / GK quantile). */
  private def buildRollup(s: SparkSession, dir: String,
      update: (DataFrame, String, java.sql.Timestamp, Option[String]) => Unit)
      : (DataFrame, String) = {
    // one shared input feeds three batch derivations plus the readout's
    // exact side — persist it once (the update cycles being measured are
    // the state maintenance, not four re-reads of the same fact scan)
    val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"))
      .withColumn("ev_month", date_format(col("ts"), "yyyy-MM"))
      .persist()
    val table = java.nio.file.Files
      .createTempDirectory("graft_sketch").toString + "/rollup"
    val t0 = 1704067200000L // 2024-01-01T00:00Z
    (0 until 3).foreach { b =>
      update(ev.filter(pmod(col("event_id"), lit(3)) === b), table,
        new java.sql.Timestamp(t0 + b * 3600000L), Some(s"sk-$b"))
    }
    update(ev.filter(pmod(col("event_id"), lit(3)) === 1), table, // replay:
      new java.sql.Timestamp(t0 + 3600000L), Some("sk-1"))        // no-op
    (ev, table)
  }

  private def buildDistinct(s: SparkSession, dir: String): (DataFrame, String) =
    buildRollup(s, dir, (b, t, at, tok) => Sketches.updateDistinctRollup(
      b, t, Seq("ev_month", "event_type"), "user_id", at, token = tok))

  private def buildQuantile(s: SparkSession, dir: String): (DataFrame, String) =
    buildRollup(s, dir, (b, t, at, tok) => Sketches.updateQuantileRollup(
      b, t, Seq("ev_month", "event_type"), "value", at, token = tok))

  private def estOk(est: org.apache.spark.sql.Column,
                    exact: org.apache.spark.sql.Column) =
    (abs(est - exact) <= greatest(exact * lit(0.05), lit(1.0))).as("est_ok")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // stored-grain readout: (month, type) rows with the table's exact
    // n_rows and the estimate-tolerance boolean
    "sketch_distinct_rollup" -> ((s, dir) => {
      val (ev, table) = buildDistinct(s, dir)
      val exact = ev.groupBy("ev_month", "event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      // broadcast: both sides are a handful of group rows — an AQE
      // shuffle join would spend more jobs than the whole readout
      Sketches.estimates(s, table, Seq("ev_month", "event_type"))
        .join(broadcast(exact), Seq("ev_month", "event_type"))
        .select(col("ev_month"), col("event_type"), col("n_rows"),
          estOk(col("distinct_est"), col("n_exact")))
    }),

    // coarser-grain re-aggregation from sketches alone — the union-only
    // query exact distinct cannot answer without re-reading facts: per
    // event_type across all months, straight off the state table
    "sketch_union_across" -> ((s, dir) => {
      val (ev, table) = buildDistinct(s, dir)
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      Sketches.estimateAcross(s, table, Seq("event_type"))
        .join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_rows"),
          estOk(col("distinct_est"), col("n_exact")))
    }),

    // bottom-k (KMV) sample rollup — the strongest contract in the
    // family: "the 32 distinct doc ids with the smallest md5 hashes per
    // lang" is a pure function of the id set, independent of arrival
    // order, partitioning and merge tree, and md5 exists in both
    // engines — so the FULL incrementally-maintained sample hash-matches
    // DuckDB's recompute, rank by rank (no tolerance boolean anywhere).
    "sketch_sample_rollup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
      val table = java.nio.file.Files
        .createTempDirectory("graft_sketch_bk").toString + "/rollup"
      val t0 = 1704067200000L
      (0 until 3).foreach { b =>
        Sketches.updateSampleRollup(
          docs.filter(pmod(col("doc_id"), lit(3)) === b), table,
          Seq("lang"), "doc_id", new java.sql.Timestamp(t0 + b * 3600000L),
          k = 32, token = Some(s"bk-$b"))
      }
      Sketches.updateSampleRollup( // replayed batch: token → no-op
        docs.filter(pmod(col("doc_id"), lit(3)) === 1), table,
        Seq("lang"), "doc_id", new java.sql.Timestamp(t0 + 3600000L),
        k = 32, token = Some("bk-1"))
      Sketches.sampleItems(s, table, Seq("lang"))
        .select(col("lang"), col("n_rows"),
          col("sample_rank").cast("long").as("sample_rank"), col("item"))
    }),

    // Misra–Gries heavy-hitter rollup: per-lang frequent tokens through
    // three incremental batches + a replay. Contract rows are the EXACT
    // heavy set (share ≥ 1/64 of the lang's tokens — integer-arithmetic
    // threshold both engines compute identically); for each, the sketch
    // must CONTAIN the token (guaranteed: the worst-case undercount
    // bound is n/257 < n/64) with est ≤ true ≤ est + bound. Booleans
    // are deterministic under any merge tree — the MG bound is
    // worst-case, not probabilistic.
    "sketch_topk_rollup" -> ((s, dir) => {
      val toks = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      val table = java.nio.file.Files
        .createTempDirectory("graft_sketch_mg").toString + "/rollup"
      val t0 = 1704067200000L
      (0 until 3).foreach { b =>
        Sketches.updateTopKRollup(
          toks.filter(pmod(col("doc_id"), lit(3)) === b), table,
          Seq("lang"), "token", new java.sql.Timestamp(t0 + b * 3600000L),
          k = 256, token = Some(s"mg-$b"))
      }
      Sketches.updateTopKRollup( // replayed batch: token → no-op
        toks.filter(pmod(col("doc_id"), lit(3)) === 1), table,
        Seq("lang"), "token", new java.sql.Timestamp(t0 + 3600000L),
        k = 256, token = Some("mg-1"))
      val est = Sketches.topK(s, table, Seq("lang"))
        .select(col("lang"), col("item").as("token"), col("est"), col("bound"))
      val exact = toks.groupBy("lang", "token")
        .agg(count(lit(1)).as("true_count"))
      val nLang = toks.groupBy("lang").agg(count(lit(1)).as("n_lang"))
      exact.join(broadcast(nLang), "lang")
        .filter(col("true_count") * 64 >= col("n_lang"))
        .join(est, Seq("lang", "token"), "left")
        .select(col("lang"), col("token"), col("true_count"),
          col("est").isNotNull.as("present_ok"),
          (col("est").isNotNull && col("est") <= col("true_count") &&
            col("true_count") <= col("est") + col("bound")).as("err_ok"))
    }),

    // GK quantile rollup at the stored grain: n_rows hash-matches; the
    // p50/p95 readouts are pinned by a TWO-SIDED RANK check against the
    // raw values (strictly-below count can't exceed (p+tol)·n, at-or-
    // below count must reach (p−tol)·n) — the exact shape of the GK
    // guarantee, so a drifted sketch or a bad merge flips a boolean
    "sketch_quantile_rollup" -> ((s, dir) => {
      val (ev, table) = buildQuantile(s, dir)
      val est = Sketches.quantiles(s, table,
          Seq("ev_month", "event_type"), Seq(0.5, 0.95))
        .select(col("ev_month"), col("event_type"), col("n_rows"),
          col("quantiles")(0).as("p50"), col("quantiles")(1).as("p95"))
      quantileRankCheck(ev, est, Seq("ev_month", "event_type"))
    }),

    // coarser grain by GK merge over state rows — per type across all
    // months, no pass over facts; same rank contract vs the raw values
    "sketch_quantile_union" -> ((s, dir) => {
      val (ev, table) = buildQuantile(s, dir)
      val est = Sketches.quantilesAcross(s, table,
          Seq("event_type"), Seq(0.5, 0.95))
        .select(col("event_type"), col("n_rows"),
          col("quantiles")(0).as("p50"), col("quantiles")(1).as("p95"))
      quantileRankCheck(ev, est, Seq("event_type"))
    }),

    // MG heavy hitters at a COARSER grain: global frequent tokens from a
    // merge of the per-lang sketches alone — no pass over facts (the MG
    // family's analog of sketch_union_across / sketch_quantile_union).
    // Contract: every token with global share ≥ 1/64 must be present
    // (merged worst-case undercount ≤ n/257 < n/64) with
    // est ≤ true ≤ est + bound.
    "sketch_topk_union" -> ((s, dir) => {
      val toks = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("token"))
      val table = java.nio.file.Files
        .createTempDirectory("graft_sketch_mgu").toString + "/rollup"
      val t0 = 1704067200000L
      (0 until 3).foreach { b =>
        Sketches.updateTopKRollup(
          toks.filter(pmod(col("doc_id"), lit(3)) === b), table,
          Seq("lang"), "token", new java.sql.Timestamp(t0 + b * 3600000L),
          k = 256, token = Some(s"mgu-$b"))
      }
      val est = Sketches.topKAcross(s, table, Seq.empty)
        .select(col("item").as("token"), col("est"), col("bound"))
      val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("true_count"))
      val nAll = toks.agg(count(lit(1)).as("n_all"))
      exact.crossJoin(broadcast(nAll))
        .filter(col("true_count") * 64 >= col("n_all"))
        .join(est, Seq("token"), "left")
        .select(col("token"), col("true_count"),
          col("est").isNotNull.as("present_ok"),
          (col("est").isNotNull && col("est") <= col("true_count") &&
            col("true_count") <= col("est") + col("bound")).as("err_ok"))
    }),

    // KMV SET OPERATIONS on sample-rollup state: pairwise Jaccard /
    // intersection estimates between groups — the readout HLL union
    // cannot provide. Items are word trigrams per language (distinct
    // vocabularies with real partial overlap, J≈0.06–0.08); the rollup
    // builds through three incremental batches + a token replay, then
    // the estimator runs on STATE ALONE. Because the bottom-k order is
    // md5-hex (+ item tiebreak), the estimate — not just a tolerance
    // boolean — hash-matches DuckDB's replay exactly; `within_tol`
    // additionally pins |est − true| ≤ 0.08 (σ ≈ √(J(1−J)/128) ≈ 0.024).
    "sketch_jaccard_rollup" -> ((s, dir) => {
      val tri = Tables.documents(s, dir)
        .withColumn("a", split(col("text"), " "))
        .select(col("doc_id"), col("lang"),
          explode(expr(
            """CASE WHEN size(a) >= 3
              |THEN transform(sequence(1, size(a) - 2), i ->
              |  concat_ws(' ', element_at(a, i), element_at(a, i + 1),
              |    element_at(a, i + 2)))
              |ELSE array() END""".stripMargin)).as("item"))
      val table = java.nio.file.Files
        .createTempDirectory("graft_sketch_jac").toString + "/rollup"
      val t0 = 1704067200000L
      (0 until 3).foreach { b =>
        Sketches.updateSampleRollup(
          tri.filter(pmod(col("doc_id"), lit(3)) === b), table,
          Seq("lang"), "item", new java.sql.Timestamp(t0 + b * 3600000L),
          k = 128, token = Some(s"jac-$b"))
      }
      Sketches.updateSampleRollup( // replayed batch: token → no-op
        tri.filter(pmod(col("doc_id"), lit(3)) === 1), table,
        Seq("lang"), "item", new java.sql.Timestamp(t0 + 3600000L),
        k = 128, token = Some("jac-1"))
      val est = Sketches.jaccardAcross(s, table, "lang", 128)
      // exact side (facts) for the tolerance contract
      val sets = tri.select(col("lang"), col("item")).distinct()
      val sizes = sets.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val inter = sets.select(col("lang").as("ia"), col("item"))
        .join(sets.select(col("lang").as("ib"), col("item")), Seq("item"))
        .filter(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("i"))
      est
        .join(broadcast(sizes.select(col("lang").as("lang_a"), col("n").as("na"))),
          Seq("lang_a"))
        .join(broadcast(sizes.select(col("lang").as("lang_b"), col("n").as("nb"))),
          Seq("lang_b"))
        .join(broadcast(inter.select(col("ia").as("lang_a"),
          col("ib").as("lang_b"), col("i"))), Seq("lang_a", "lang_b"), "left")
        .withColumn("jaccard_true",
          coalesce(col("i"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("i"), lit(0L))).cast("double"))
        .withColumn("within_tol",
          (abs(col("jaccard_est") - col("jaccard_true")) <= 0.08).cast("int"))
        .select(col("lang_a"), col("lang_b"), col("k_eff"), col("overlap_k"),
          col("jaccard_est"), col("jaccard_true"), col("within_tol"))
        .orderBy(col("lang_a"), col("lang_b"))
    })
  )

  /** Two-sided rank contract for a (p50, p95) readout joined back onto
    * the raw values. tol = 5·ε: the single-sketch GK bound is ε, merges
    * can widen it (Spark's QuantileSummaries merge takes the max and the
    * literature bound for GK merging is ~2ε), and the partial-combine
    * order inside an aggregate is nondeterministic — the contract must
    * hold for EVERY merge tree, so it carries headroom while still
    * pinning a real bound. */
  private def quantileRankCheck(ev: DataFrame, est: DataFrame,
                                keys: Seq[String]): DataFrame = {
    val tol = 0.05
    def rankOk(p: Double, lt: String, le: String) =
      (col(lt) <= (lit(p) + tol) * col("n")) &&
        (col(le) >= (lit(p) - tol) * col("n"))
    ev.join(broadcast(est), keys)
      .groupBy(keys.map(col): _*)
      .agg(first(col("n_rows")).as("n_rows"), count(col("value")).as("n"),
        sum(when(col("value") < col("p50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("value") <= col("p50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("value") < col("p95"), 1L).otherwise(0L)).as("lt95"),
        sum(when(col("value") <= col("p95"), 1L).otherwise(0L)).as("le95"))
      .select(keys.map(col) :+ col("n_rows") :+
        rankOk(0.5, "lt50", "le50").as("p50_ok") :+
        rankOk(0.95, "lt95", "le95").as("p95_ok"): _*)
  }

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
        |FROM events GROUP BY 1""".stripMargin,
    "sketch_quantile_rollup" ->
      """WITH ev AS (
        |  SELECT ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts,
        |    value, event_type
        |  FROM events)
        |SELECT strftime(ts, '%Y-%m') AS ev_month, event_type,
        |  CAST(count(value) AS BIGINT) AS n_rows,
        |  TRUE AS p50_ok, TRUE AS p95_ok
        |FROM ev GROUP BY 1, 2""".stripMargin,
    "sketch_quantile_union" ->
      """SELECT event_type, CAST(count(value) AS BIGINT) AS n_rows,
        |  TRUE AS p50_ok, TRUE AS p95_ok
        |FROM events GROUP BY 1""".stripMargin,
    "sketch_sample_rollup" ->
      """WITH h AS (
        |  SELECT lang, CAST(doc_id AS VARCHAR) AS item,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      AS hash
        |  FROM documents),
        |r AS (
        |  SELECT lang, item,
        |    row_number() OVER (PARTITION BY lang ORDER BY hash, item) - 1
        |      AS rn,
        |    count(*) OVER (PARTITION BY lang) AS nl
        |  FROM h)
        |SELECT lang, CAST(nl AS BIGINT) AS n_rows,
        |  CAST(rn AS BIGINT) AS sample_rank, item
        |FROM r WHERE rn < 32""".stripMargin,
    "sketch_topk_rollup" ->
      """WITH t AS (
        |  SELECT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |n AS (SELECT lang, count(*) AS nl FROM t GROUP BY 1),
        |c AS (SELECT lang, token, count(*) AS tc FROM t GROUP BY 1, 2)
        |SELECT c.lang, token, CAST(tc AS BIGINT) AS true_count,
        |  TRUE AS present_ok, TRUE AS err_ok
        |FROM c JOIN n USING (lang) WHERE tc * 64 >= nl""".stripMargin,
    "sketch_topk_union" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        |n AS (SELECT count(*) AS na FROM t),
        |c AS (SELECT token, count(*) AS tc FROM t GROUP BY 1)
        |SELECT token, CAST(tc AS BIGINT) AS true_count,
        |  TRUE AS present_ok, TRUE AS err_ok
        |FROM c, n WHERE tc * 64 >= na""".stripMargin,
    "sketch_jaccard_rollup" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS a FROM documents),
        |tri AS (
        |  SELECT DISTINCT lang,
        |    unnest(list_transform(list_zip(a[1:-3], a[2:-2], a[3:-1]),
        |      p -> p[1] || ' ' || p[2] || ' ' || p[3])) AS item
        |  FROM t),
        |sk AS (
        |  SELECT lang, item,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY substr(md5(item), 1, 16), item) AS rn
        |  FROM tri),
        |samp AS (SELECT lang, item FROM sk WHERE rn <= 128),
        |langs AS (SELECT DISTINCT lang FROM samp),
        |pairs AS (
        |  SELECT a.lang AS ga, b.lang AS gb FROM langs a, langs b
        |  WHERE a.lang < b.lang),
        |cand AS (
        |  SELECT ga, gb, item, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        |    SELECT p.ga, p.gb, s.item, 1 AS in_a, 0 AS in_b
        |    FROM pairs p JOIN samp s ON s.lang = p.ga
        |    UNION ALL
        |    SELECT p.ga, p.gb, s.item, 0 AS in_a, 1 AS in_b
        |    FROM pairs p JOIN samp s ON s.lang = p.gb)
        |  GROUP BY 1, 2, 3),
        |rk AS (
        |  SELECT ga, gb, in_a, in_b,
        |    row_number() OVER (PARTITION BY ga, gb
        |      ORDER BY substr(md5(item), 1, 16), item) AS rn
        |  FROM cand),
        |est AS (
        |  SELECT ga, gb, count(*) AS k_eff, sum(in_a * in_b) AS overlap_k
        |  FROM rk WHERE rn <= 128 GROUP BY 1, 2),
        |sizes AS (SELECT lang, count(*) AS n FROM tri GROUP BY 1),
        |inter AS (
        |  SELECT t1.lang AS ga, t2.lang AS gb, count(*) AS i
        |  FROM tri t1 JOIN tri t2 ON t1.item = t2.item AND t1.lang < t2.lang
        |  GROUP BY 1, 2)
        |SELECT e.ga AS lang_a, e.gb AS lang_b,
        |  CAST(e.k_eff AS BIGINT) AS k_eff,
        |  CAST(e.overlap_k AS BIGINT) AS overlap_k,
        |  CAST(e.overlap_k AS DOUBLE) / CAST(e.k_eff AS DOUBLE) AS jaccard_est,
        |  CAST(COALESCE(i.i, 0) AS DOUBLE)
        |    / CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE) AS jaccard_true,
        |  CAST(CASE WHEN abs(
        |      CAST(e.overlap_k AS DOUBLE) / CAST(e.k_eff AS DOUBLE)
        |      - CAST(COALESCE(i.i, 0) AS DOUBLE)
        |        / CAST(sa.n + sb.n - COALESCE(i.i, 0) AS DOUBLE)) <= 0.08
        |    THEN 1 ELSE 0 END AS INT) AS within_tol
        |FROM est e
        |JOIN sizes sa ON sa.lang = e.ga
        |JOIN sizes sb ON sb.lang = e.gb
        |LEFT JOIN inter i ON i.ga = e.ga AND i.gb = e.gb
        |ORDER BY lang_a, lang_b""".stripMargin
  )
}
