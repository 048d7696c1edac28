package graft.queries

import graft.core.Tables
import graft.operators.{CommitLog, IncrementalAgg, JoinView, Logstore, Scd2, TemporalJoins}
import graft.plans.JsonMatchExpr
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporal-join, Catalyst-extension and storage-roundtrip gate queries. */
object EventOps2 {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // native json_match Expression inside WholeStageCodegen (real doGenCode,
    // one Jackson parse per row — the measured-fastest form).
    "json_filter_native" -> ((s, dir) => {
      JsonMatchExpr.register(s)
      Tables.events(s, dir)
        .filter(expr("""json_match('{"k":{"$lt":30}}', props)"""))
        .select(col("event_id"), col("user_id"),
          get_json_object(col("props"), "$.k").cast("double").as("k"))
        .orderBy(col("event_id"))
    }),

    // $or schema: exercises the evaluator's disjunction walk end-to-end.
    "json_filter_complex" -> ((s, dir) => {
      JsonMatchExpr.register(s)
      Tables.events(s, dir)
        .filter(expr("""json_match('{"$or":[{"k":{"$gte":90}},{"k":{"$lte":5}}]}', props)"""))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),
    // as-of join: for each purchase, the most recent click by the same user
    // at or before it (union + single window pass — one shuffle on user_id).
    "asof_click_before_purchase" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("click_id"))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("asof_click_id").as("prior_click_id"),
          unix_millis(col("asof_ts")).as("prior_click_ms"))
        .orderBy(col("event_id"))
    }),

    // as-of FORWARD with tolerance (pandas merge_asof's other axis): for
    // each purchase, the EARLIEST click at-or-after it, nulled out when
    // the gap exceeds 6 h (row kept — 223 matched / 1758 nulled at
    // sf0.01, both paths exercised). Same union + one-window formulation
    // as the backward form — one shuffle on user_id.
    "asof_forward_tolerance" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      TemporalJoins.asofJoin(purchases, clicks, Seq("user_id"),
          leftTs = "ts", rightTs = "ts", payload = Seq("click_id"),
          direction = "forward", toleranceMillis = Some(21600000L))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"),
          col("asof_click_id").as("next_click_id"),
          unix_millis(col("asof_ts")).as("next_click_ms"))
        .orderBy(col("event_id"))
    }),

    // bounded range join: same-user event pairs within 60 s (bucketed
    // equi-join — no theta-join explosion).
    "range_join_60s" -> ((s, dir) => {
      TemporalJoins.rangeJoinPairs(Tables.events(s, dir),
          keyCol = "user_id", tsCol = "ts", idCol = "event_id",
          windowMillis = 60000L)
        .select(col("k").as("user_id"), col("id_a"), col("id_b"), col("gap_ms"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // storage roundtrip: events → month-partitioned sorted store → pruned
    // scan + aggregate. Exercises the S4 write path inside the gate; the
    // oracle reads the original table, so the roundtrip must be lossless.
    "logstore_roundtrip" -> ((s, dir) => {
      val path = java.nio.file.Files.createTempDirectory("graft_store").toString
      Logstore.insertMany(Tables.events(s, dir)
          .select("event_id", "ts", "user_id", "event_type", "value"),
        path, idCol = "event_id", tsCol = "ts")
      Logstore.scan(s, path)
        .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // the commit-log table format end to end: the SAME batch appended twice
    // (at-least-once ingest), compacted per month (concurrent-writer-safe
    // path), then manifest-planned scan — the aggregate must equal the
    // source exactly (dups gone, nothing lost, nothing resurrected).
    "logstore_commitlog" -> ((s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft_cltx").toString
      val batch = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
      CommitLog.append(batch, table, idCol = "event_id", tsCol = "ts")
      CommitLog.append(batch, table, idCol = "event_id", tsCol = "ts") // replay
      CommitLog.snapshot(table).files.map(_.month).distinct.foreach(m =>
        CommitLog.compactMonth(s, table, m, idCol = "event_id", tsCol = "ts"))
      CommitLog.scan(s, table)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // TIME TRAVEL (Delta VERSION AS OF analog): three monthly batches,
    // then a compaction that REWRITES month 1's files at v4 — reading AS
    // OF v2 must still see exactly batches 0+1 through the pre-compaction
    // file set (log entries are immutable; only vacuum retires history).
    "logstore_time_travel" -> ((s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft_tt").toString
      val docs = Tables.documents(s, dir)
        .withColumn("b", expr("CAST(doc_id % 3 AS INT)"))
        .withColumn("ts", expr("make_timestamp(2024, b + 1, 15, 0, 0, 0)"))
        .select("doc_id", "b", "ts", "source", "n_chars")
      (0 until 3).foreach { b =>
        CommitLog.append(docs.filter(col("b") === b), table,
          idCol = "doc_id", tsCol = "ts")
      }
      CommitLog.compactMonth(s, table, "2024-01", idCol = "doc_id", tsCol = "ts")
      CommitLog.scanAt(s, table, 2L)
        .select(col("doc_id"), col("b"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // ZERO-COPY CLONE: fork the table after two batches, then make the
    // SOURCE diverge hard — a third batch, a row-level delete rewriting
    // files, and a grace-0 vacuum physically reclaiming the rewritten
    // originals. The clone's hardlinks keep the shared inodes alive, so
    // it must still read exactly batches 0+1.
    "logstore_clone" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_clone").toString
      val (src, dst) = (s"$base/src", s"$base/clone")
      val docs = Tables.documents(s, dir)
        .withColumn("b", expr("CAST(doc_id % 3 AS INT)"))
        .withColumn("ts", expr("make_timestamp(2024, b + 1, 15, 0, 0, 0)"))
        .select("doc_id", "b", "ts", "source", "n_chars")
      (0 until 2).foreach { b =>
        CommitLog.append(docs.filter(col("b") === b), src,
          idCol = "doc_id", tsCol = "ts")
      }
      CommitLog.cloneTable(src, dst)
      CommitLog.append(docs.filter(col("b") === 2), src,
        idCol = "doc_id", tsCol = "ts")
      CommitLog.deleteWhere(s, src, col("n_chars") < 500,
        idCol = "doc_id", tsCol = "ts")
      CommitLog.vacuum(src, graceMillis = 0L)
      CommitLog.scan(s, dst)
        .select(col("doc_id"), col("b"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // MANIFEST KEY BLOOMS: a point lookup plans its file set from
    // per-file blooms carried in the log — driver-side membership tests,
    // zero jobs, zero data-file IO before the surviving scan. Three
    // month-separated batches → three files; the hit id lives in exactly
    // one, the miss id in none. `pruned` pins the file-skipping contract
    // (hit scans ≤ 2 of 3 files — its own plus at most one 1 %-fpp false
    // positive; miss scans ≤ 1); rows/n_chars pin the data itself.
    "logstore_point_lookup" -> ((s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft_pl").toString
      val docs = Tables.documents(s, dir)
        .withColumn("b", expr("CAST(doc_id % 3 AS INT)"))
        .withColumn("ts", expr("make_timestamp(2024, b + 1, 15, 0, 0, 0)"))
        .select("doc_id", "b", "ts", "source", "n_chars")
      (0 until 3).foreach { b =>
        CommitLog.append(docs.filter(col("b") === b), table,
          idCol = "doc_id", tsCol = "ts", keyBlooms = true)
      }
      val hitId = 247L
      val missId = 10L * 1000L * 1000L
      val (hs, total) = CommitLog.filesForKey(table, hitId)
      val (ms, _) = CommitLog.filesForKey(table, missId)
      val hitRows = CommitLog.scanForKey(s, table, "doc_id", hitId)
        .select(col("n_chars")).collect()
      val missRows = CommitLog.scanForKey(s, table, "doc_id", missId).count()
      val rows = Seq(
        ("hit", hitRows.length.toLong, hitRows.map(_.getLong(0)).sum,
          if (hs.size <= 2 && total == 3) 1 else 0),
        ("miss", missRows, 0L, if (ms.size <= 1) 1 else 0))
      s.createDataFrame(rows)
        .toDF("probe", "rows_found", "n_chars_sum", "pruned")
        .orderBy(col("probe"))
    }),

    // SCD2 DIMENSION HISTORY: three observation batches with staggered key
    // arrival (k%3 <= b) and a cycling attribute ((k+b)%4 / 2 — half the
    // steps are no-ops) maintained through change-detected version rows.
    // DuckDB replays it as a lag-dedupe + lead-close window pass over the
    // same synthetic event stream.
    "scd2_history" -> ((s, dir) => {
      val table =
        java.nio.file.Files.createTempDirectory("graft_scd2").toString + "/dim"
      val cust = Tables.customer(s, dir)
      def batch(b: Int) = cust.filter(col("c_custkey") % 3 <= b)
        .select(col("c_custkey").as("k"),
          expr(s"make_timestamp(2024, ${b + 1}, 15, 0, 0, 0)").as("ts"),
          expr(s"CAST(floor(((c_custkey + $b) % 4) / 2.0) AS BIGINT)").as("attr"))
      (0 to 2).foreach(b =>
        Scd2.applyBatch(s, batch(b), table, keyCol = "k", tsCol = "ts",
          token = Some(s"scd2-$b")))
      Scd2.readHistory(s, table)
        .select(col("k"), col("attr"),
          unix_millis(col("valid_from")).as("valid_from_ms"),
          unix_millis(col("valid_to")).as("valid_to_ms"),
          col("is_current").cast("int").as("is_current"))
        .orderBy(col("k"), col("valid_from_ms"))
    }),

    // SCD2 AS-OF ENRICHMENT — the consumption pattern the history exists
    // for: each (key, probe-time) fact picks the version row whose
    // [valid_from, valid_to) interval covers it. Probes at month
    // boundaries ±15d land between batch timestamps, so every probe
    // resolves to a definite version (or none, for keys not yet arrived).
    "scd2_asof_enrich" -> ((s, dir) => {
      val table =
        java.nio.file.Files.createTempDirectory("graft_scd2e").toString + "/dim"
      val cust = Tables.customer(s, dir)
      def batch(b: Int) = cust.filter(col("c_custkey") % 3 <= b)
        .select(col("c_custkey").as("k"),
          expr(s"make_timestamp(2024, ${b + 1}, 15, 0, 0, 0)").as("ts"),
          expr(s"CAST(floor(((c_custkey + $b) % 4) / 2.0) AS BIGINT)").as("attr"))
      (0 to 2).foreach(b =>
        Scd2.applyBatch(s, batch(b), table, keyCol = "k", tsCol = "ts",
          token = Some(s"scd2e-$b")))
      val probes = cust.select(col("c_custkey").as("k"),
        expr("make_timestamp(2024, CAST(c_custkey % 3 AS INT) + 2, 1, 0, 0, 0)")
          .as("probe_ts"))
      val h = Scd2.readHistory(s, table)
        .select(col("k"), col("attr"), col("valid_from"), col("valid_to"))
      probes.join(h, Seq("k"))
        .filter(col("probe_ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("probe_ts") < col("valid_to")))
        .select(col("k"), unix_millis(col("probe_ts")).as("probe_ms"),
          col("attr"))
        .orderBy(col("k"))
    }),

    // INCREMENTAL JOIN-VIEW MAINTENANCE: orders⋈customer kept in sync over
    // four refreshes as batches land on BOTH sides — one refresh applies
    // both sides' deltas at once (the ΔL⋈ΔR cross term), and a retention
    // delete on orders exercises the signed-delete path. The view must
    // equal a from-scratch join of the final tables.
    "incremental_join_view" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_jv").toString
      val (lt, rt, vt) = (s"$base/orders", s"$base/customer", s"$base/view")
      val spec = JoinView.Spec(
        leftKey = "o_custkey", rightKey = "c_custkey",
        viewCols = Seq("o_orderkey", "o_custkey", "o_orderdate",
          "o_totalprice", "c_name", "c_nationkey"),
        tsCol = "o_orderdate")
      // orders ships TIMESTAMP_NTZ; the log's stats pass needs TIMESTAMP
      // (session TZ is pinned UTC, so the cast is value-stable)
      val orders = Tables.orders(s, dir)
        .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
      val cust = Tables.customer(s, dir)
        .withColumn("c_ts", lit("2024-01-15").cast("timestamp"))
      def sync(): Unit = { JoinView.refresh(s, lt, rt, vt, spec); () }
      CommitLog.append(orders.filter(col("o_orderkey") % 3 === 0), lt,
        idCol = "o_orderkey", tsCol = "o_orderdate")
      sync() // right still empty: cursor-only commit
      CommitLog.append(cust.filter(col("c_custkey") % 2 === 0), rt,
        idCol = "c_custkey", tsCol = "c_ts")
      sync() // ΔR against the left snapshot
      CommitLog.append(orders.filter(col("o_orderkey") % 3 === 1), lt,
        idCol = "o_orderkey", tsCol = "o_orderdate")
      CommitLog.append(cust.filter(col("c_custkey") % 2 === 1), rt,
        idCol = "c_custkey", tsCol = "c_ts")
      sync() // both deltas in one refresh (cross term folded into ΔL⋈R_new)
      CommitLog.append(orders.filter(col("o_orderkey") % 3 === 2), lt,
        idCol = "o_orderkey", tsCol = "o_orderdate")
      CommitLog.deleteWhere(s, lt, col("o_totalprice") < 50000.0,
        idCol = "o_orderkey", tsCol = "o_orderdate")
      sync() // append + row-level delete in one range
      JoinView.readView(s, vt)
        .select(col("o_orderkey"), col("o_custkey"),
          unix_millis(col("o_orderdate")).as("o_date_ms"),
          col("o_totalprice"), col("c_name"), col("c_nationkey"))
        .orderBy(col("o_orderkey"))
    }),

    // the commit-log CHANGE FEED (Delta CDF analog): four monthly batches
    // appended (v1,v2,v3,v5), a compaction between them (v4 — physical
    // reorganization, must contribute NOTHING), and a retention drop of
    // the oldest month (v6 — emits deletes from the still-on-disk files).
    // changesBetween(1, 6) must therefore see batches 1..3 as inserts at
    // their exact commit versions and batch 0 as deletes at v6 — an
    // incremental consumer's catch-up read, file-pruned by construction.
    "logstore_changefeed" -> ((s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft_cdc").toString
      val docs = Tables.documents(s, dir)
        .withColumn("b", expr("CAST(substring(source, 4) AS INT) % 4"))
        .withColumn("ts", expr("make_timestamp(2024, b + 1, 15, 0, 0, 0)"))
        .select("doc_id", "b", "ts", "source")
      (0 until 3).foreach { b =>
        CommitLog.append(docs.filter(col("b") === b), table,
          idCol = "doc_id", tsCol = "ts")
      }
      CommitLog.compactMonth(s, table, "2024-02", idCol = "doc_id", tsCol = "ts")
      CommitLog.append(docs.filter(col("b") === 3), table,
        idCol = "doc_id", tsCol = "ts")
      CommitLog.dropMonthsBefore(table, keepFromMonth = "2024-02")
      CommitLog.changesBetween(s, table, 1, 6)
        .select(col("doc_id"), col("_change_type"), col("_commit_version"))
    }),

    // incremental VIEW MAINTENANCE on the change feed: a daily
    // count+sum aggregate kept in sync across three fact appends and a
    // retention drop — inserts increment, retention deletes DECREMENT
    // (the agg "forgets" the dropped month), and each refresh rewrites
    // only months containing changed buckets. The final maintained table
    // must equal DuckDB's from-scratch recompute under the same
    // retention window.
    "incremental_agg_refresh" -> ((s, dir) => {
      val base = java.nio.file.Files.createTempDirectory("graft_iagg").toString
      val (fact, agg) = (s"$base/fact", s"$base/agg")
      val ev = Tables.events(s, dir).select(
        col("event_id"),
        expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"),
        col("event_type"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      val spec = IncrementalAgg.Spec("ts", "cents", Seq("event_type"), "1d")
      (0 until 3).foreach { b =>
        CommitLog.append(ev.filter(pmod(col("event_id"), lit(3)) === b), fact,
          idCol = "event_id", tsCol = "ts", token = Some(s"b$b"))
        IncrementalAgg.refresh(s, fact, agg, spec)
      }
      CommitLog.dropMonthsBefore(fact, keepFromMonth = "2024-02")
      IncrementalAgg.refresh(s, fact, agg, spec)
      IncrementalAgg.readAgg(s, agg)
        .select(unix_millis(col("bucket_ts")).as("bucket_ms"), col("event_type"),
          col("count"), (col("sum_value").cast("double") / 100.0).as("sum_value"))
    }),

    // keyed MERGE (upsert — the CDC-apply primitive): a correction batch
    // re-delivers every 5th event with a fixed value; colliding files
    // rewrite, the replay of the same batch no-ops on its token, and the
    // final table equals DuckDB's last-writer-wins recompute.
    "logstore_upsert" -> ((s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft_ups").toString
      val ev = Tables.events(s, dir).select(
        col("event_id"),
        expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      CommitLog.append(ev, table, idCol = "event_id", tsCol = "ts")
      val fix = ev.filter(pmod(col("event_id"), lit(5)) === 0)
        .withColumn("value", col("value") + lit(1000.0))
      CommitLog.upsertBatch(fix, table, idCol = "event_id", tsCol = "ts",
        token = Some("fix-1"))
      CommitLog.upsertBatch(fix, table, idCol = "event_id", tsCol = "ts",
        token = Some("fix-1")) // replayed correction: no-op
      CommitLog.scan(s, table)
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          (sum(round(col("value") * 100.0, 0).cast("long")) / 100.0)
            .as("sum_value"))
    }),

    // row-level DELETE WHERE (the lakehouse erasure-request shape): only
    // files containing matches rewrite; the post-delete table must equal
    // DuckDB's filtered recompute exactly.
    "logstore_delete_where" -> ((s, dir) => {
      val table = java.nio.file.Files.createTempDirectory("graft_delw").toString
      val ev = Tables.events(s, dir).select(
        col("event_id"),
        expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      (0 until 3).foreach { b =>
        CommitLog.append(ev.filter(pmod(col("event_id"), lit(3)) === b), table,
          idCol = "event_id", tsCol = "ts")
      }
      CommitLog.deleteWhere(s, table,
        col("event_type") === "click" && col("value") < 50.0, "event_id", "ts")
      CommitLog.scan(s, table)
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          (sum(round(col("value") * 100.0, 0).cast("long")) / 100.0)
            .as("sum_value"))
    }),

    // the reference's TTL + OPTIMIZE maintenance cycle at query scale
    // (`internal/logretention/clickhouse_ttl.go:42-76` partition drops;
    // ClickHouse background merges → explicit Z-order rewrite here): a
    // 12-month store fragmented by micro-batch appends (8 interleaved
    // slices, one replayed → cross-batch duplicates), partition-drop
    // retention of the oldest 6 months, then optimizeMonth over every
    // retained month. The per-month aggregate must equal the source under
    // the same retention window exactly: duplicates repaired by the
    // rewrite, nothing lost, dropped months gone.
    "logstore_optimize" -> ((s, dir) => {
      val path = fragmentedLog(s, dir)
      Logstore.dropPartitionsBefore(path, keepFromMonth = "2024-07")
      Logstore.optimizeMonths(s, path, retainedMonths,
        idCol = "event_id", tsCol = "ts", dimCol = "event_type",
        parallelism = retainedMonths.size) // one wave, all six months
      Logstore.scan(s, path)
        .groupBy(col("month"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"),
          // integer-scaled sum (Relational.scala determinism note): a raw
          // double sum is last-ulp shuffle-order-dependent
          (sum(round(col("value") * 100.0, 0).cast("long")) / 100.0)
            .as("sum_value"))
        .orderBy(col("month"))
    }),

    // the file-skipping evidence for the cycle above, as checked booleans:
    // retention dropped exactly the 6 old month keys; compaction shrank
    // the file population (9 litter files per month → targetFiles); and
    // the canonical probe (15-day range + type IN-list through
    // [[Logstore.scanPruned]]) touches strictly fewer files after the
    // Z-order rewrite than before. probe_rows is DuckDB-verified so the
    // pruned read is pinned lossless, not just smaller.
    "logstore_optimize_check" -> ((s, dir) => {
      import s.implicits._
      val path = fragmentedLog(s, dir)
      val dropped = Logstore.dropPartitionsBefore(path, keepFromMonth = "2024-07")
      def parquetFiles(): Int = {
        def walk(f: java.io.File): Int =
          if (f.isDirectory)
            Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
          else if (f.getName.endsWith(".parquet")) 1 else 0
        walk(new java.io.File(path))
      }
      val probeT0 = java.sql.Timestamp.valueOf("2024-09-05 00:00:00")
      val probeT1 = java.sql.Timestamp.valueOf("2024-09-20 00:00:00")
      def probe() = Logstore.scanPruned(s, path, tsCol = "ts",
        from = probeT0, to = probeT1, dimCol = "event_type",
        values = Seq("purchase"))
      def hitFiles(): Long =
        probe().select(input_file_name()).distinct().count()
      val (filesBefore, hitsBefore) = (parquetFiles(), hitFiles())
      Logstore.optimizeMonths(s, path, retainedMonths,
        idCol = "event_id", tsCol = "ts", dimCol = "event_type",
        parallelism = retainedMonths.size) // one wave, all six months
      val (filesAfter, hitsAfter) = (parquetFiles(), hitFiles())
      Seq((probe().count(),
          dropped == (1 to 6).map(m => f"2024-$m%02d"),
          filesAfter < filesBefore,
          hitsAfter < hitsBefore))
        .toDF("probe_rows", "retention_dropped_old6", "litter_merged",
          "probe_files_shrunk")
    })
  )

  /** Retained month keys after the gate's 6-month TTL window. */
  private val retainedMonths: Seq[String] = (7 to 12).map(m => f"2024-$m%02d")

  /** 12-month micro-batch-fragmented log store for the maintenance gates:
    * the one-month synthetic event stream spread across 2024 by a
    * deterministic day shift (`(event_id % 12) * 30` days — integer day
    * arithmetic, so DuckDB reproduces every shifted timestamp exactly),
    * appended as 8 interleaved slices with slice 0 replayed (at-least-once
    * ingest litter: ~9 files per month partition, cross-batch duplicates
    * for the optimize rewrite's read-repair to fix). Slices cut on a HASH
    * of the id, not `event_id % 8` — the raw residue correlates with the
    * `% 12` month spread (shared factor 4), which would starve most months
    * of most slices. The slicing never reaches the oracle: store content
    * is the union of slices under any cut.
    *
    * The litter is laid down in ONE write job: a slice tag + a
    * (month, slice) repartition puts each slice's month-rows in its own
    * task, so `partitionBy(month)` writes the same fragmented file state
    * nine sequential appends would — the gate measures the MAINTENANCE
    * cycle (drop + Z-order rewrite + verify), and nine serial ~0.4 s
    * write jobs were setup cost masquerading as maintenance time
    * (measured: the sf0.01 and sf0.1 gate times were equal — pure fixed
    * cost). The duplicate slice (k=8 ≡ slice 0) keeps its own files, so
    * read-repair still has cross-file duplicates to fix. */
  private def fragmentedLog(s: SparkSession, dir: String): String = {
    val path = java.nio.file.Files.createTempDirectory("graft_optlog").toString
    val ev = Tables.events(s, dir).select(
      col("event_id"),
      expr("timestampadd(DAY, CAST((event_id % 12) * 30 AS INT), ts)").as("ts"),
      col("user_id"), col("event_type"), col("value"))
    val sliced = (0 to 8).map { k =>
      ev.filter(pmod(xxhash64(col("event_id")), lit(8)) === k % 8)
        .withColumn("_slice", lit(k))
    }.reduce(_.unionByName(_))
    sliced
      .withColumn("month", date_format(col("ts"), "yyyy-MM"))
      .repartition(12 * 9, col("month"), col("_slice"))
      .sortWithinPartitions(col("ts"), col("event_id"))
      .drop("_slice")
      .write.mode("append").partitionBy("month").parquet(path)
    path
  }

  def oracles: Map[String, String] = Map(
    "json_filter_native" ->
      """SELECT event_id, user_id, CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
        |FROM events WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) < 30
        |ORDER BY event_id""".stripMargin,
    "json_filter_complex" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 90
        |   OR CAST(json_extract_string(props, '$.k') AS DOUBLE) <= 5
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "asof_click_before_purchase" ->
      """SELECT p.event_id, p.user_id, epoch_ms(p.ts::TIMESTAMP) AS ts_ms,
        |  c.click_id AS prior_click_id, epoch_ms(c.ts::TIMESTAMP) AS prior_click_ms
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type='purchase') p
        |ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type='click') c
        |  ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "asof_forward_tolerance" ->
      """WITH j AS (
        |  SELECT p.event_id, p.user_id, p.ts, c.click_id, c.ts AS cts
        |  FROM (SELECT event_id, user_id, ts FROM events
        |        WHERE event_type='purchase') p
        |  ASOF LEFT JOIN (SELECT user_id, ts, event_id AS click_id
        |                  FROM events WHERE event_type='click') c
        |    ON p.user_id = c.user_id AND c.ts >= p.ts)
        |SELECT event_id, user_id, epoch_ms(ts::TIMESTAMP) AS ts_ms,
        |  CASE WHEN cts IS NOT NULL
        |    AND epoch_ms(cts::TIMESTAMP) - epoch_ms(ts::TIMESTAMP) <= 21600000
        |    THEN click_id END AS next_click_id,
        |  CASE WHEN cts IS NOT NULL
        |    AND epoch_ms(cts::TIMESTAMP) - epoch_ms(ts::TIMESTAMP) <= 21600000
        |    THEN epoch_ms(cts::TIMESTAMP) END AS next_click_ms
        |FROM j ORDER BY event_id""".stripMargin,
    "range_join_60s" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |  epoch_ms(b.ts::TIMESTAMP) - epoch_ms(a.ts::TIMESTAMP) AS gap_ms
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND epoch_ms(b.ts::TIMESTAMP) > epoch_ms(a.ts::TIMESTAMP)
        |  AND epoch_ms(b.ts::TIMESTAMP) <= epoch_ms(a.ts::TIMESTAMP) + 60000
        |ORDER BY id_a, id_b""".stripMargin,
    "logstore_roundtrip" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE ts::TIMESTAMP >= TIMESTAMP '2024-01-08' AND ts::TIMESTAMP < TIMESTAMP '2024-01-15'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "logstore_commitlog" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "logstore_time_travel" ->
      """SELECT doc_id, CAST(doc_id % 3 AS INT) AS b, source, n_chars
        |FROM documents WHERE doc_id % 3 <= 1 ORDER BY doc_id""".stripMargin,
    "logstore_clone" ->
      """SELECT doc_id, CAST(doc_id % 3 AS INT) AS b, source, n_chars
        |FROM documents WHERE doc_id % 3 <= 1 ORDER BY doc_id""".stripMargin,
    "logstore_point_lookup" ->
      """SELECT 'hit' AS probe, CAST(1 AS BIGINT) AS rows_found,
        |  (SELECT CAST(n_chars AS BIGINT) FROM documents WHERE doc_id = 247)
        |    AS n_chars_sum,
        |  CAST(1 AS INT) AS pruned
        |UNION ALL
        |SELECT 'miss', CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS INT)
        |ORDER BY probe""".stripMargin,
    "scd2_asof_enrich" ->
      """WITH ev AS (
        |  SELECT c_custkey AS k, b, make_timestamp(2024, b + 1, 15, 0, 0, 0) AS ts,
        |    CAST(floor(((c_custkey + b) % 4) / 2.0) AS BIGINT) AS attr
        |  FROM customer CROSS JOIN (SELECT unnest([0, 1, 2]) AS b)
        |  WHERE c_custkey % 3 <= b),
        |d AS (
        |  SELECT k, ts, attr, lag(attr) OVER (PARTITION BY k ORDER BY ts) AS prev
        |  FROM ev),
        |ch AS (SELECT k, ts, attr FROM d WHERE prev IS NULL OR prev <> attr),
        |hist AS (
        |  SELECT k, attr, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to
        |  FROM ch),
        |probes AS (
        |  SELECT c_custkey AS k,
        |    make_timestamp(2024, CAST(c_custkey % 3 AS INT) + 2, 1, 0, 0, 0) AS probe_ts
        |  FROM customer)
        |SELECT p.k, epoch_ms(p.probe_ts) AS probe_ms, h.attr
        |FROM probes p JOIN hist h ON p.k = h.k
        |WHERE p.probe_ts >= h.valid_from
        |  AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
        |ORDER BY p.k""".stripMargin,
    "scd2_history" ->
      """WITH ev AS (
        |  SELECT c_custkey AS k, b, make_timestamp(2024, b + 1, 15, 0, 0, 0) AS ts,
        |    CAST(floor(((c_custkey + b) % 4) / 2.0) AS BIGINT) AS attr
        |  FROM customer CROSS JOIN (SELECT unnest([0, 1, 2]) AS b)
        |  WHERE c_custkey % 3 <= b),
        |d AS (
        |  SELECT k, ts, attr, lag(attr) OVER (PARTITION BY k ORDER BY ts) AS prev
        |  FROM ev),
        |ch AS (SELECT k, ts, attr FROM d WHERE prev IS NULL OR prev <> attr)
        |SELECT k, attr, epoch_ms(ts) AS valid_from_ms,
        |  epoch_ms(lead(ts) OVER (PARTITION BY k ORDER BY ts)) AS valid_to_ms,
        |  CAST(CASE WHEN lead(ts) OVER (PARTITION BY k ORDER BY ts) IS NULL
        |       THEN 1 ELSE 0 END AS INT) AS is_current
        |FROM ch ORDER BY k, valid_from_ms""".stripMargin,
    "incremental_join_view" ->
      """SELECT o_orderkey, o_custkey, epoch_ms(o_orderdate) AS o_date_ms,
        |  o_totalprice, c_name, c_nationkey
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE NOT (o_totalprice < 50000.0)
        |ORDER BY o_orderkey""".stripMargin,
    "logstore_changefeed" ->
      """WITH t AS (
        |  SELECT doc_id, CAST(substr(source, 4) AS INT) % 4 AS b FROM documents)
        |SELECT doc_id, 'insert' AS _change_type,
        |  CAST(CASE b WHEN 1 THEN 2 WHEN 2 THEN 3 ELSE 5 END AS BIGINT) AS _commit_version
        |FROM t WHERE b >= 1
        |UNION ALL
        |SELECT doc_id, 'delete', CAST(6 AS BIGINT) FROM t WHERE b = 0
        |ORDER BY doc_id, _change_type""".stripMargin,
    "incremental_agg_refresh" ->
      """WITH ev AS (
        |  SELECT ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts, event_type,
        |    CAST(round(value * 100.0) AS BIGINT) AS cents
        |  FROM events)
        |SELECT epoch_ms(time_bucket(INTERVAL 1 DAY, ts::TIMESTAMP)) AS bucket_ms,
        |  event_type, count(*) AS count,
        |  CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value
        |FROM ev WHERE strftime(ts::TIMESTAMP, '%Y-%m') >= '2024-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "logstore_upsert" ->
      """WITH ev AS (
        |  SELECT ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts, user_id,
        |    CASE WHEN event_id % 5 = 0 THEN value + 1000 ELSE value END AS value
        |  FROM events)
        |SELECT strftime(ts::TIMESTAMP, '%Y-%m') AS month, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  sum(CAST(round(value*100.0) AS BIGINT))/100.0 AS sum_value
        |FROM ev GROUP BY 1 ORDER BY 1""".stripMargin,
    "logstore_delete_where" ->
      """WITH ev AS (
        |  SELECT ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts,
        |    user_id, event_type, value
        |  FROM events)
        |SELECT strftime(ts::TIMESTAMP, '%Y-%m') AS month, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  sum(CAST(round(value*100.0) AS BIGINT))/100.0 AS sum_value
        |FROM ev WHERE NOT (event_type = 'click' AND value < 50)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "logstore_optimize" ->
      """WITH ev AS (
        |  SELECT ts + to_days(CAST((event_id % 12) * 30 AS INT)) AS ts,
        |    user_id, value
        |  FROM events)
        |SELECT strftime(ts, '%Y-%m') AS month, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users,
        |  sum(CAST(round(value*100.0) AS BIGINT))/100.0 AS sum_value
        |FROM ev WHERE strftime(ts, '%Y-%m') >= '2024-07'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "logstore_optimize_check" ->
      """SELECT count(*) AS probe_rows, true AS retention_dropped_old6,
        |  true AS litter_merged, true AS probe_files_shrunk
        |FROM events
        |WHERE ts + to_days(CAST((event_id % 12) * 30 AS INT)) >= TIMESTAMP '2024-09-05'
        |  AND ts + to_days(CAST((event_id % 12) * 30 AS INT)) < TIMESTAMP '2024-09-20'
        |  AND event_type IN ('purchase')""".stripMargin
  )
}
