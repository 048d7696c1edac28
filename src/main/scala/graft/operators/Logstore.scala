package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytical log store: append-mostly fact tables on month-partitioned
  * parquet with `(time, id)` sorted runs (reference physical design:
  * ClickHouse `PARTITION BY toYYYYMM(time) ORDER BY (time, id)` —
  * `internal/migrator/migrations/clickhouse/000001_init.up.sql`).
  *
  * Scale rationale:
  *   - month partitions ⇒ every time-ranged query (metrics, lists, keyset
  *     seeks) prunes at the directory level before any IO;
  *   - sort-within-file on (time, id) ⇒ parquet row-group min/max stats act
  *     like the reference's primary index: a keyset seek reads ~one run;
  *   - write-side dedup on the natural id replaces the reference's
  *     read-repair loop (`chlogstore.go:46-112`) — reads stay exact and
  *     cheap instead of re-deduping per query.
  */
object Logstore {

  /** Idempotent batch insert: dedup by id (last write wins by time), stamp
    * month partition, sort within partitions. */
  def insertMany(batch: DataFrame, path: String,
                 idCol: String, tsCol: String): Unit = {
    batch
      .dropDuplicates(idCol)
      .withColumn("month", date_format(col(tsCol), "yyyy-MM"))
      .repartition(col("month"))
      .sortWithinPartitions(col(tsCol), col(idCol))
      .write.mode("append").partitionBy("month").parquet(path)
  }

  /** Scan the store; time predicates prune month directories first. */
  def scan(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Cross-table store batch: events + attempts committed as ONE logical
    * ingest unit (the reference writes both fact tables in a single store
    * batch — `logmq/batchprocessor.go:192-307`; on parquet they are two
    * separate CommitLog commits, so a crash between them is possible and
    * must be RECOVERABLE, not prevented).
    *
    * The recovery rule (also in DESIGN.md): commits run in FIXED order —
    * events first, then attempts — and both carry the SAME batch token.
    * The only crash window leaves "events committed, attempts not"; the
    * at-least-once upstream (MQ redelivery / micro-batch replay) re-runs
    * the whole batch under the same token, the events append no-ops on
    * its token check and the attempts append applies — both tables
    * converge to exactly-once with no coordinator and no cross-table
    * manifest. Readers see only committed snapshots throughout (an
    * attempt row's event is visible BEFORE the attempt, never after —
    * the join direction the denormalized read path relies on).
    *
    * Contrast with a 2-phase scheme: at 100 TB a coordinator table would
    * serialize every ingest worker through one lock; token-idempotent
    * replay keeps appends blind (never conflicting) and recovery local
    * to the failed batch. */
  def insertBatchTx(events: DataFrame, attempts: DataFrame,
                    eventsTable: String, attemptsTable: String, token: String,
                    eventIdCol: String = "event_id", eventTsCol: String = "ts",
                    attemptIdCol: String = "attempt_id",
                    attemptTsCol: String = "attempt_time"): Unit = {
    CommitLog.append(events, eventsTable, eventIdCol, eventTsCol,
      token = Some(token))
    CommitLog.append(attempts, attemptsTable, attemptIdCol, attemptTsCol,
      token = Some(token))
    ()
  }

  /** Read-side dedup (the reference's read-repair, `chlogstore.go:46-112`):
    * at-least-once writers may append the same natural id twice across
    * batches — readers keep the latest row per id (ts desc, deterministic).
    * In-batch dedup in [[insertMany]] makes this a no-op on the happy path;
    * this guards the redelivery/concurrent-writer path. */
  def scanLatest(spark: SparkSession, path: String,
                 idCol: String, tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(tsCol).desc, col(idCol))
    scan(spark, path)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** Compaction: rewrite one month partition's accumulated small files
    * (every micro-batch append creates files) into `targetFiles` sorted
    * runs. The ClickHouse reference gets this for free from background
    * merges; on parquet it's an explicit maintenance pass — without it a
    * year of 1 s micro-batches is ~31 M files/partition-month and the scan
    * planner dies before any query runs. Atomic per partition: write to a
    * temp dir, swap directories, so readers never see a half state.
    * Read-side dedup ([[scanLatest]] semantics) is applied while rewriting,
    * making compaction double as the log's repair pass. */
  def compactMonth(spark: SparkSession, path: String, month: String,
                   idCol: String, tsCol: String, targetFiles: Int = 1): Unit =
    rewriteMonth(spark, path, month, idCol, tsCol) { deduped =>
      deduped.repartition(targetFiles)
        .sortWithinPartitions(col(tsCol), col(idCol))
    }

  /** OPTIMIZE-style month rewrite: compaction that Z-ORDERS the files by
    * (time, hash(dimCol)) instead of sorting on time alone. The log's two
    * filter shapes are a time range plus `dimCol` IN-lists
    * (destination_id / event_id — [[ListQuery]]); a pure (time, id) sort
    * leaves every file spanning ALL dimension values, so an IN-list scan
    * reads the whole time range. After this rewrite each file's footer
    * bounds BOTH the time range and the dimension-hash range
    * (spec-asserted), and either predicate skips most files at planning
    * time. The hash is the same stable 16-bit bucket a reader derives
    * from its literal IN-list values, so pruning needs no stats table.
    *
    * The bucket is PERSISTED as an `_dh` INT column: footer min/max
    * statistics only exist for stored columns, so without it the reader's
    * recomputed-hash predicate is an expression parquet cannot prune on —
    * rows would be clustered but every file still read. With it,
    * [[scanPruned]] turns a dim IN-list into `_dh IN (buckets)` — an
    * ordinary pushed filter that skips whole sorted files from statistics
    * alone (the Delta/Iceberg Z-order mechanic, minus the stats table). */
  def optimizeMonth(spark: SparkSession, path: String, month: String,
                    idCol: String, tsCol: String, dimCol: String,
                    targetFiles: Int = 8): Unit =
    rewriteMonth(spark, path, month, idCol, tsCol) { deduped =>
      // normalize time over the CALENDAR month, not a data min/max scan:
      // every row is inside its partition month by construction, the
      // bounds are knowable without a job, and the layout stays stable
      // under incremental rewrites (data-derived bounds shift per run).
      val ym = java.time.YearMonth.parse(month)
      val startMs = ym.atDay(1).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli
      val endMs = ym.plusMonths(1).atDay(1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli - 1
      val tsLong = unix_millis(col(tsCol).cast("timestamp"))
      val withDh = deduped.withColumn("_dh", dimHash16(col(dimCol)).cast("int"))
      val zkey = Layout.zvalue(
        Layout.normalize(tsLong, startMs, endMs),
        col("_dh").cast("long"))
      withDh.withColumn("_zkey", zkey)
        .repartitionByRange(targetFiles, col("_zkey"))
        .sortWithinPartitions(col("_zkey"), col(tsCol), col(idCol))
        .drop("_zkey")
    }

  /** [[optimizeMonth]] over several months CONCURRENTLY. Months are
    * independent rewrites, each staging into its own `.compact_month=` dir
    * before the swap, so concurrent submission is safe — and on a cluster
    * it is the difference between executors idling through N sequential
    * commit barriers and a full maintenance window pipelined N-wide (the
    * Delta OPTIMIZE concurrent-file-group pattern). */
  def optimizeMonths(spark: SparkSession, path: String, months: Seq[String],
                     idCol: String, tsCol: String, dimCol: String,
                     targetFiles: Int = 8, parallelism: Int = 4): Unit = {
    if (months.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      parallelism.min(months.size).max(1))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(months.map(m =>
          scala.concurrent.Future(optimizeMonth(
            spark, path, m, idCol, tsCol, dimCol, targetFiles)))),
        scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
    ()
  }

  /** Stable 16-bit bucket of a dimension value — what [[optimizeMonth]]
    * clusters on and what a reader recomputes from IN-list literals. */
  def dimHash16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(xxhash64(c), lit(65536L))

  /** [[dimHash16]] of a driver-side literal — bit-identical (same
    * `xxhash64`, seed 42) so a reader can translate IN-list values into
    * `_dh` buckets without touching the cluster. The value's Scala type
    * must match the stored column type (Long for a bigint dim, String for
    * a string dim): xxhash64(42L) != xxhash64(42: Int). */
  def dimHash16Value(v: Any): Int = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(v)), 42L).eval(InternalRow.empty)
      .asInstanceOf[Long]
    (((h % 65536L) + 65536L) % 65536L).toInt
  }

  /** The log's canonical pruned read: time range + dimension IN-list
    * ([[ListQuery]]'s scan shape). Time bounds prune month directories;
    * on months rewritten by [[optimizeMonth]] the IN-list additionally
    * becomes an `_dh IN (buckets)` pushed filter over the persisted
    * cluster column, so parquet footer stats skip the files whose hash
    * range misses every requested value (plan- and file-count-asserted in
    * `LayoutSpec`). Falls back to the plain filtered scan when the store
    * has never been optimized (`_dh` absent). Requires a store state where
    * either every retained file carries `_dh` or none does — a half-
    * optimized store would drop pre-optimize rows from the `_dh` filter. */
  def scanPruned(spark: SparkSession, path: String, tsCol: String,
                 from: java.sql.Timestamp, to: java.sql.Timestamp,
                 dimCol: String, values: Seq[Any]): DataFrame = {
    val base = scan(spark, path)
    val filtered = base
      .filter(col(tsCol) >= lit(from) && col(tsCol) < lit(to))
      .filter(col(dimCol).isin(values: _*))
    val pruned =
      if (base.columns.contains("_dh"))
        filtered.filter(col("_dh").isin(values.map(dimHash16Value): _*))
      else filtered
    pruned.drop("_dh")
  }

  /** Shared month-rewrite machinery: read → read-side dedup (repair) →
    * caller's layout → atomic directory swap. Swap: the old dir goes away
    * first (readers of a month mid-swap retry at the store level;
    * single-writer maintenance window assumed, as with any filesystem
    * table format without a commit log). */
  private def rewriteMonth(spark: SparkSession, path: String, month: String,
                           idCol: String, tsCol: String)
                          (layout: DataFrame => DataFrame): Unit = {
    val dir = new java.io.File(path, s"month=$month")
    if (!dir.exists) return
    val tmp = new java.io.File(path, s".compact_month=$month")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col(tsCol).desc, col(idCol))
    layout(spark.read.parquet(dir.getPath)
        .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn"))
      .write.mode("overwrite").parquet(tmp.getPath)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }
    rm(dir)
    if (!tmp.renameTo(dir))
      throw new java.io.IOException(s"compaction swap failed for $month")
  }

  /** S6 retention (reference `internal/logretention/clickhouse_ttl.go:42-76`
    * — table TTL / partition drops): delete month partitions strictly older
    * than `keepFromMonth` ("yyyy-MM"). A pure directory-level operation —
    * no data files are read, exactly like dropping a ClickHouse partition.
    * Returns the dropped month keys. */
  def dropPartitionsBefore(path: String, keepFromMonth: String): Seq[String] = {
    val root = new java.io.File(path)
    val dropped = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("month="))
      .filter(_.getName.stripPrefix("month=") < keepFromMonth)
    dropped.foreach { dir =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
    dropped.map(_.getName.stripPrefix("month=")).toSeq.sorted
  }
}
