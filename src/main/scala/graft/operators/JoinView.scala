package graft.operators

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental JOIN-VIEW MAINTENANCE over two commit-log tables: keep a
  * materialized inner-join view `V = L ⋈ R` in sync as batches append to
  * (and retention deletes from) EITHER side, without ever recomputing the
  * join — the classic delta-propagation rule
  *
  *   V_new − V_old = ΔL ⋈ R_new  ∪  L_old ⋈ ΔR        (signed multisets)
  *
  * (expand `(L_old+ΔL)⋈(R_old+ΔR) − L_old⋈R_old` and fold the ΔL⋈ΔR cross
  * term into the first factor: `ΔL⋈R_old + ΔL⋈ΔR = ΔL⋈R_new`).
  *
  * 100 TB shape: the Δ sides are batch-sized change feeds — they BROADCAST;
  * the full sides are commit-log scans that stream through the join and
  * never shuffle. `R_new`/`L_old` come from snapshot reads ([[CommitLog
  * .scanAt]] — the "old" term is exactly what time travel is for), so a
  * refresh is two broadcast joins over one pass of the touched files plus
  * a rewrite of only the view months the delta lands in. History months of
  * the view are never read, listed, or rewritten.
  *
  * Cursor discipline matches [[IncrementalAgg]]: the pair of applied fact
  * versions rides as a `jvsync-<lv>-<rv>` token IN the view's own commit —
  * progress is atomic with the merge it describes, and a crashed-and-
  * replayed refresh hits the token and no-ops.
  *
  * Reference behavior being re-expressed: the denormalized attempt⋈event
  * log the reference maintains on write (SURVEY §2.3 J2) — here generalized
  * to any two fact tables, maintained after the fact, with deletes.
  */
object JoinView {

  /** What to maintain. `viewCols` must resolve across the joined pair and
    * include `tsCol` (the view's month-partitioning time column). Rows are
    * kept by full-row multiplicity, so duplicate-free sides stay duplicate-
    * free; duplicated rows maintain exact counts through the signed merge. */
  final case class Spec(leftKey: String, rightKey: String,
                        viewCols: Seq[String], tsCol: String)

  private val SyncPrefix = "jvsync-"

  /** (left, right) fact versions the view has applied (0,0 = nothing). */
  def synced(viewTable: String): (Long, Long) =
    CommitLog.latestToken(viewTable, SyncPrefix).map { t =>
      val p = t.stripPrefix(SyncPrefix).split("-")
      (p(0).toLong, p(1).toLong)
    }.getOrElse((0L, 0L))

  /** The maintained view. */
  def readView(spark: SparkSession, viewTable: String): DataFrame =
    CommitLog.scan(spark, viewTable)

  private def signed(feed: DataFrame): DataFrame =
    feed.withColumn("_sign",
        when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
      .drop("_change_type", "_commit_version")

  /** One side's full contents as of a version, or None when it holds no
    * files there (a genuinely empty side contributes an empty join term). */
  private def sideAt(spark: SparkSession, table: String,
                     version: Long): Option[DataFrame] =
    if (version <= 0 || CommitLog.snapshotAt(table, version).files.isEmpty) None
    else Some(CommitLog.scanAt(spark, table, version))

  /** The signed view delta for fact ranges `(fromL, toL] × (fromR, toR]`:
    * view columns plus `_sign`. None when neither side changed logically.
    * Exposed (not private) so the plan shape — deltas broadcast, full
    * sides stream — is pinned in PlanSpec. */
  def deltaFrame(spark: SparkSession, leftTable: String, rightTable: String,
                 spec: Spec, fromL: Long, toL: Long,
                 fromR: Long, toR: Long): Option[DataFrame] = {
    val cols = spec.viewCols.map(col) :+ col("_sign")
    // same-named keys join by column (an equality condition would be
    // self-ambiguous); distinct names join on the explicit equality
    def joinDelta(big: DataFrame, delta: DataFrame): DataFrame =
      if (spec.leftKey == spec.rightKey)
        big.join(broadcast(signed(delta)), Seq(spec.leftKey))
      else big.join(broadcast(signed(delta)),
        col(spec.leftKey) === col(spec.rightKey))
    val dl = CommitLog.changesBetweenIfAny(spark, leftTable, fromL, toL)
    val dr = CommitLog.changesBetweenIfAny(spark, rightTable, fromR, toR)
    // ΔL ⋈ R_new: the batch-side delta broadcasts onto the streaming scan
    val t1 = for { d <- dl; r <- sideAt(spark, rightTable, toR) }
      yield joinDelta(r, d).select(cols: _*)
    // L_old ⋈ ΔR: same shape against the left side's PRE-range snapshot
    val t2 = for { d <- dr; l <- sideAt(spark, leftTable, fromL) }
      yield joinDelta(l, d).select(cols: _*)
    (t1, t2) match {
      case (Some(a), Some(b)) => Some(a.unionByName(b))
      case (a, b)             => a.orElse(b)
    }
  }

  /** Apply both sides' changes up to their current heads. Returns the new
    * synced (left, right) versions. Idempotent under replay, and OCC-safe
    * under concurrent refreshers: the merge commits against the view
    * version it was derived from (`expectVersion` CAS) — a racer that
    * lost re-derives the WHOLE refresh from the new cursor (a stale-range
    * merge re-applied blindly would double-count its delta or regress the
    * cursor past a wider racer's token). */
  def refresh(spark: SparkSession, leftTable: String, rightTable: String,
              viewTable: String, spec: Spec): (Long, Long) = {
    var attempts = 0
    while (true) {
      val vsnap = CommitLog.snapshot(viewTable)
      val (fl, fr) = synced(viewTable)
      val lh = CommitLog.snapshot(leftTable).version
      val rh = CommitLog.snapshot(rightTable).version
      if (lh <= fl && rh <= fr) return (fl, fr)
      val token = s"$SyncPrefix$lh-$rh"
      try {
        deltaFrame(spark, leftTable, rightTable, spec, fl, lh, fr, rh) match {
          case None =>
            // compactions / one-sided appends with the other side empty:
            // advance the cursor with a data-less commit
            try CommitLog.commit(viewTable, "append", Nil,
              token = Some(token), expectVersion = Some(vsnap.version))
            catch { case _: CommitLog.AlreadyApplied => () }
            return (lh, rh)
          case Some(delta0) =>
            // UTC month, matching every other CommitLog writer — a session
            // timezone must not shift boundary rows into a different
            // partition than retention/compaction would compute
            val monthOf = date_format(
              graft.functions.Buckets.utcFields(col(spec.tsCol)), "yyyy-MM")
            val delta = delta0.withColumn("month", monthOf)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              val months = delta.select(col("month")).distinct()
                .collect().map(_.getString(0)).toSet
              val oldFiles = vsnap.files.filter(f => months.contains(f.month))
              val keyCols = (spec.viewCols :+ "month").map(col)
              val current =
                if (oldFiles.isEmpty) delta.limit(0).withColumn("_sign", lit(1L))
                else spark.read
                  .option("basePath", Paths.get(viewTable, "data").toString)
                  .parquet(oldFiles.map(f =>
                    Paths.get(viewTable).resolve(f.path).toString): _*)
                  .withColumn("_sign", lit(1L))
                  .select(keyCols :+ col("_sign"): _*)
              // full-row multiplicity merge: net count per distinct row,
              // re-emit n copies (n is 1 for duplicate-free sides;
              // sequence() keeps the general case exact)
              val merged = current
                .unionByName(delta.select(keyCols :+ col("_sign"): _*))
                .groupBy(keyCols: _*)
                .agg(sum(col("_sign")).as("_n"))
                .filter(col("_n") > 0L)
                .withColumn("_dup", explode(sequence(lit(1L), col("_n"))))
                .select(keyCols: _*)
              val v = CommitLog.replaceFiles(merged, viewTable, spec.tsCol,
                removes = oldFiles.map(_.path),
                sortCols = Seq(spec.tsCol), token = Some(token),
                expectVersion = Some(vsnap.version))
              require(v > 0, s"join-view merge failed to commit $viewTable")
              return (lh, rh)
            } finally delta.unpersist()
        }
      } catch {
        case e @ (_: CommitLog.ConcurrentWrite | _: CommitLog.ConcurrentDelete) =>
          attempts += 1
          if (attempts > 20) throw e // livelock guard; view state is clean
      }
    }
    (0L, 0L) // unreachable
  }
}
