package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental DISTINCT-COUNT rollups as mergeable HLL sketch columns on
  * the commit log — the warehouse "sketch table" pattern (Snowflake /
  * BigQuery HLL rollups, Druid datasketches) on an open ledger.
  *
  * Why sketches and not `countDistinct`: an EXACT distinct over a growing
  * fact store is not incrementally maintainable — every refresh re-shuffles
  * all history on the distinct key (at 100 TB, the whole corpus, every
  * time). An HLL sketch is an associative, commutative, idempotent-union
  * summary: the rollup table holds one ~2^lgK-byte sketch per group, a new
  * batch costs O(batch + touched groups), and any coarser grain — distinct
  * users per quarter, per year, global — is a sketch UNION over the stored
  * rows, with NO pass over facts. Spark ships the Apache DataSketches HLL
  * family natively (`hll_sketch_agg` / `hll_union_agg` /
  * `hll_sketch_estimate`, codegen'd TypedImperativeAggregates), so the
  * whole operator is a declarative plan; relative error is the standard
  * HLL bound (~1.04/√2^lgK ≈ 0.8 % at the default lgK=14).
  *
  * Table schema: group columns + (sketch BINARY, n_rows LONG — exact
  * row accounting maintained alongside the sketch, updated_at, rollup_id).
  * State updates ride [[CommitLog.upsertBatch]]: only files containing
  * touched groups rewrite, and an idempotency token makes replayed
  * batches no-ops (the same effectively-once contract as the ledgers).
  */
object Sketches {

  /** Fold one fact batch into the rollup table: sketch the batch per
    * group, UNION with the stored sketches of the touched groups only
    * (broadcast semi join — untouched groups are never read twice, let
    * alone rewritten), and upsert the merged rows in one token-idempotent
    * commit.
    *
    * @param groupCols rollup grain (e.g. month, event_type)
    * @param valueCol  the distinct-counted key (int/long/string/binary)
    */
  def updateDistinctRollup(batch: DataFrame, table: String,
                           groupCols: Seq[String], valueCol: String,
                           at: java.sql.Timestamp, lgK: Int = 14,
                           token: Option[String] = None): Unit =
    updateRollup(batch, table, groupCols,
      batchAggs = Seq(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"),
        count(col(valueCol)).as("n_rows")),
      mergeAggs = Seq(expr("hll_union_agg(sketch, true)").as("sketch"),
        sum(col("n_rows")).as("n_rows")),
      stateCols = Seq("sketch", "n_rows"), at = at, token = token)

  /** QUANTILE rollup -- the same incremental state algebra with the
    * project's native Greenwald-Khanna aggregate
    * ([[graft.plans.GkSketchAgg]]) in place of HLL: one mergeable GK
    * summary per group, DETERMINISTIC eps rank error (a gate can pin the
    * bound as a hard boolean -- GK's guarantee is worst-case, not
    * with-high-probability), quantiles at any stored or coarser grain
    * without re-reading facts. */
  def updateQuantileRollup(batch: DataFrame, table: String,
                           groupCols: Seq[String], valueCol: String,
                           at: java.sql.Timestamp, eps: Double = 0.01,
                           token: Option[String] = None): Unit = {
    graft.plans.QuantileRegistry.install(batch.sparkSession)
    updateRollup(batch, table, groupCols,
      batchAggs = Seq(
        graft.plans.QuantileRegistry.gkAgg(col(valueCol).cast("double"), eps)
          .as("qsketch"),
        count(col(valueCol)).as("n_rows")),
      mergeAggs = Seq(
        graft.plans.QuantileRegistry.gkMerge(col("qsketch")).as("qsketch"),
        sum(col("n_rows")).as("n_rows")),
      stateCols = Seq("qsketch", "n_rows"), at = at, token = token)
  }

  /** HEAVY-HITTER rollup — frequent items per group at fixed memory via
    * the project's native Misra–Gries aggregate
    * ([[graft.plans.MgSketchAgg]]): the boilerplate/dominant-token
    * detector for a growing corpus, without a count-every-token shuffle.
    * Deterministic contract (any merge tree): every item with true count
    * > (n − m)/(k+1) survives in the summary, and the surviving counter
    * undercounts by at most that bound. */
  def updateTopKRollup(batch: DataFrame, table: String,
                       groupCols: Seq[String], itemCol: String,
                       at: java.sql.Timestamp, k: Int = 64,
                       token: Option[String] = None): Unit = {
    graft.plans.FrequencyRegistry.install(batch.sparkSession)
    updateRollup(batch, table, groupCols,
      batchAggs = Seq(
        graft.plans.FrequencyRegistry.mgAgg(col(itemCol), k).as("fsketch"),
        count(col(itemCol)).as("n_rows")),
      mergeAggs = Seq(
        graft.plans.FrequencyRegistry.mgMerge(col("fsketch")).as("fsketch"),
        sum(col("n_rows")).as("n_rows")),
      stateCols = Seq("fsketch", "n_rows"), at = at, token = token)
  }

  /** Heavy-hitter candidates at the stored grain: one row per surviving
    * item — (group cols..., item, est, n, bound), where
    * `est ≤ true ≤ est + bound` deterministically. */
  def topK(spark: SparkSession, table: String,
           groupCols: Seq[String]): DataFrame = {
    graft.plans.FrequencyRegistry.install(spark)
    CommitLog.scan(spark, table)
      .select(groupCols.map(col) :+ col("n_rows") :+
        explode(graft.plans.FrequencyRegistry.mgTopK(col("fsketch")))
          .as("hh"): _*)
      .select(groupCols.map(col) :+ col("n_rows") :+
        col("hh.item").as("item") :+ col("hh.est").as("est") :+
        col("hh.n").as("n") :+ col("hh.bound").as("bound"): _*)
  }

  /** Heavy hitters at a COARSER grain by MG merge over state rows. */
  def topKAcross(spark: SparkSession, table: String,
                 overCols: Seq[String]): DataFrame = {
    graft.plans.FrequencyRegistry.install(spark)
    val base = CommitLog.scan(spark, table)
    val merged =
      if (overCols.isEmpty)
        base.agg(graft.plans.FrequencyRegistry.mgMerge(col("fsketch")).as("fsketch"),
          sum(col("n_rows")).as("n_rows"))
      else base.groupBy(overCols.map(col): _*)
        .agg(graft.plans.FrequencyRegistry.mgMerge(col("fsketch")).as("fsketch"),
          sum(col("n_rows")).as("n_rows"))
    merged
      .select(overCols.map(col) :+ col("n_rows") :+
        explode(graft.plans.FrequencyRegistry.mgTopK(col("fsketch")))
          .as("hh"): _*)
      .select(overCols.map(col) :+ col("n_rows") :+
        col("hh.item").as("item") :+ col("hh.est").as("est") :+
        col("hh.n").as("n") :+ col("hh.bound").as("bound"): _*)
  }

  /** DETERMINISTIC SAMPLE rollup — bottom-k (KMV) per group via
    * [[graft.plans.BottomKAgg]]: the k distinct items with the smallest
    * md5 hashes, a pure function of the item SET (order-, partition- and
    * merge-tree-independent), so the incrementally-maintained sample is
    * EXACTLY reproducible — its gate hash-matches the full sample against
    * a standard-SQL recompute, the strongest contract in the sketch
    * family. Semantically a uniform-without-replacement sample of the
    * distinct items (the KMV construction): the "show me example members
    * per group" a random reservoir cannot answer reproducibly. */
  def updateSampleRollup(batch: DataFrame, table: String,
                         groupCols: Seq[String], itemCol: String,
                         at: java.sql.Timestamp, k: Int = 64,
                         token: Option[String] = None): Unit = {
    graft.plans.BottomKRegistry.install(batch.sparkSession)
    updateRollup(batch, table, groupCols,
      batchAggs = Seq(
        graft.plans.BottomKRegistry.bkAgg(col(itemCol).cast("string"), k)
          .as("bsketch"),
        count(col(itemCol)).as("n_rows")),
      mergeAggs = Seq(
        graft.plans.BottomKRegistry.bkMerge(col("bsketch")).as("bsketch"),
        sum(col("n_rows")).as("n_rows")),
      stateCols = Seq("bsketch", "n_rows"), at = at, token = token)
  }

  /** Second-moment rollup — incremental LINEAR ALGEBRA state: per group,
    * (n, Σx as array[d], Σxxᵀ flattened as array[d²]) over the first
    * `dim` coordinates of a vector column. Moments are exactly mergeable
    * (element-wise add — [[graft.plans.VecSumAgg]]), so a covariance or
    * PCA model over a growing corpus refreshes at O(batch): new vectors
    * fold into the state row; the d×d eigen-solve on the readout side
    * ([[Projection.covarianceFromState]] → [[Projection.jacobiEigen]])
    * never touches the facts again. */
  def updateMomentsRollup(batch: DataFrame, table: String,
                          groupCols: Seq[String], vecCol: String, dim: Int,
                          at: java.sql.Timestamp,
                          token: Option[String] = None): Unit = {
    graft.plans.VecAggExprs.install(batch.sparkSession)
    val x = transform(slice(col(vecCol), 1, dim), _.cast("double"))
    val outer = flatten(transform(x, xi => transform(x, xj => xi * xj)))
    updateRollup(
      batch.withColumn("_x", x).withColumn("_xx", outer),
      table, groupCols,
      batchAggs = Seq(
        graft.plans.VecAggExprs.vecSum(col("_x")).as("sx"),
        graft.plans.VecAggExprs.vecSum(col("_xx")).as("sxx"),
        count(col("_x")).as("n_rows")),
      mergeAggs = Seq(
        graft.plans.VecAggExprs.vecSum(col("sx")).as("sx"),
        graft.plans.VecAggExprs.vecSum(col("sxx")).as("sxx"),
        sum(col("n_rows")).as("n_rows")),
      stateCols = Seq("sx", "sxx", "n_rows"), at = at, token = token)
  }

  /** The sample at its stored grain: one row per sampled item —
    * (group cols..., n_rows, sample_rank, item), rank hash-ascending. */
  def sampleItems(spark: SparkSession, table: String,
                  groupCols: Seq[String]): DataFrame = {
    graft.plans.BottomKRegistry.install(spark)
    CommitLog.scan(spark, table)
      .select(groupCols.map(col) :+ col("n_rows") :+
        posexplode(graft.plans.BottomKRegistry.bkItems(col("bsketch"))): _*)
      .withColumnRenamed("pos", "sample_rank")
      .withColumnRenamed("col", "item")
  }

  /** The sample at a COARSER grain by bottom-k merge over state rows —
    * still exactly the coarser grain's true bottom-k (min-k union is
    * idempotent), with no pass over facts. */
  def sampleAcross(spark: SparkSession, table: String,
                   overCols: Seq[String]): DataFrame = {
    graft.plans.BottomKRegistry.install(spark)
    val base = CommitLog.scan(spark, table)
    val merged =
      if (overCols.isEmpty)
        base.agg(graft.plans.BottomKRegistry.bkMerge(col("bsketch")).as("bsketch"),
          sum(col("n_rows")).as("n_rows"))
      else base.groupBy(overCols.map(col): _*)
        .agg(graft.plans.BottomKRegistry.bkMerge(col("bsketch")).as("bsketch"),
          sum(col("n_rows")).as("n_rows"))
    merged
      .select(overCols.map(col) :+ col("n_rows") :+
        posexplode(graft.plans.BottomKRegistry.bkItems(col("bsketch"))): _*)
      .withColumnRenamed("pos", "sample_rank")
      .withColumnRenamed("col", "item")
  }

  /** States below this size take the collected fast path in
    * [[updateRollup]]: the whole rollup state (sketch bytes included)
    * reads into the driver in one tiny job. 8 MB covers ~10^4 HLL/GK
    * groups; a genuinely large rollup (10^5+ groups on a cluster) flows
    * through the generic distributed path below untouched. */
  private val SmallStateBytes = 8L << 20

  /** Shared state-update algebra of the rollups: sketch the batch per
    * group, union with the stored state of the TOUCHED groups only
    * (untouched groups are never read twice, let alone rewritten), merge,
    * commit token-idempotently.
    *
    * SERIALIZABLE under concurrent writers via optimistic
    * read-modify-write: the merge reads the state AT a pinned version
    * (`scanAt`) and the commit carries `expectVersion` -- a racing
    * writer whose commit landed first makes this one fail with
    * [[CommitLog.ConcurrentWrite]] (or [[CommitLog.ConcurrentDelete]] on
    * a same-file collision) and the WHOLE read-merge-write re-runs
    * against the new state. Without the CAS, two racing updates with
    * disjoint file sets -- e.g. both first-commits on a fresh table --
    * would both blind-append, leaving duplicate rollup_id rows and each
    * missing the other's sketch mass.
    *
    * TWO EXECUTION SHAPES, same semantics (VERDICT r7 task #3 -- the
    * update cycle is commit-fixed-cost-bound, not data-bound):
    *  - SMALL STATE (<= [[SmallStateBytes]]): the state collects to the
    *    driver WITH file attribution while the batch aggregate collects
    *    CONCURRENTLY (two independent jobs sharing the cluster); touched
    *    groups, hit files and survivors resolve driver-side, and the
    *    final merge runs over LocalRelations in ONE small write job --
    *    three short jobs per cycle instead of five, no state file read
    *    twice.
    *  - LARGE STATE: the original distributed shape -- broadcast
    *    semi-join of the batch's group set onto the state stream, merge,
    *    generic [[CommitLog.upsertBatch]].
    * Both preserve the file-level contract pinned by SketchSpec: a file
    * holding only untouched groups is never rewritten. */
  private def updateRollup(batch: DataFrame, table: String,
                           groupCols: Seq[String],
                           batchAggs: Seq[org.apache.spark.sql.Column],
                           mergeAggs: Seq[org.apache.spark.sql.Column],
                           stateCols: Seq[String],
                           at: java.sql.Timestamp,
                           token: Option[String]): Unit = {
    // `month` is the commit log's partition column (derived from
    // updated_at) and resurfaces on every scan -- a group column with a
    // reserved name would be silently shadowed by it
    val reserved = Set("month", "rollup_id", "updated_at") ++ stateCols
    require(groupCols.forall(c => !reserved.contains(c)),
      s"group columns may not use reserved names " + reserved.mkString(", "))
    val spark = batch.sparkSession
    // replayed batch: the token already committed -> nothing to compute
    if (token.exists(CommitLog.tokenApplied(table, _))) return
    graft.core.Caching.narrowBatchScope(spark) {
      val gcols = groupCols.map(col)
      val bs = batch.groupBy(gcols: _*).agg(batchAggs.head, batchAggs.tail: _*)
      // rollup_id must be collision-proof across DISTINCT group tuples
      // (a separator char appearing in a value would merge two groups)
      // and must encode nulls distinctly from empty strings: md5 over
      // the JSON struct encoding (field-quoted, nulls kept) gives both
      def withIds(df: DataFrame): DataFrame = df
        .withColumn("rollup_id", md5(to_json(struct(gcols: _*),
          Map("ignoreNullFields" -> "false"))))
        .withColumn("updated_at", lit(at))
      def withMonth(df: DataFrame): DataFrame = df.withColumn("month",
        date_format(graft.functions.Buckets.utcFields(col("updated_at")), "yyyy-MM"))
      def stateBytes(snap: CommitLog.Snapshot): Long =
        snap.files.map { f =>
          try java.nio.file.Files.size(
            java.nio.file.Paths.get(table).resolve(f.path))
          catch { case _: Throwable => Long.MaxValue / 1024 }
        }.sum
      var attempts = 0
      var done = false
      while (!done) {
        val snap = CommitLog.snapshot(table)
        try {
          if (snap.files.isEmpty) {
            // first commit: the batch aggregate IS the state
            CommitLog.replaceFiles(withMonth(withIds(bs)), table, "updated_at",
              removes = Nil, sortCols = Seq("updated_at", "rollup_id"),
              token = token, statsHint = Some((0L, at.getTime * 1000L)),
              expectVersion = Some(snap.version))
          } else if (stateBytes(snap) <= SmallStateBytes) {
            fastCycle(spark, table, snap, bs, groupCols, stateCols,
              mergeAggs, at, token, withIds, withMonth)
          } else {
            // touched groups only: the rollup table streams through a
            // broadcast semi join on the batch's (small) group set.
            // NULL-SAFE keys (<=>): groupBy folds nulls into one group,
            // so a stored null-valued group must match the batch's null
            // group here or its prior sketch mass would be silently
            // replaced by the batch-only sketch
            val bkeys = broadcast(
              bs.select(groupCols.map(c => col(c).as(s"__bk_$c")): _*))
            val touched = groupCols
              .map(c => col(c) <=> col(s"__bk_$c")).reduce(_ && _)
            val all = CommitLog.scanAt(spark, table, snap.version)
              .select(gcols ++ stateCols.map(col): _*)
              .join(bkeys, touched, "left_semi")
              .unionByName(bs)
            val merged = withIds(
              all.groupBy(gcols: _*).agg(mergeAggs.head, mergeAggs.tail: _*))
            CommitLog.upsertBatch(merged, table,
              idCol = "rollup_id", tsCol = "updated_at", token = token,
              // (0, at): surviving rows carry earlier updated_at stamps, so
              // the bound must reach below `at` (upsertBatch note)
              statsHint = Some((0L, at.getTime * 1000L)),
              expectVersion = Some(snap.version))
          }
          done = true
        } catch {
          case e @ (_: CommitLog.ConcurrentWrite | _: CommitLog.ConcurrentDelete) =>
            attempts += 1
            if (attempts > 20) throw e // livelock guard; state is clean
        }
      }
    }
  }

  /** Small-state update cycle: state (with file attribution) and the
    * batch aggregate collect as CONCURRENT jobs; touched groups, hit
    * files and survivors resolve on the driver; one local-relation write
    * job stages merged ∪ survivors and [[CommitLog.replaceFiles]] commits
    * it against the pinned version. */
  /** Small-state update cycle: the state (with file attribution) and the
    * batch aggregate collect as two CONCURRENT jobs sharing the executor
    * pool; touched groups, hit files and survivors resolve on the
    * driver; one write job stages (touched ∪ batch → merge agg) ∪
    * survivors over LocalRelations and [[CommitLog.replaceFiles]]
    * commits it against the pinned version. Two short jobs + one commit
    * per cycle — the generic path pays five jobs and reads the state
    * files twice more. */
  private def fastCycle(spark: SparkSession, table: String,
                        snap: CommitLog.Snapshot, bs: DataFrame,
                        groupCols: Seq[String], stateCols: Seq[String],
                        mergeAggs: Seq[org.apache.spark.sql.Column],
                        at: java.sql.Timestamp, token: Option[String],
                        withIds: DataFrame => DataFrame,
                        withMonth: DataFrame => DataFrame): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val gcols = groupCols.map(col)
    val stDf = CommitLog.scanAt(spark, table, snap.version)
      .select((groupCols ++ stateCols ++ Seq("rollup_id", "updated_at"))
        .map(col) :+ input_file_name().as("_f"): _*)
    // two independent reads, one wall-clock wait: the tiny state scan and
    // the batch aggregation (the only real data work of the cycle) share
    // the executor pool instead of serializing
    val fState = Future(stDf.collect())
    val fBatch = Future(bs.collect())
    val stRows = Await.result(fState, Duration.Inf)
    val bsRows = Await.result(fBatch, Duration.Inf)
    val nG = groupCols.size
    def keyOf(r: org.apache.spark.sql.Row): Vector[Any] =
      (0 until nG).map(r.get).toVector
    val batchKeys = bsRows.iterator.map(keyOf).toSet
    val fIdx = stDf.columns.length - 1
    val touched = stRows.filter(r => batchKeys.contains(keyOf(r)))
    val hitUris = touched.map(_.getString(fIdx)).toSet
    val hitFiles = snap.files.filter(f => hitUris.exists(_.endsWith(f.path)))
    // survivors: untouched groups living in a hit file get carried into
    // the rewrite; untouched FILES are never rewritten (spec-pinned)
    val survivors = stRows.filter(r =>
      hitFiles.exists(f => r.getString(fIdx).endsWith(f.path)) &&
        !batchKeys.contains(keyOf(r)))
    val stSchema = org.apache.spark.sql.types.StructType(
      stDf.schema.fields.dropRight(1))
    import scala.jdk.CollectionConverters._
    def local(rows: Seq[org.apache.spark.sql.Row],
              schema: org.apache.spark.sql.types.StructType): DataFrame =
      spark.createDataFrame(
        rows.map(r => org.apache.spark.sql.Row.fromSeq(
          r.toSeq.take(schema.length))).asJava, schema)
    // both row shapes share the (groupCols ++ stateCols) PREFIX — one
    // local relation carries the whole merge input, no union analysis
    val mergeSchema = org.apache.spark.sql.types.StructType(
      stSchema.fields.take(nG + stateCols.size).map(_.copy(nullable = true)))
    val mergedIn = local((touched ++ bsRows).toIndexedSeq, mergeSchema)
    val merged = withIds(
      mergedIn.groupBy(gcols: _*).agg(mergeAggs.head, mergeAggs.tail: _*))
    // coalesce(1): the write is then two tasks end-to-end (local scan →
    // agg exchange → single writer) and preShuffled skips the
    // repartition(month) exchange — one file per month per cycle holds
    val staged = withMonth(
      merged.unionByName(local(survivors.toIndexedSeq, stSchema)))
      .coalesce(1)
    CommitLog.replaceFiles(staged, table, "updated_at",
      removes = hitFiles.map(_.path),
      sortCols = Seq("updated_at", "rollup_id"), token = token,
      statsHint = Some((0L, at.getTime * 1000L)),
      expectVersion = Some(snap.version), preShuffled = true)
    ()
  }

  /** Quantile-rollup state at its stored grain: group columns + exact
    * `n_rows` + `quantiles` (array aligned with `ps`). */
  def quantiles(spark: SparkSession, table: String, groupCols: Seq[String],
                ps: Seq[Double]): DataFrame = {
    graft.plans.QuantileRegistry.install(spark)
    CommitLog.scan(spark, table).select(
      groupCols.map(col) :+ col("n_rows") :+
        graft.plans.QuantileRegistry.gkQuantiles(col("qsketch"), ps)
          .as("quantiles"): _*)
  }

  /** Quantiles at a COARSER grain by GK merge over state rows -- no pass
    * over facts. `overCols` empty -> one global row. */
  def quantilesAcross(spark: SparkSession, table: String,
                      overCols: Seq[String], ps: Seq[Double]): DataFrame = {
    graft.plans.QuantileRegistry.install(spark)
    val base = CommitLog.scan(spark, table)
    val agg = Seq(
      graft.plans.QuantileRegistry.gkQuantiles(
        graft.plans.QuantileRegistry.gkMerge(col("qsketch")), ps).as("quantiles"),
      sum(col("n_rows")).as("n_rows"))
    if (overCols.isEmpty) base.agg(agg.head, agg.tail: _*)
    else base.groupBy(overCols.map(col): _*).agg(agg.head, agg.tail: _*)
  }

  /** Rollup state at its stored grain: group columns + exact `n_rows` +
    * `distinct_est` from the sketch. */
  def estimates(spark: SparkSession, table: String,
                groupCols: Seq[String]): DataFrame =
    CommitLog.scan(spark, table).select(
      groupCols.map(col) :+ col("n_rows") :+
        expr("hll_sketch_estimate(sketch)").as("distinct_est"): _*)

  /** Re-aggregate to a COARSER grain with a sketch union — the operation
    * exact distinct counts cannot do without re-reading facts: distinct
    * over any subset of group columns, straight from the state table.
    * `overCols` empty → one global row. */
  def estimateAcross(spark: SparkSession, table: String,
                     overCols: Seq[String]): DataFrame = {
    val base = CommitLog.scan(spark, table)
    val agg = Seq(expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
        .as("distinct_est"),
      sum(col("n_rows")).as("n_rows"))
    if (overCols.isEmpty) base.agg(agg.head, agg.tail: _*)
    else base.groupBy(overCols.map(col): _*).agg(agg.head, agg.tail: _*)
  }

  /** KMV set-operation estimates between every PAIR of groups, from
    * sample-rollup STATE alone — the set operation HLL union cannot
    * provide (intersections). For groups A, B with bottom-k samples
    * S_A, S_B (k smallest md5 hashes over distinct items), the k
    * smallest distinct items of S_A ∪ S_B are exactly the bottom-k
    * sample of A ∪ B, and every member of it that lies in S_A ∩ S_B is
    * in A ∩ B (its hash clears both per-set thresholds) — so
    * `jaccard_est = |bottom_k(S_A ∪ S_B) ∩ S_A ∩ S_B| / k_eff` is the
    * classic KMV Jaccard estimator, σ ≈ √(J(1−J)/k).
    *
    * Determinism: the estimate is a pure function of the two item SETS
    * through their md5-hex order (ties break on the item itself), so it
    * is identical under any partitioning or merge order, and an oracle
    * with md5 replays it bit-for-bit. The only shuffle is state-sized
    * (pairs × k rows); facts are never read. */
  def jaccardAcross(spark: SparkSession, table: String,
                    groupCol: String, k: Int): DataFrame = {
    val s = sampleItems(spark, table, Seq(groupCol))
      .select(col(groupCol).as("g"), col("item"))
    val gs = s.select(col("g")).distinct()
    val pairs = gs.select(col("g").as("lang_a"))
      .crossJoin(gs.select(col("g").as("lang_b")))
      .filter(col("lang_a") < col("lang_b"))
    val aSide = pairs.join(s.withColumnRenamed("g", "lang_a"), Seq("lang_a"))
      .select(col("lang_a"), col("lang_b"), col("item"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
    val bSide = pairs.join(s.withColumnRenamed("g", "lang_b"), Seq("lang_b"))
      .select(col("lang_a"), col("lang_b"), col("item"),
        lit(0L).as("in_a"), lit(1L).as("in_b"))
    val cand = aSide.unionByName(bSide)
      .groupBy(col("lang_a"), col("lang_b"), col("item"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      // hex prefix ORDER == unsigned numeric order of the 8-byte hash;
      // staying in string space keeps both engines' comparisons identical
      .withColumn("hh", substring(md5(col("item").cast("binary")), 1, 16))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang_a"), col("lang_b"))
      .orderBy(col("hh"), col("item"))
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("lang_a"), col("lang_b"))
      .agg(count(lit(1)).as("k_eff"),
        sum(col("in_a") * col("in_b")).as("overlap_k"))
      .withColumn("jaccard_est",
        col("overlap_k").cast("double") / col("k_eff").cast("double"))
  }

  /** ON-DISK FORMAT BREAK (one-shot repair): rollup_id changed from a
    * separator-joined string to `md5(to_json(struct(groupCols)))`. The
    * incremental paths remove superseded rows by rollup_id, so a persisted
    * rollup written under the OLD format would never be matched — every
    * refresh would add a duplicate row per touched group and double-count
    * sketch mass. Run this once per surviving pre-upgrade table: it
    * recomputes each row's id from its group VALUES (the id is a pure
    * function of them, so no old-format parsing is needed) and rewrites
    * the table only if any stored id mismatches. Idempotent; CAS-guarded
    * against concurrent refreshes. Returns the number of rows whose id
    * was rewritten (0 = already current format, nothing written).
    *
    * `groupCols` is an unordered SET here: the id is
    * field-ORDER-sensitive (`to_json` of a struct), and the order that
    * counts is the one the table's refresh callers use — which
    * [[updateRollup]] persists as the stored column prefix. Trusting the
    * argument order instead would let a migrate call with the same
    * columns in a different order rewrite every id to a format no future
    * refresh matches — silently reintroducing the duplicate-row bug this
    * migration exists to fix. So the order is derived from the stored
    * schema, not the argument. */
  def migrateRollupIds(spark: SparkSession, table: String,
                       groupCols: Seq[String]): Long = {
    var attempts = 0
    while (true) {
      val snap = CommitLog.snapshot(table)
      if (snap.files.isEmpty) return 0L
      // stored-schema order: updateRollup writes groupCols as the leading
      // columns in refresh-caller order, so filtering the stored column
      // list by membership recovers that order for any argument order
      val storedCols = CommitLog.scanAt(spark, table, snap.version).columns
      val ordered = storedCols.filter(groupCols.contains).toSeq
      require(ordered.toSet == groupCols.toSet,
        s"group columns ${groupCols.filterNot(ordered.contains).mkString(",")} " +
          s"not present in rollup table $table (stored: ${storedCols.mkString(",")})")
      val expected = md5(to_json(struct(ordered.map(col): _*),
        Map("ignoreNullFields" -> "false")))
      val all = CommitLog.scanAt(spark, table, snap.version)
        .withColumn("_new_id", expected)
      val stale = all.filter(!(col("rollup_id") <=> col("_new_id"))).count()
      if (stale == 0L) return 0L
      val fixed = all.withColumn("rollup_id", col("_new_id")).drop("_new_id")
      try {
        CommitLog.replaceFiles(fixed, table, "updated_at",
          removes = snap.files.map(_.path),
          sortCols = Seq("updated_at", "rollup_id"),
          token = Some(s"rollup-id-migrate-${snap.version}"),
          statsHint = Some((0L, System.currentTimeMillis() * 1000L)),
          expectVersion = Some(snap.version))
        return stale
      } catch {
        case e @ (_: CommitLog.ConcurrentWrite | _: CommitLog.ConcurrentDelete) =>
          attempts += 1
          if (attempts > 20) throw e
      }
    }
    0L // unreachable
  }
}
