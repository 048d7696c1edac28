package graft

import graft.operators.{CommitLog, Sketches}
import org.apache.spark.sql.functions._

/** HLL sketch rollup: incremental == one-shot, replay idempotent, coarser
  * grains re-aggregate from state alone, untouched groups never rewrite. */
class SketchSpec extends GraftSuite {

  private def mkTable(): String = java.nio.file.Files
    .createTempDirectory("graft_sketchspec").toString + "/rollup"
  private val ts0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
  private def at(i: Int) =
    new java.sql.Timestamp(ts0.getTime + i * 3600000L)

  test("incremental rollup equals one-shot build; replay is a no-op; " +
      "estimates within the HLL bound of exact") {
    val spark2 = spark
    import spark2.implicits._
    // 3 groups x overlapping member sets; values repeat across batches so
    // the sketch union (not concatenation) is what keeps estimates sane
    val rows = (1L to 3000L).map(i => (s"g${i % 3}", i % 700))
    val df = rows.toDF("grp", "uid")
    val inc = mkTable()
    (0 until 3).foreach { b =>
      Sketches.updateDistinctRollup(
        df.filter(pmod(col("uid"), lit(3)) === b), inc,
        Seq("grp"), "uid", at(b), token = Some(s"t$b"))
    }
    // replay batch 0 under its token: state must not move
    val verBefore = CommitLog.snapshot(inc).version
    Sketches.updateDistinctRollup(
      df.filter(pmod(col("uid"), lit(3)) === 0), inc,
      Seq("grp"), "uid", at(0), token = Some("t0"))
    assert(CommitLog.snapshot(inc).version == verBefore)

    val once = mkTable()
    Sketches.updateDistinctRollup(df, once, Seq("grp"), "uid", at(9))

    def state(t: String): Map[String, (Long, Double)] =
      Sketches.estimates(spark, t, Seq("grp")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2).toDouble)).toMap
    val (si, so) = (state(inc), state(once))
    assert(si.keySet == Set("g0", "g1", "g2"))
    assert(si.view.mapValues(_._1).toMap == so.view.mapValues(_._1).toMap,
      s"row accounting diverged: $si vs $so")
    val exact = df.groupBy("grp").agg(countDistinct(col("uid")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    si.foreach { case (g, (n, est)) =>
      assert(n == df.filter(col("grp") === g).count(), s"n_rows wrong for $g")
      assert(math.abs(est - exact(g)) <= math.max(1.0, 0.05 * exact(g)),
        s"estimate for $g drifted: $est vs exact ${exact(g)}")
      // incremental and one-shot need not be BIT-identical (union order),
      // but both sit inside the same bound
      assert(math.abs(so(g)._2 - exact(g)) <= math.max(1.0, 0.05 * exact(g)))
    }
  }

  test("migrateRollupIds: pre-upgrade concat-format ids are rewritten once; " +
      "refreshes then match instead of duplicating") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 900L).map(i => (s"g${i % 3}", i)).toDF("grp", "uid")
    val t = mkTable()
    Sketches.updateDistinctRollup(df, t, Seq("grp"), "uid", at(0))
    // regress the table to the OLD on-disk id format (separator-joined)
    val snap = CommitLog.snapshot(t)
    val oldFormat = CommitLog.scanAt(spark, t, snap.version)
      .withColumn("rollup_id", concat_ws("|", col("grp")))
    CommitLog.replaceFiles(oldFormat, t, "updated_at",
      removes = snap.files.map(_.path),
      sortCols = Seq("updated_at", "rollup_id"),
      statsHint = Some((0L, at(1).getTime * 1000L)))

    val migrated = Sketches.migrateRollupIds(spark, t, Seq("grp"))
    assert(migrated == 3L, s"expected 3 rewritten ids, got $migrated")
    // idempotent: second call sees current format, writes nothing
    val v = CommitLog.snapshot(t).version
    assert(Sketches.migrateRollupIds(spark, t, Seq("grp")) == 0L)
    assert(CommitLog.snapshot(t).version == v)
    // a refresh now MATCHES the migrated rows: still one row per group,
    // accounting exact (pre-migration this would duplicate each group)
    Sketches.updateDistinctRollup(df, t, Seq("grp"), "uid", at(2))
    val st = Sketches.estimates(spark, t, Seq("grp")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(st.size == 3, s"duplicate rollup rows after migration: ${st.toList}")
    assert(st.toMap.values.toSet == Set(600L), s"double-counted rows: ${st.toList}")
  }

  test("migrateRollupIds: argument order is irrelevant — the stored schema " +
      "order defines the id, so refreshes always match post-migration") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 600L).map(i => (s"g${i % 2}", s"s${i % 3}", i))
      .toDF("grp", "sub", "uid")
    val t = mkTable()
    Sketches.updateDistinctRollup(df, t, Seq("grp", "sub"), "uid", at(0))
    // regress to the old separator-joined format
    val snap = CommitLog.snapshot(t)
    val oldFormat = CommitLog.scanAt(spark, t, snap.version)
      .withColumn("rollup_id", concat_ws("|", col("grp"), col("sub")))
    CommitLog.replaceFiles(oldFormat, t, "updated_at",
      removes = snap.files.map(_.path),
      sortCols = Seq("updated_at", "rollup_id"),
      statsHint = Some((0L, at(1).getTime * 1000L)))

    // migrate with the group columns REVERSED vs the refresh callers' order:
    // the rewritten ids must still be the ones updateRollup computes
    assert(Sketches.migrateRollupIds(spark, t, Seq("sub", "grp")) == 6L)
    Sketches.updateDistinctRollup(df, t, Seq("grp", "sub"), "uid", at(2))
    val st = Sketches.estimates(spark, t, Seq("grp", "sub")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toSeq
    assert(st.size == 6, s"duplicate rollup rows after reversed-arg migration: $st")
    assert(st.toMap.values.toSet == Set(200L), s"double-counted rows: $st")

    // an argument column the table doesn't have is an error, not a rewrite
    intercept[IllegalArgumentException] {
      Sketches.migrateRollupIds(spark, t, Seq("grp", "nope"))
    }
  }

  test("estimateAcross: coarser grain from sketches matches exact distinct " +
      "across the union (overlapping member sets)") {
    val spark2 = spark
    import spark2.implicits._
    // g0 and g1 overlap heavily: sum-of-groups would be ~2x the union
    val df = ((1L to 800L).map(i => ("g0", i)) ++
      (400L to 1200L).map(i => ("g1", i))).toDF("grp", "uid")
    val t = mkTable()
    Sketches.updateDistinctRollup(df, t, Seq("grp"), "uid", at(0))
    val global = Sketches.estimateAcross(spark, t, Seq.empty).head()
    val est = global.getLong(0).toDouble
    assert(global.getLong(1) == df.count())
    assert(math.abs(est - 1200.0) <= 0.05 * 1200.0,
      s"global union estimate $est not near 1200 (sum of groups would be 1601)")
  }

  test("rollup identity survives concat-colliding and NULL group keys " +
      "across batches (ADVICE r7: rollup_id + null-safe touched-group join)") {
    val spark2 = spark
    import spark2.implicits._
    // ("2024-1","1x") vs ("2024-11","x"): any separator-free concat of the
    // group tuple collides; each must keep its own accumulated state.
    // (null, "x"): concat_ws skips nulls and equality joins never match
    // null keys — both failure modes replace prior state with the batch's.
    val rows: Seq[(String, String, Long)] =
      (1L to 300L).map(i => ("2024-1", "1x", i)) ++
      (201L to 500L).map(i => ("2024-11", "x", i)) ++
      (1L to 250L).map(i => (null: String, "x", i))
    val df = rows.toDF("bkt", "dim", "uid")
    val t = mkTable()
    // two batches, both touching all three groups
    (0 until 2).foreach { b =>
      Sketches.updateDistinctRollup(
        df.filter(pmod(col("uid"), lit(2)) === b), t,
        Seq("bkt", "dim"), "uid", at(b), token = Some(s"c$b"))
    }
    val st = Sketches.estimates(spark, t, Seq("bkt", "dim")).collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getLong(3).toDouble)).toMap
    assert(st.keySet == Set(
      (Some("2024-1"), "1x"), (Some("2024-11"), "x"), (None, "x")),
      s"group identity lost: ${st.keySet}")
    val exact = Map[(Option[String], String), Long](
      (Some("2024-1"), "1x") -> 300L, (Some("2024-11"), "x") -> 300L,
      (None, "x") -> 250L)
    exact.foreach { case (k, d) =>
      val (n, est) = st(k)
      assert(n == d, s"n_rows for $k lost prior batch mass: $n != $d")
      assert(math.abs(est - d) <= math.max(1.0, 0.05 * d),
        s"estimate for $k drifted: $est vs $d")
    }
  }

  test("quantile rollup: incremental build honours the GK rank bound at " +
      "stored and merged grains; replay is a no-op; empty sketch reads null") {
    val spark2 = spark
    import spark2.implicits._
    // skewed values (power-ish) so p50 and p95 are far apart and a
    // mis-merge shows up immediately
    val rows = (1L to 6000L).map(i => (s"g${i % 3}", (i % 77).toDouble * (i % 13)))
    val df = rows.toDF("grp", "v")
    val t = mkTable()
    (0 until 3).foreach { b =>
      Sketches.updateQuantileRollup(
        df.filter(pmod(col("v").cast("long"), lit(3)) === b), t,
        Seq("grp"), "v", at(b), token = Some(s"q$b"))
    }
    val verBefore = CommitLog.snapshot(t).version
    Sketches.updateQuantileRollup(
      df.filter(pmod(col("v").cast("long"), lit(3)) === 0), t,
      Seq("grp"), "v", at(0), token = Some("q0"))
    assert(CommitLog.snapshot(t).version == verBefore, "replay moved state")

    def rankOk(vals: Seq[Double], est: Double, p: Double): Boolean = {
      val n = vals.size
      val lt = vals.count(_ < est); val le = vals.count(_ <= est)
      lt <= (p + 0.05) * n && le >= (p - 0.05) * n
    }
    val byGrp = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = Sketches.quantiles(spark, t, Seq("grp"), Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getSeq[Double](2))).toMap
    got.foreach { case (g, (n, qs)) =>
      assert(n == byGrp(g).size, s"n_rows wrong for $g")
      assert(rankOk(byGrp(g), qs(0), 0.5), s"$g p50=${qs(0)} violates rank bound")
      assert(rankOk(byGrp(g), qs(1), 0.95), s"$g p95=${qs(1)} violates rank bound")
    }
    // merged grain: global quantiles from state only
    val all = rows.map(_._2)
    val g = Sketches.quantilesAcross(spark, t, Seq.empty, Seq(0.5, 0.95)).head()
    val gq = g.getSeq[Double](0)
    assert(g.getLong(1) == all.size)
    assert(rankOk(all, gq(0), 0.5) && rankOk(all, gq(1), 0.95))

    // an all-null group still merges as identity and reads null quantiles
    val tn = mkTable()
    Sketches.updateQuantileRollup(
      Seq(("gx", Option.empty[java.lang.Double])).toDF("grp", "v"),
      tn, Seq("grp"), "v", at(0))
    val nullRow = Sketches.quantiles(spark, tn, Seq("grp"), Seq(0.5)).head()
    assert(nullRow.getLong(1) == 0 && nullRow.isNullAt(2))
  }

  test("MG heavy hitters: the deterministic bound holds incrementally and " +
      "across merged grains; a light tail never evicts a guaranteed-heavy item") {
    val spark2 = spark
    import spark2.implicits._
    // 3 heavy items (~10% each) over a 2000-item uniform tail, two groups
    val heavyRows = for (g <- Seq("a", "b"); h <- 1 to 3; _ <- 1 to 400)
      yield (g, s"HH$h")
    val tailRows = for (g <- Seq("a", "b"); i <- 1 to 2800)
      yield (g, s"t${i % 1400}")
    val df = scala.util.Random.shuffle(heavyRows ++ tailRows)
      .zipWithIndex.map { case ((g, it), i) => (g, it, i.toLong) }
      .toDF("grp", "item", "rid")
    val t = mkTable()
    (0 until 3).foreach { b =>
      Sketches.updateTopKRollup(
        df.filter(pmod(col("rid"), lit(3)) === b), t,
        Seq("grp"), "item", at(b), k = 32, token = Some(s"m$b"))
    }
    val verBefore = CommitLog.snapshot(t).version
    Sketches.updateTopKRollup(df.filter(pmod(col("rid"), lit(3)) === 0), t,
      Seq("grp"), "item", at(0), k = 32, token = Some("m0"))
    assert(CommitLog.snapshot(t).version == verBefore, "replay moved state")

    val trueCounts = df.groupBy("grp", "item").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val got = Sketches.topK(spark, t, Seq("grp")).collect()
      .map(r => ((r.getString(0), r.getString(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    Seq("a", "b").foreach { g =>
      val n = trueCounts.collect { case ((`g`, _), c) => c }.sum
      (1 to 3).foreach { h =>
        val key = (g, s"HH$h")
        assert(got.contains(key), s"guaranteed-heavy $key missing from sketch")
        val (est, nSk, bound) = got(key)
        assert(nSk == n, s"sketch n wrong for $g")
        assert(est <= trueCounts(key) && trueCounts(key) <= est + bound,
          s"$key: est=$est true=${trueCounts(key)} bound=$bound")
      }
    }
    // merged grain: global heavy hitters from state only (HH items are
    // ~10% globally too)
    val global = Sketches.topKAcross(spark, t, Seq.empty).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(4))).toMap
    (1 to 3).foreach { h =>
      val item = s"HH$h"
      val trueC = trueCounts(("a", item)) + trueCounts(("b", item))
      assert(global.contains(item), s"global heavy $item missing")
      val (est, bound) = global(item)
      assert(est <= trueC && trueC <= est + bound,
        s"global $item: est=$est true=$trueC bound=$bound")
    }
  }

  test("bottom-k sample rollup: incremental == one-shot EXACTLY (not just " +
      "within tolerance); replay no-op; coarser grain is the true bottom-k") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 2000L).map(i => (s"g${i % 2}", i)).toDF("grp", "id")
    val inc = mkTable()
    (0 until 3).foreach { b =>
      Sketches.updateSampleRollup(
        df.filter(pmod(col("id"), lit(3)) === b), inc,
        Seq("grp"), "id", at(b), k = 16, token = Some(s"s$b"))
    }
    val verBefore = CommitLog.snapshot(inc).version
    Sketches.updateSampleRollup(df.filter(pmod(col("id"), lit(3)) === 0), inc,
      Seq("grp"), "id", at(0), k = 16, token = Some("s0"))
    assert(CommitLog.snapshot(inc).version == verBefore, "replay moved state")

    val once = mkTable()
    Sketches.updateSampleRollup(df, once, Seq("grp"), "id", at(9), k = 16)
    def sample(t: String): Seq[(String, Long, Int, String)] =
      Sketches.sampleItems(spark, t, Seq("grp")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getString(3)))
        .toSeq.sorted
    assert(sample(inc) == sample(once),
      "incremental sample diverged from one-shot — bottom-k must be exact")
    // the sample really is the k hash-smallest: recompute in-JVM
    val want = (1L to 2000L).map(i => (s"g${i % 2}", i.toString))
      .groupBy(_._1).view.mapValues(_.map(_._2)
        .sortBy(it => (graft.plans.BottomKExprs.hashOf(it), it))(
          Ordering.Tuple2(new Ordering[Long] {
            def compare(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b)
          }, Ordering.String))
        .take(16)).toMap
    sample(inc).groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.sortBy(_._3).map(_._4) == want(g),
        s"$g sample is not the hash-minimal 16")
    }
    // global grain from state only == true global bottom-k
    val globalGot = Sketches.sampleAcross(spark, inc, Seq.empty)
      .orderBy(col("sample_rank")).collect().map(_.getString(2)).toSeq
    val globalWant = (1L to 2000L).map(_.toString)
      .sortBy(it => (graft.plans.BottomKExprs.hashOf(it), it))(
        Ordering.Tuple2(new Ordering[Long] {
          def compare(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b)
        }, Ordering.String))
      .take(16)
    assert(globalGot == globalWant, "merged grain is not the true bottom-k")
  }

  test("streaming rollup intake: a MemoryStream drains into the state " +
      "table, a replayed epoch is a no-op, and the readout matches a " +
      "one-shot batch build") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val t = mkTable()
    val chk = java.nio.file.Files
      .createTempDirectory("graft_sketchstream").toString
    val q = graft.streaming.SketchStream.distinctRollupIntake(
      mem.toDF().toDF("grp", "uid"), t, Seq("grp"), "uid", chk)
    try {
      mem.addData((1L to 400L).map(i => (s"g${i % 2}", i % 90)))
      q.processAllAvailable()
      mem.addData((1L to 400L).map(i => (s"g${i % 2}", i % 150)))
      q.processAllAvailable()
    } finally q.stop()
    // epoch replay straight at the batch helper: token must no-op
    val verBefore = CommitLog.snapshot(t).version
    graft.streaming.SketchStream.distinctRollupBatch(
      Seq(("g0", 1L)).toDF("grp", "uid"), 1L, t, Seq("grp"), "uid")
    assert(CommitLog.snapshot(t).version == verBefore, "replayed epoch moved state")

    val once = mkTable()
    val all = ((1L to 400L).map(i => (s"g${i % 2}", i % 90)) ++
      (1L to 400L).map(i => (s"g${i % 2}", i % 150))).toDF("grp", "uid")
    Sketches.updateDistinctRollup(all, once, Seq("grp"), "uid", at(0))
    def state(tbl: String) =
      Sketches.estimates(spark, tbl, Seq("grp")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(state(t) == state(once),
      s"streamed state diverged from one-shot: ${state(t)} vs ${state(once)}")
  }

  test("streaming top-k intake: MG heavy-hitter state streams in, a " +
      "replayed epoch no-ops, and the readout matches a one-shot build") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val t = mkTable()
    val chk = java.nio.file.Files
      .createTempDirectory("graft_sketchstream_topk").toString
    // skewed token stream: "hot" dominates, tail of 50 others
    def epoch(seed: Int) = (1 to 300).map(i =>
      (s"g${i % 2}", if (i % 3 != 0) "hot" else s"tok${(i + seed) % 50}"))
    val q = graft.streaming.SketchStream.topKRollupIntake(
      mem.toDF().toDF("grp", "tok"), t, Seq("grp"), "tok", chk, k = 16)
    try {
      mem.addData(epoch(0)); q.processAllAvailable()
      mem.addData(epoch(7)); q.processAllAvailable()
    } finally q.stop()
    val verBefore = CommitLog.snapshot(t).version
    graft.streaming.SketchStream.topKRollupBatch(
      Seq(("g0", "hot")).toDF("grp", "tok"), 1L, t, Seq("grp"), "tok", k = 16)
    assert(CommitLog.snapshot(t).version == verBefore, "replayed epoch moved state")

    val once = mkTable()
    Sketches.updateTopKRollup((epoch(0) ++ epoch(7)).toDF("grp", "tok"),
      once, Seq("grp"), "tok", at(0), k = 16)
    // MG surviving-counter SETS are merge-tree-dependent for sub-threshold
    // items — the deterministic contract is the BOUND, not set equality:
    // est <= true <= est + bound for every survivor, and the dominant
    // token (far above the (n-m)/(k+1) threshold) survives in every build.
    val truth = (epoch(0) ++ epoch(7)).groupBy(identity)
      .map { case (kk, xs) => kk -> xs.size.toLong }
    // topK schema: (grp, n_rows, item, est, n, bound)
    def rows(tbl: String) = Sketches.topK(spark, tbl, Seq("grp")).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(5)))
    Seq(t -> "streamed", once -> "one-shot").foreach { case (tbl, tag) =>
      val hh = rows(tbl)
      assert(hh.count(_._2 == "hot") == 2, s"$tag: hot missing: ${hh.toSeq}")
      hh.foreach { case (g, item, est, bound) =>
        val tc = truth.getOrElse((g, item), 0L)
        assert(est <= tc && tc <= est + bound,
          s"$tag: ($g,$item) est=$est bound=$bound true=$tc violates MG contract")
      }
    }
  }

  test("concurrent writers: racing rollup updates serialize through the " +
      "version CAS -- no lost sketch mass, no duplicate state rows") {
    val spark2 = spark
    import spark2.implicits._
    val t = mkTable()
    // 4 writers race from a FRESH table (the blind-append hazard: with no
    // CAS, first-commits have disjoint file sets and all would land)
    val batches = (0 until 4).map { w =>
      ((w * 500 + 1) to (w * 500 + 500)).map(i => (s"g${i % 2}", i.toLong))
        .toDF("grp", "uid")
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(batches.zipWithIndex.map { case (b, w) =>
        scala.concurrent.Future(
          Sketches.updateDistinctRollup(b, t, Seq("grp"), "uid", at(w)))
      }), scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()

    val rows = CommitLog.scan(spark, t).select("grp").collect().map(_.getString(0))
    assert(rows.sorted.toSeq == Seq("g0", "g1"),
      s"expected exactly one state row per group, got ${rows.toSeq}")
    val once = mkTable()
    Sketches.updateDistinctRollup(batches.reduce(_.unionByName(_)), once,
      Seq("grp"), "uid", at(9))
    def state(tbl: String) =
      Sketches.estimates(spark, tbl, Seq("grp")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(state(t) == state(once),
      s"racing writers lost mass: ${state(t)} vs ${state(once)}")
  }

  test("rollup state retention composes with deleteWhere: old buckets " +
      "drop by group predicate, survivors untouched, updates continue") {
    val spark2 = spark
    import spark2.implicits._
    val t = mkTable()
    // time-bucketed grain (bkt, grp): the shape the Runner rollup uses
    val df = (1L to 600L).map(i =>
      (s"2024-0${i % 3 + 1}", s"g${i % 2}", i % 97)).toDF("bkt", "grp", "uid")
    Sketches.updateDistinctRollup(df, t, Seq("bkt", "grp"), "uid", at(0))
    val before = Sketches.estimates(spark, t, Seq("bkt", "grp")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(before.size == 6)
    // retention: drop the oldest bucket's state rows by GROUP predicate
    // (the commit-log month partition tracks updated_at, not the grain --
    // state retention is row-level by design)
    val removed = CommitLog.deleteWhere(spark, t,
      col("bkt") === "2024-01", idCol = "rollup_id", tsCol = "updated_at")
    assert(removed > 0)
    val after = Sketches.estimates(spark, t, Seq("bkt", "grp")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(after.keySet == before.keySet.filterNot(_._1 == "2024-01"))
    assert(after.forall { case (k, v) => before(k) == v },
      "surviving buckets' state changed under retention")
    // the table still accepts updates after the rewrite
    Sketches.updateDistinctRollup(
      Seq(("2024-04", "g0", 7L)).toDF("bkt", "grp", "uid"),
      t, Seq("bkt", "grp"), "uid", at(1))
    assert(Sketches.estimates(spark, t, Seq("bkt", "grp"))
      .filter(col("bkt") === "2024-04").count() == 1)
  }

  test("only touched groups rewrite: an update to one group leaves the " +
      "other groups' stored sketch bytes untouched") {
    val spark2 = spark
    import spark2.implicits._
    val t = mkTable()
    val base = (1L to 900L).map(i => (s"g${i % 3}", i)).toDF("grp", "uid")
    Sketches.updateDistinctRollup(base, t, Seq("grp"), "uid", at(0))
    def sketchOf(g: String): Seq[Byte] =
      CommitLog.scan(spark, t).filter(col("grp") === g)
        .select("sketch").head().getAs[Array[Byte]](0).toSeq
    val (g1Before, g2Before) = (sketchOf("g1"), sketchOf("g2"))
    Sketches.updateDistinctRollup(
      Seq(("g0", 5000L), ("g0", 5001L)).toDF("grp", "uid"),
      t, Seq("grp"), "uid", at(1))
    assert(sketchOf("g1") == g1Before && sketchOf("g2") == g2Before,
      "untouched groups' sketches changed")
    val g0 = Sketches.estimates(spark, t, Seq("grp"))
      .filter(col("grp") === "g0").head()
    assert(g0.getLong(1) == 300 + 2)
  }
}
