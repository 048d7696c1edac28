package graft

import graft.plans.JsonMatchExpr
import org.apache.spark.sql.functions._

class PlanSpec extends GraftSuite {

  private def countJsonMatchNodes(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: JsonMatchExpr => n += 1
      case _ => ()
    }))
    n
  }

  test("json_match filter stays inside WholeStageCodegen (real doGenCode)") {
    JsonMatchExpr.register(spark)
    val e = graft.core.Tables.events(spark, sf)
      .filter(expr("""json_match('{"k":{"$lt":30}}', props)"""))
    assert(countJsonMatchNodes(e) == 1)
    // the round-2 CodegenFallback marker pushed the Filter OUT of
    // WholeStageCodegen (an un-starred Filter node between codegen stages);
    // with real doGenCode the filter must be fused: no bare "Filter" line
    val phys = e.queryExecution.executedPlan.toString
    val bareFilter = phys.linesIterator.exists(l => l.trim.startsWith("Filter "))
    assert(!bareFilter, s"json_match filter fell out of WholeStageCodegen:\n$phys")
    assert(phys.contains("json_match"), phys)
  }

  test("json_match strict typing holds on the execution path") {
    JsonMatchExpr.register(spark)
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("""{"k":87}""", """{"k":12}""", """{"k":"50"}""", """{"x":1}""")
      .toDF("j")
    val got = df.filter(expr("""json_match('{"k":{"$gte":50}}', j)"""))
      .collect().map(_.getString(0)).toSet
    // reference operators.go:73-146: the string "50" never compares with 50
    assert(got == Set("""{"k":87}"""))
  }

  test("JsonMatchExpr evaluator path agrees with the pure evaluator") {
    JsonMatchExpr.register(spark)
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq("""{"k":87,"s":"ab"}""", """{"k":3}""", """not json""", """{"s":"zz"}""")
    val schema = """{"$or":[{"k":{"$gte":50}},{"s":{"$startsWith":"z"}}]}"""
    val got = docs.toDF("j")
      .withColumn("m", expr(s"json_match('$schema', j)"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    docs.foreach { d =>
      assert(got(d) == graft.functions.JsonMatch.matches(schema, d), d)
    }
  }

  test("dsir importance: the log-ratio table broadcasts, tokens never re-shuffle for it") {
    val df = graft.queries.CurationOps.dsirImportance(
      graft.core.Tables.documents(spark, sf))
    val phys = df.queryExecution.executedPlan.toString
    // the 256-bucket lr table must come in as a broadcast build side (the
    // tiny c_t/c_s distribution aggregates legitimately exchange their
    // 256-bucket partials); the TOKEN-STREAM probe side must flow
    // Generate → Project → BroadcastHashJoin with no exchange of its own
    val lines = phys.linesIterator.toVector
    val bhj = lines.indexWhere(l =>
      l.contains("BroadcastHashJoin [bucket") && l.contains("BuildRight"))
    assert(bhj >= 0, s"no broadcast join on bucket:\n$phys")
    val probeSide = lines.drop(bhj + 1)
      .takeWhile(l => !l.contains("BroadcastExchange"))
    assert(probeSide.exists(_.contains("Generate explode")), phys)
    assert(!probeSide.exists(_.contains("Exchange")),
      s"token stream re-shuffled before the broadcast join:\n$phys")
  }

  test("mixture sample: per-group rates broadcast onto the doc stream") {
    val df = graft.queries.CurationOps.mixtureSample(
      graft.core.Tables.documents(spark, sf), "lang", k = 5.0)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys)
  }

  test("span removal: scan prunes to (doc_id, text); rewrite is the native expression") {
    // another suite's span-removal run leaves its persisted gram frame in
    // the cache manager; a plan-matched InMemoryTableScan would replace
    // the parquet scan this test inspects
    spark.catalog.clearCache()
    val df = graft.operators.Dedup.removeDuplicateSpans(
      graft.core.Tables.documents(spark, sf))
    val phys = df.queryExecution.executedPlan.toString
    // the parquet scan must read only the two columns the operator uses
    val readSchema = phys.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text") &&
      !readSchema.contains("source") && !readSchema.contains("lang"),
      s"scan not pruned to (doc_id, text): $readSchema")
    // the per-row rewrite is the codegen'd expression, not a HOF chain
    // (the shingle TRANSFORM in the census stage is legitimately a HOF;
    // the rewrite projection itself must carry only graft_span_scrub)
    assert(phys.contains("graft_span_scrub"), phys)
    assert(!phys.contains("aggregate(lambdafunction"),
      s"interval-merge HOF fold leaked back into the plan:\n$phys")
  }

  test("mixture sample: rate clamps to 1.0 and keeps every doc in tiny groups") {
    val spark2 = spark
    import spark2.implicits._
    // group "big" has 400 docs (rate 5/20 = 0.25), "tiny" has 4 (rate 1.0)
    val docs = ((1 to 400).map(i => (i.toLong, "big")) ++
      (1001 to 1004).map(i => (i.toLong, "tiny"))).toDF("doc_id", "grp")
    val got = graft.queries.CurationOps.mixtureSample(docs, "grp", k = 5.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("big", "tiny"))
    val big = got.head
    assert(big._2 == 400L && math.abs(big._3 - 0.25) < 1e-9)
    // hash-thresholded keep count concentrates near rate·n; exact value is
    // deterministic, bound it loosely so the pin survives data edits
    assert(big._4 > 60 && big._4 < 140, s"kept ${big._4} of 400 at rate 0.25")
    val tiny = got(1)
    assert(tiny._3 == 1.0 && tiny._4 == 4L, "rate-1 group must keep all docs")
  }

  test("bm25 plan: broadcast query join, no exchange partitioned by term alone") {
    // the gate's public form localCheckpoints (r12 shared-scan cache);
    // assert on the pre-checkpoint interior
    val (slim, df) = graft.operators.Retrieval.bm25Frames(spark,
      graft.core.Tables.documents(spark, sf), "doc_id", "text",
      Seq("q1" -> "hash join", "q2" -> "scan batch"), k = 5)
    try {
      val phys = df.queryExecution.executedPlan.toString
      assert(phys.contains("BroadcastHashJoin"), phys)
      // the round-6 skew fix: df needs existence only, so NOTHING in the
      // plan repartitions by the term column alone — a stop-word query term
      // would otherwise pile one posting per document into one partition
      assert(!phys.contains("hashpartitioning(term#"),
        s"term-partitioned exchange reappeared:\n$phys")
      // the r12 shared-scan shape: the postings side reads the CACHED slim
      // frame, so the corpus text is tokenized exactly once per query batch
      assert(phys.contains("InMemoryTableScan"),
        s"postings no longer read the shared slim cache:\n$phys")
    } finally slim.unpersist(false)
  }

  test("mixture-to-budget plan: one Window, and only the boundary bucket feeds it") {
    val df = graft.operators.Splits.mixtureSample(
      graft.core.Tables.documents(spark, sf),
      budgets = Map("en" -> 30000L, "zh" -> 10000L),
      sizeCol = col("n_chars"), salt = "p")
    // full buckets below the boundary bypass ordering entirely; the exact
    // running-sum window exists once, on the ~1/1024 boundary slice — a
    // naive per-domain window would sort the whole corpus in ≤|domains|
    // partitions. String-match: AQE wraps the tree, so node collect()
    // can't see through AdaptiveSparkPlan.
    val phys = df.queryExecution.executedPlan.toString
    val windowLines = phys.linesIterator.count(_.contains("- Window ["))
    assert(windowLines == 1, s"expected exactly one Window node:\n$phys")
    // the window's input filter pins _bkt to the folded boundary literal
    // (an equality, vs the below-path's strict less-than)
    assert(phys.contains("= CASE WHEN"),
      s"window input is not boundary-bucket-filtered:\n$phys")
  }

  test("hybrid rrf plan: query batch broadcasts on both retrievers, no sort-merge join") {
    val lex = graft.operators.Retrieval.bm25TopK(spark,
      graft.core.Tables.documents(spark, sf), "doc_id", "text",
      Seq("7" -> "hash join"), k = 5).select("qid", "rank", "doc_id")
    val den = graft.operators.Similarity.knnBruteMulti(
        graft.core.Tables.embeddings(spark, sf),
        Seq("7" -> Seq.fill(64)(0.1f)), k = 5)
      .select(col("qid"), col("rank"), col("vec_id").as("doc_id"))
    val fused = graft.operators.Retrieval.rrfFuse(Seq(lex, den), k = 3)
    val phys = fused.queryExecution.executedPlan.toString
    assert(!phys.contains("SortMergeJoin"),
      s"hybrid fusion shuffles a join that should broadcast:\n$phys")
    assert(phys.contains("BroadcastNestedLoopJoin") || phys.contains("BroadcastHashJoin"), phys)
  }

  test("q16 plan: NOT IN lowers to a broadcast left-anti join") {
    val df = graft.queries.Relational3.defs("q16_supplier_variety")(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftAnti"),
      s"expected broadcast anti join:\n$phys")
  }

  test("bloom decontamination probe: native might_contain, no ScalaUDF, no shuffle on the train side") {
    val docs = graft.core.Tables.documents(spark, sf)
    val evalSet = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
    val trainSet = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 50 =!= 0)
    val df = graft.operators.Dedup.bloomContaminated(trainSet, evalSet, n = 5,
      expectedGrams = 100000L)
    val phys = df.queryExecution.executedPlan
    val physStr = phys.toString
    assert(!physStr.contains("ScalaUDF") && !physStr.contains("BatchEvalPython"),
      s"row-level UDF reappeared in the bloom probe plan:\n$physStr")
    assert(physStr.contains("BloomFilterMightContain") || physStr.contains("might_contain"),
      s"expected the native bloom probe expression:\n$physStr")
    // the flagging pass is a pure map: no exchange anywhere in the plan
    assert(!physStr.contains("Exchange"),
      s"train-side flagging must not shuffle:\n$physStr")
  }

  test("incremental fuzzy dedup: ledger streams through a broadcast of the batch's bands") {
    val spark2 = spark
    import spark2.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft_plan_lsh").toString + "/ledger"
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 0$h:00:00")
    val b1 = (1 to 40).map(i => (i.toLong, s"alpha beta w$i x$i y$i z$i")).toDF("doc_id", "text")
    graft.operators.Dedup.incrementalMinhashBatch(
      b1, b1.limit(0), table, ts(1), token = Some("p1"))
    // second batch: the ledger is non-empty, so the cross-batch probe plan
    // exists — the HISTORY side (ledger scan) must stream while the
    // batch-derived band rows broadcast; a shuffle of the ledger would be
    // the 100 TB regression this pin guards against
    val b2 = (100 to 120).map(i => (i.toLong, s"gamma delta w$i q$i r$i s$i")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.incrementalMinhashBatch(
      b2, b1, table, ts(2), token = Some("p2"))
    // the returned frame is checkpointed; re-derive the probe plan shape
    // directly instead: ledger scan joined to a broadcast marker
    val ledger = graft.operators.CommitLog.scan(spark, table)
    val probe = ledger
      .join(broadcast(b2.select(col("doc_id").as("id"))), Seq("id"), "left_anti")
    val physStr = probe.queryExecution.executedPlan.toString
    assert(physStr.contains("BroadcastHashJoin") || physStr.contains("BroadcastNestedLoopJoin"),
      s"ledger-side probe must build against a broadcast:\n$physStr")
    assert(out.filter(col("kept")).count() == 21) // disjoint vocab: all kept
  }

  test("change feed read plans only the entries' files, never the table") {
    val spark2 = spark
    import spark2.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft_plan_cdc").toString
    def batch(ids: Range, month: String) = ids
      .map(i => (s"id$i", java.sql.Timestamp.valueOf(s"$month-10 00:00:00"), i))
      .toDF("id", "ts", "v")
    graft.operators.CommitLog.append(batch(0 until 50, "2024-01"), table, "id", "ts")
    graft.operators.CommitLog.append(batch(50 until 60, "2024-02"), table, "id", "ts")
    val feed = graft.operators.CommitLog.changesBetween(spark, table, 1, 2)
    val scanned = feed.queryExecution.executedPlan.toString
    // only v2's file may appear in the scan: the v1 file (month=2024-01)
    // must not be opened for a (1, 2] catch-up
    assert(!scanned.contains("month=2024-01"),
      s"change feed opened a file outside the requested range:\n$scanned")
    assert(feed.count() == 10)
  }

  test("sketch rollup plans: the readout prunes to state columns; the " +
      "touched-group filter is a broadcast semi join; the batch side " +
      "carries a partial MG aggregate (map-side combine)") {
    val spark2 = spark
    import spark2.implicits._
    val t = java.nio.file.Files
      .createTempDirectory("graft_plan_sketch").toString + "/rollup"
    val df = (1L to 600L).map(i => (s"g${i % 3}", s"tok${i % 40}"))
      .toDF("grp", "item")
    graft.operators.Sketches.updateTopKRollup(df, t, Seq("grp"), "item",
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"), k = 16)

    // readout: the state scan must not drag rollup_id/updated_at along —
    // sketch tables are meant to be point-read cheaply by dashboards
    val est = graft.operators.Sketches.topK(spark, t, Seq("grp"))
    val phys = est.queryExecution.executedPlan.toString
    val readSchema = phys.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("fsketch") && readSchema.contains("n_rows"),
      s"readout must read the state columns:\n$readSchema")
    assert(!readSchema.contains("updated_at") && !readSchema.contains("rollup_id"),
      s"readout scan failed to prune bookkeeping columns:\n$readSchema")

    // update path: state rows prune to touched groups via a BROADCAST
    // LeftSemi (the state table streams; a shuffled semi would re-shuffle
    // all groups every batch). Re-derive the probe plan shape the way the
    // operator builds it.
    val bs = Seq(("g0", "x")).toDF("grp", "item").groupBy("grp")
      .agg(graft.plans.FrequencyRegistry.mgAgg(col("item"), 16).as("fsketch"),
        count(col("item")).as("n_rows"))
    val probe = graft.operators.CommitLog.scan(spark, t)
      .select(col("grp"), col("fsketch"), col("n_rows"))
      .join(broadcast(bs.select(col("grp"))), Seq("grp"), "left_semi")
    val probePhys = probe.queryExecution.executedPlan.toString
    assert(probePhys.contains("BroadcastHashJoin") &&
      probePhys.contains("LeftSemi"),
      s"touched-group filter must be a broadcast semi join:\n$probePhys")

    // the sketch aggregate itself must run as partial + final (map-side
    // combine): ObjectHashAggregate with a partial_graft_mg_agg stage, so
    // at scale item rows combine per partition before any exchange
    val aggPhys = df.groupBy("grp")
      .agg(graft.plans.FrequencyRegistry.mgAgg(col("item"), 16).as("s"))
      .queryExecution.executedPlan.toString
    assert(aggPhys.contains("partial_graft_mg_agg"),
      s"MG aggregate lost its partial (map-side) stage:\n$aggPhys")
  }

  test("q19: disjunct-derived bounds push to BOTH scans, residual OR rides a broadcast join") {
    val df = graft.queries.Relational4.defs("q19_discounted_revenue")(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    // Catalyst must extract per-side conjuncts from the OR-of-ANDs: the
    // quantity envelope reaches the lineitem scan, the brand/size envelope
    // reaches the part scan — neither side scans rows the disjunction can
    // never accept.
    assert(phys.contains("GreaterThanOrEqual(l_quantity,1.0)"),
      s"lineitem scan lost the derived quantity bound:\n$phys")
    // (PushedFilters strings are elided in toString, so match the stable
    // prefix of the brand disjunction rather than a full literal.)
    assert(phys.contains("EqualTo(p_brand"),
      s"part scan lost the derived brand/size disjunction:\n$phys")
    assert(phys.contains("BroadcastHashJoin") && !phys.contains("SortMergeJoin"),
      s"q19 must broadcast the filtered part side:\n$phys")
  }

  test("q21: EXISTS/NOT-EXISTS pair decorrelates to LeftSemi + LeftAnti, no cartesian") {
    val df = graft.queries.Relational4.defs("q21_waiting_suppliers")(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType.toString
    }
    assert(joins.contains("LeftSemi") && joins.contains("LeftAnti"),
      s"correlated subqueries did not lower to semi/anti joins: $joins")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), s"q21 planned a cartesian:\n$phys")
  }

  test("entity resolution: records take labels via broadcast; the pair stage shuffles only the dictionary") {
    import org.apache.spark.sql.functions.{col, element_at, split}
    val resolved = graft.operators.EntityResolution.resolve(
      graft.core.Tables.part(spark, sf), "p_name",
      n => element_at(split(n, " "), -1), maxDist = 3)
      .select(col("p_partkey"), col("entity"))
    val phys = resolved.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"record labeling lost its broadcast join:\n$phys")
    // records must never hash-shuffle for resolution: the only exchanges
    // besides broadcasts belong to the dictionary-side pair/label stages,
    // which partition on dictionary tuples (blk/name/component), never on
    // a record column like p_partkey
    val recordShuffle = phys.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("p_partkey"))
    assert(!recordShuffle, s"records shuffled for entity resolution:\n$phys")
  }

  test("runtime bloom filter: a selective dim filter reaches the fact scan as a bloom probe") {
    // Spark injects a bloom-filter runtime filter on the shuffle-join fact
    // side when the creation side is filtered and small enough — at 100 TB
    // this is the difference between scanning the full fact table and
    // skipping most of it before the join. Thresholds are tuned for real
    // data sizes, so pin the behavior with test-scaled ones.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // force the shuffle-join shape the filter targets (broadcast joins
      // prune for free and are skipped by the rule)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = graft.core.Tables.orders(spark, sf)
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val l = graft.core.Tables.lineitem(spark, sf)
      val q = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderpriority"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg") || opt.contains("BloomFilterMightContain")
          || opt.contains("might_contain"),
        s"no runtime bloom filter injected on the fact side:\n$opt")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("join-view delta: batch deltas broadcast, full sides stream unshuffled") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_plan_jv").toString
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-0$d 00:00:00")
    val l1 = (1 to 30).map(i => (i.toLong, (i % 5).toLong, ts(1))).toDF("l_id", "k", "ts")
    val r1 = (0 to 4).map(i => (i.toLong, s"name$i", ts(1))).toDF("k", "name", "r_ts")
    graft.operators.CommitLog.append(l1, s"$base/l", idCol = "l_id", tsCol = "ts")
    graft.operators.CommitLog.append(r1, s"$base/r", idCol = "k", tsCol = "r_ts")
    val l2 = (31 to 40).map(i => (i.toLong, (i % 5).toLong, ts(2))).toDF("l_id", "k", "ts")
    graft.operators.CommitLog.append(l2, s"$base/l", idCol = "l_id", tsCol = "ts")
    val spec = graft.operators.JoinView.Spec("k", "k",
      Seq("l_id", "k", "ts", "name"), "ts")
    // second refresh range: ΔL (the new batch) against R at head — the
    // delta must BROADCAST and the full side must reach the join as a bare
    // scan; a hash-partitioned exchange of either fact side here is the
    // 100 TB regression this pin guards against
    val delta = graft.operators.JoinView.deltaFrame(
      spark, s"$base/l", s"$base/r", spec, 1L, 2L, 1L, 1L).get
    val phys = delta.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"),
      s"join-view delta lost its broadcast join:\n$phys")
    assert(!phys.contains("SortMergeJoin") && !phys.contains("hashpartitioning"),
      s"join-view delta shuffled a fact side:\n$phys")
  }

  test("q18: group-HAVING aggregates map-side before its exchange; limit is TakeOrdered") {
    val df = graft.queries.Relational4.defs("q18_large_orders")(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("partial_sum"),
      s"per-order quantity sum lost its partial (map-side) stage:\n$phys")
    assert(phys.contains("TakeOrderedAndProject"),
      s"ORDER BY+LIMIT must plan as top-k, not a global sort:\n$phys")
  }

  test("funnel: every step's type filter reaches the parquet scan; step tables " +
      "never sort-merge against the event stream") {
    val df = graft.queries.Analytics.defs("funnel_steps")(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    // three step scans, each with its own pushed equality — a funnel that
    // scans all events per step and filters late reads 5x the bytes
    Seq("view", "click", "purchase").foreach { t =>
      assert(phys.contains(s"EqualTo(event_type,$t)"),
        s"step '$t' filter not pushed to the scan:\n$phys")
    }
    assert(!phys.contains("SortMergeJoin"),
      s"per-user step tables must hash-join (they only shrink):\n$phys")
  }

  test("ema: facts collapse to the day grain BEFORE the range self-join") {
    // pre-checkpoint interior (the gate caches `daily` + localCheckpoints)
    val df = graft.queries.Analytics.emaJoined(
      graft.queries.Analytics.emaDaily(spark, sf))
    // the ≤30-day band join is non-equi, so it must be a nested-loop over
    // the CALENDAR-bounded aggregate — never over raw orders rows
    val opt = df.queryExecution.optimizedPlan
    val joins = opt.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.size == 1, s"expected exactly the band self-join:\n$opt")
    joins.head.children.foreach { side =>
      assert(side.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined,
        s"a raw (pre-aggregation) side reached the nested-loop join:\n$opt")
    }
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastNestedLoopJoin"), phys)
  }

  test("q11: the scalar-fraction HAVING compares exact longs against a 1-row broadcast") {
    val df = graft.queries.Relational5.defs("q11_important_stock")(spark, sf)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("* 1000)"),
      s"fraction threshold must cross-multiply to exact longs:\n$phys")
    assert(phys.contains("IdentityBroadcastMode") ||
      phys.contains("BroadcastNestedLoopJoin"),
      s"the global total must broadcast as one row:\n$phys")
    assert(!phys.contains("SortMergeJoin"), phys)
  }
}
