package graft

import graft.operators.{Projection, Ranking}
import graft.plans.VecAggExprs
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankProjSpec extends GraftSuite {

  private def sparkI = { val s = spark; s }

  // ---------- Ranking ----------

  test("globalRowNumber matches the single-partition window row_number") {
    val orders = graft.core.Tables.orders(spark, sf)
    val keys = Seq(col("o_totalprice").desc, col("o_orderkey"))
    val got = Ranking.globalRowNumber(orders, keys, parts = 7)
      .select(col("o_orderkey"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = orders
      .withColumn("rank", row_number().over(Window.orderBy(keys: _*)).cast("long"))
      .select(col("o_orderkey"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == want.size && got == want)
  }

  test("globalRowNumber plan has no SinglePartition exchange") {
    val orders = graft.core.Tables.orders(spark, sf)
    val (parted, ranked, _) = Ranking.rankedFrames(orders,
      Seq(col("o_totalprice").desc, col("o_orderkey")), parts = 7, rankCol = "rank")
    try {
      val phys = ranked.queryExecution.executedPlan.toString
      assert(!phys.contains("SinglePartition"),
        s"global rank collapsed to one partition:\n$phys")
      assert(phys.contains("rangepartitioning") || phys.contains("RangePartitioning"),
        s"expected a range exchange:\n$phys")
      // the rank must be a projection over the pinned frame: a Window or
      // a hash exchange here means the second full shuffle came back
      assert(!phys.contains("Window"), s"rank grew a window stage:\n$phys")
      assert(!phys.contains("hashpartitioning(_pid"),
        s"rank re-shuffled on _pid:\n$phys")
    } finally parted.unpersist(false)
  }

  test("ntile matches SQL NTILE semantics (remainder to the first buckets)") {
    val s2 = sparkI; import s2.implicits._
    // n=10, k=3 -> sizes 4,3,3
    val df = (1 to 10).map(i => (i, s"r$i")).toDF("v", "tag")
    val got = Ranking.ntile(df, 3, Seq(col("v")))
      .select(col("v"), col("bucket")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toMap
    val want = (1 to 10).map(i => i -> (if (i <= 4) 1 else if (i <= 7) 2 else 3)).toMap
    assert(got == want)
  }

  test("ntile agrees with Spark's window ntile on lineitem") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val keys = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val got = Ranking.ntile(li, 10, keys)
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 4).as("s"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    val want = li.withColumn("bucket", ntile(10).over(Window.orderBy(keys: _*)))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 4).as("s"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == want)
  }

  test("ntile with n < k gives each row its own bucket") {
    val s2 = sparkI; import s2.implicits._
    val df = Seq(5, 1, 3).toDF("v")
    val got = Ranking.ntile(df, 10, Seq(col("v")))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
    assert(got == Map(1 -> 1, 3 -> 2, 5 -> 3))
  }

  test("equidepthHistogram buckets cover all rows with contiguous bounds") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val rows = Ranking.equidepthHistogram(li, col("l_extendedprice"), 8,
      Seq(col("l_orderkey"), col("l_linenumber"))).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 8))
    assert(rows.map(_.getLong(1)).sum == li.count())
    // equi-depth: bucket sizes differ by at most 1; bounds non-decreasing
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9)
    case _ => () }
  }

  test("equidepthApprox: GK buckets honor the 2-epsilon-n bound, no range exchange") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val (k, eps) = (8, 0.01)
    val rows = graft.operators.Ranking
      .equidepthApprox(li, col("l_extendedprice"), k, eps)
      .collect().sortBy(_.getInt(0))
    val n = rows.map(_.getLong(1)).sum
    assert(n == li.count())
    val target = n.toDouble / k
    rows.foreach(r => assert(math.abs(r.getLong(1) - target) <= 2 * eps * n + 1,
      s"bucket ${r.getInt(0)} population ${r.getLong(1)} outside the GK bound"))
    // non-overlapping bounds (ties go right)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getDouble(3) <= b.getDouble(2) + 1e-9)
      case _ => ()
    }
    // the assignment+histogram plan must contain NO range exchange (the
    // whole point of the sketch path) — only the groupBy hash exchange
    val plan = graft.operators.Ranking
      .equidepthApprox(li, col("l_extendedprice"), k, eps)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"sketch path grew a range exchange:\n$plan")
  }

  test("equidepthFromStateBy: per-group buckets via broadcast, no range exchange") {
    import graft.operators.{CommitLog, Ranking, Sketches}
    val ev = graft.core.Tables.events(spark, sf)
      .withColumn("fmonth", org.apache.spark.sql.functions
        .date_format(col("ts"), "yyyy-MM"))
    val state = java.nio.file.Files
      .createTempDirectory("graft_ieqg_plan").toString + "/qstate"
    Sketches.updateQuantileRollup(ev, state, Seq("event_type", "fmonth"),
      "value", java.sql.Timestamp.valueOf("2024-03-01 00:00:00"),
      token = Some("p0"))
    val hist = Ranking.equidepthFromStateBy(spark, state, Seq("event_type"),
      ev, col("value"), k = 4)
    val plan = hist.queryExecution.executedPlan.toString
    // the scale contract: boundaries ride a BROADCAST dimension, the
    // fact pass folds the per-group boundary array in codegen — no sort,
    // no range exchange anywhere (only the histogram's hash exchange)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"boundary dimension not broadcast:\n$plan")
    assert(!plan.toLowerCase.contains("rangepartitioning"),
      s"grouped state path grew a range exchange:\n$plan")
    // per-group accounting: every non-null fact lands in exactly one
    // bucket of its own group, and the witness matches
    val rows = hist.collect()
    val nonNull = ev.filter(col("value").isNotNull)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.map(_.getLong(2)).sum == nonNull(et), s"$et row accounting")
      assert(rs.forall(_.getLong(5) == nonNull(et)), s"$et state witness")
    }
  }

  test("randomized: globalRowNumber is the exact permutation; ntile sizes legal") {
    val s2 = sparkI; import s2.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val n = rnd.nextInt(180) + 1
      val k = rnd.nextInt(9) + 1
      val parts = rnd.nextInt(7) + 1
      // duplicate-heavy values force cross-partition tie handling
      val df = (1 to n).map(i => (rnd.nextInt(12), i)).toDF("v", "id")
      val ranked = Ranking.globalRowNumber(df, Seq(col("v"), col("id")), parts)
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2)))
      assert(ranked.map(_._2).sorted.toSeq == (1L to n).toSeq,
        s"trial $trial: ranks are not a permutation of 1..$n")
      val byOrder = ranked.sortBy(_._1).map(_._2).toSeq
      assert(byOrder == (1L to n).toSeq,
        s"trial $trial: rank order disagrees with the sort order")
      val sizes = Ranking.ntile(df, k, Seq(col("v"), col("id")))
        .groupBy(col("bucket")).count()
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val expected = (1 to k).map(b =>
        n / k + (if (b <= n % k) 1 else 0)).filter(_ > 0)
      assert(sizes.map(_._2).toSeq == expected,
        s"trial $trial (n=$n k=$k): sizes ${sizes.toSeq} vs $expected")
    }
  }

  // ---------- VecSumAgg ----------

  test("graft_vec_sum sums element-wise across partitions with a partial stage") {
    val s2 = sparkI; import s2.implicits._
    VecAggExprs.install(spark)
    val df = (1 to 100).map(i => (i % 3, Seq(i.toDouble, 2.0 * i, -i.toDouble)))
      .toDF("g", "v").repartition(5)
    val agg = df.groupBy(col("g")).agg(VecAggExprs.vecSum(col("v")).as("s"))
    val phys = agg.queryExecution.executedPlan.toString
    assert(phys.contains("partial_graft_vec_sum"),
      s"vec_sum lost its map-side partial stage:\n$phys")
    val got = agg.collect().map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toMap
    val want = (1 to 100).groupBy(_ % 3).map { case (g, is) =>
      (g, Seq(is.map(_.toDouble).sum, is.map(2.0 * _).sum, -is.map(_.toDouble).sum))
    }
    assert(got == want)
  }

  test("equidepthApprox excludes null values from buckets entirely") {
    val s2 = sparkI; import s2.implicits._
    val df = ((1 to 80).map(i => Some(i.toDouble)) ++ Seq.fill(40)(None))
      .toDF("x")
    val rows = graft.operators.Ranking.equidepthApprox(df, col("x"), 4, 0.01)
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.getLong(1)).sum == 80,
      s"nulls leaked into the histogram: ${rows.toSeq}")
    assert(rows.map(_.getLong(1)).forall(n => n >= 15 && n <= 25))
  }

  test("graft_vec_sum rejects null ELEMENTS loudly (null rows still skip)") {
    val s2 = sparkI; import s2.implicits._
    VecAggExprs.install(spark)
    val bad = Seq(Seq(Some(1.0), None, Some(3.0))).toDF("v")
    val e = intercept[Exception] {
      bad.agg(VecAggExprs.vecSum(col("v"))).collect()
    }
    assert(e.getMessage != null)
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ rootMessages(x.getCause))
    assert(rootMessages(e).exists(_.contains("null element")),
      s"expected the loud null-element error, got: ${rootMessages(e)}")
  }

  test("graft_vec_sum skips null rows and yields null for all-null groups") {
    val s2 = sparkI; import s2.implicits._
    VecAggExprs.install(spark)
    val df = Seq((1, Option(Seq(1.0, 2.0))), (1, None), (2, None))
      .toDF("g", "v")
    val got = df.groupBy(col("g")).agg(VecAggExprs.vecSum(col("v")).as("s"))
      .collect().map(r => (r.getInt(0), Option(r.get(1)))).toMap
    assert(got(1).map(_.asInstanceOf[scala.collection.Seq[Double]].toSeq)
      .contains(Seq(1.0, 2.0)))
    assert(got(2).isEmpty)
  }

  // ---------- Projection: covariance + PCA ----------

  test("one-pass covariance matches Spark covar_pop") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val dim = 6
    val (_, _, cov) = Projection.covariance(emb, "embedding", dim)
    val x = emb.select(col("vec_id"),
      transform(slice(col("embedding"), 1, dim), _.cast("double")).as("x"))
    for (i <- 0 until dim; j <- 0 until dim) {
      val want = x.select(covar_pop(element_at(col("x"), i + 1),
        element_at(col("x"), j + 1))).head().getDouble(0)
      assert(math.abs(cov(i)(j) - want) < 1e-9, s"cov($i)($j): ${cov(i)(j)} vs $want")
    }
  }

  test("moments rollup: merged state covariance equals the one-shot pass") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val table = java.nio.file.Files.createTempDirectory("graft_ipca_spec").toString
    val at = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    (0 until 3).foreach { b =>
      graft.operators.Sketches.updateMomentsRollup(
        emb.filter(pmod(col("vec_id"), lit(3)) === b), table,
        Seq("label"), "embedding", dim = 4, at = at, token = Some(s"m$b"))
    }
    val verBefore = graft.operators.CommitLog.snapshot(table).version
    graft.operators.Sketches.updateMomentsRollup( // replay: token no-ops
      emb.filter(pmod(col("vec_id"), lit(3)) === 0), table,
      Seq("label"), "embedding", dim = 4, at = at, token = Some("m0"))
    assert(graft.operators.CommitLog.snapshot(table).version == verBefore)
    val fromState = Projection.covarianceFromState(spark, table, Seq("label"), dim = 4)
      .collect().map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3))).toMap
    // one-shot per label over the same rows
    val labels = emb.select(col("label")).distinct().collect().map(_.getInt(0))
    labels.foreach { l =>
      val (_, _, cov) = Projection.covariance(
        emb.filter(col("label") === l), "embedding", dim = 4)
      for (i <- 0 until 4; j <- 0 until 4) {
        val want = BigDecimal(cov(i)(j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(fromState((l, i + 1, j + 1)) - want) <= 1e-6,
          s"label $l cov($i)($j): state ${fromState((l, i + 1, j + 1))} vs $want")
      }
    }
  }

  test("covariance divides by the non-null vector count; state readout " +
      "skips all-null groups and rejects a wrong dim") {
    val s2 = sparkI; import s2.implicits._
    val withNulls = Seq(Option(Seq(1.0, 2.0)), None, Option(Seq(3.0, 6.0)), None)
      .toDF("v")
    val (n, mean, cov) = graft.operators.Projection.covariance(withNulls, "v", 2)
    assert(n == 2 && mean.toSeq == Seq(2.0, 4.0)) // nulls excluded from n
    assert(math.abs(cov(0)(0) - 1.0) < 1e-12)

    val table = java.nio.file.Files.createTempDirectory("graft_ipca_null").toString
    val at = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val grouped = Seq(("a", Option(Seq(1.0, 2.0))), ("a", Option(Seq(3.0, 6.0))),
      ("b", None: Option[Seq[Double]])).toDF("g", "v")
    graft.operators.Sketches.updateMomentsRollup(grouped, table, Seq("g"), "v",
      dim = 2, at = at, token = Some("t0"))
    val rows = graft.operators.Projection
      .covarianceFromState(spark, table, Seq("g"), dim = 2).collect()
    assert(rows.map(_.getString(0)).toSet == Set("a"),
      s"all-null group leaked into the readout: ${rows.toSeq}")
    val e = intercept[Exception] {
      graft.operators.Projection.covarianceFromState(spark, table, Seq("g"), dim = 3)
    }
    assert(e.getMessage.contains("does not match dim"), e.getMessage)
  }

  test("jacobiEigen solves a known 2x2 and a random symmetric 6x6") {
    val (e2, v2) = Projection.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(e2(0) - 3.0) < 1e-12 && math.abs(e2(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(v2(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })

    val rnd = new scala.util.Random(7)
    val d = 6
    val m0 = Array.fill(d, d)(rnd.nextDouble() - 0.5)
    val a = Array.tabulate(d, d)((i, j) => m0(i)(j) + m0(j)(i))
    val (eigs, vecs) = Projection.jacobiEigen(a)
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    // residual: A v = lambda v
    for (k <- 0 until d) {
      val av = Array.tabulate(d)(i => dot(a(i), vecs(k)))
      av.zip(vecs(k)).foreach { case (x, y) =>
        assert(math.abs(x - eigs(k) * y) < 1e-9) }
    }
    // orthonormal + sorted + trace preserved
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(dot(vecs(i), vecs(j)) - (if (i == j) 1.0 else 0.0)) < 1e-9)
    assert(eigs.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(math.abs(eigs.sum - (0 until d).map(i => a(i)(i)).sum) < 1e-9)
  }

  test("pcaProject: variance captured by PC1 equals the top eigenvalue") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val model = Projection.pcaFit(emb, "embedding", dim = 8, k = 2)
    val scores = Projection.pcaProject(emb, model, "embedding")
      .select(element_at(col("pc"), 1).as("s"))
    val v = scores.agg(var_pop(col("s"))).head().getDouble(0)
    assert(math.abs(v - model.eigenvalues(0)) < 1e-6,
      s"PC1 variance $v vs eigenvalue ${model.eigenvalues(0)}")
  }

  // ---------- JL projection ----------

  test("jlSignMatrix is the md5 parity matrix (engine-reproducible)") {
    val m = Projection.jlSignMatrix(3, 4)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (i <- 0 until 3; j <- 0 until 4) {
      val want = if (md5hex(s"${i + 1}_${j + 1}").charAt(0) < '8') 1.0 else -1.0
      assert(m(i)(j) == want)
    }
    assert(m.flatten.forall(v => v == 1.0 || v == -1.0))
  }

  test("jlProject preserves norms in expectation (JL contract, loose band)") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val dim = 64; val k = 16
    val x = transform(col("embedding"), _.cast("double"))
    def norm2(c: org.apache.spark.sql.Column) =
      aggregate(zip_with(c, c, (a, b) => a * b), lit(0.0), (s, t) => s + t)
    val ratio = Projection.jlProject(emb, "embedding", dim, k)
      .select((norm2(col("proj")) / norm2(x)).as("r"))
      .agg(avg(col("r"))).head().getDouble(0)
    assert(ratio > 0.7 && ratio < 1.3, s"mean norm ratio $ratio out of JL band")
  }

  test("jlProjectQuantized matches the double path within quantization error") {
    val emb = graft.core.Tables.embeddings(spark, sf).limit(500)
    val (dim, k, scale) = (64, 8, 1e4)
    val dbl = Projection.jlProject(emb, "embedding", dim, k, outCol = "pd")
    val q = Projection.jlProjectQuantized(dbl, "embedding", dim, k, scale,
      outCol = "pq")
    // per-entry bound: each of the 64 coords quantizes within 1/(2·scale),
    // so |Σ q/scale − Σ x| ≤ d/(2·scale); divided by √k
    val bound = dim / (2.0 * scale) / math.sqrt(k.toDouble) + 1e-12
    val maxDev = q.select(
        aggregate(zip_with(col("pd"), col("pq"), (a, b) => abs(a - b)),
          lit(0.0), (acc, t) => greatest(acc, t)).as("d"))
      .agg(max(col("d"))).head().getDouble(0)
    assert(maxDev <= bound, s"quantized JL deviates $maxDev > bound $bound")
  }
}
