package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Pins the A-ES weighted sampler: exact agreement with an in-memory
  * brute force, weight sensitivity, and the no-global-sort plan shape. */
class SamplingSpec extends GraftSuite {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def keyOf(id: Long, w: Double, salt: String): Double = {
    val h = java.lang.Long.parseLong(md5Hex(id.toString + salt).take(12), 16)
    math.log((h + 0.5) / 281474976710656.0) / w
  }

  test("weighted sample matches the brute-force A-ES draw exactly") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", col("w"), n = 20, salt = "s1")
      .select("id").collect().map(_.getLong(0)).toSeq
    val want = rows.map { case (i, w) => (i, keyOf(i, w, "s1")) }
      .sortBy { case (i, k) => (-k, i) }.take(20).map(_._1)
    assert(got == want)
  }

  test("weights matter: a heavy item is drawn, re-salting redraws") {
    val spark2 = spark
    import spark2.implicits._
    // one item with 10000x the weight of 500 others: its inclusion
    // probability in a 10-sample is ~1 - the chance all of its ln(u)/w
    // beats it, effectively certain across any salt
    val df = ((1L to 500L).map(i => (i, 1.0)) :+ (999L, 10000.0)).toDF("id", "w")
    (1 to 5).foreach { s =>
      val ids = Sampling.weightedSample(df, "id", col("w"), n = 10, salt = s"x$s")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(ids.contains(999L), s"heavy item missing for salt x$s")
    }
    // different salts give different uniform draws → different light picks
    val a = Sampling.weightedSample(df, "id", col("w"), n = 10, salt = "xa")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedSample(df, "id", col("w"), n = 10, salt = "xb")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a != b, "independent salts produced identical samples")
  }

  private def uniformOf(id: Long, salt: String): Double = {
    val h = java.lang.Long.parseLong(md5Hex(id.toString + salt).take(12), 16)
    (h + 0.5) / 281474976710656.0
  }

  test("mixtureSample matches the brute-force cutoff for every bucket count") {
    val spark2 = spark
    import spark2.implicits._
    // three domains: 'a' cuts mid-domain, 'b' fits entirely under budget,
    // 'c' has no budget entry and must vanish
    val rows = (1L to 300L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c", i % 50 + 1))
    val df = rows.toDF("doc_id", "lang", "n_chars")
    val budgets = Map("a" -> 700L, "b" -> 1000000L)
    def brute(salt: String): Set[Long] = budgets.keys.flatMap { dom =>
      val inDom = rows.filter(_._2 == dom)
        .map { case (i, _, s) => (i, uniformOf(i, salt), s.toLong.max(1L)) }
        .sortBy { case (i, u, _) => (u, i) }
      val pre = inDom.scanLeft(0L)(_ + _._3)
      inDom.zip(pre).collect { case ((i, _, _), p) if p < budgets(dom) => i }
    }.toSet
    for (buckets <- Seq(1, 2, 7, 1024)) {
      val got = graft.operators.Splits.mixtureSample(df, budgets,
          sizeCol = col("n_chars"), salt = "mx", buckets = buckets)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == brute("mx"), s"buckets=$buckets")
    }
    // membership is a pure function of (id, salt, budget): re-salting redraws
    val resalted = graft.operators.Splits.mixtureSample(df, budgets,
        sizeCol = col("n_chars"), salt = "mx2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(resalted == brute("mx2"))
    assert(resalted != brute("mx"))
  }

  test("mixtureSample edge budgets: zero drops the domain, oversized keeps all of it") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1L to 90L).map(i =>
      (i, if (i % 3 == 0) "z" else if (i % 3 == 1) "all" else "cut", 10L))
      .toDF("doc_id", "lang", "n_chars")
    val out = graft.operators.Splits.mixtureSample(df,
        Map("z" -> 0L, "all" -> 100000L, "cut" -> 95L),
        sizeCol = col("n_chars"), salt = "e")
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(!out.exists(_._2 == "z"), "budget 0 must drop the whole domain")
    assert(out.count(_._2 == "all") == 30, "oversized budget keeps the full domain")
    // 95 chars at 10/doc: 9 docs have before-sum < 95 (the 10th sits at 90
    // < 95, so it also passes -> exactly 10 kept: overshoot-by-at-most-one)
    assert(out.count(_._2 == "cut") == 10, out.filter(_._2 == "cut").mkString(","))
  }

  test("temperatureMixtureSample: derived budgets match hand arithmetic; " +
      "alpha<1 upsamples the small domain; alpha=1 tracks natural share") {
    val spark2 = spark
    import spark2.implicits._
    // big: 240 docs x 10 chars = 2400; small: 60 docs x 10 chars = 600
    val rows = (1L to 300L).map(i =>
      (i, if (i % 5 == 0) "small" else "big", 10L))
    val df = rows.toDF("doc_id", "lang", "n_chars")

    def selectedSize(alpha: Double, t: Long): Map[String, Long] =
      graft.operators.Splits.temperatureMixtureSample(df, t, alpha,
          sizeCol = col("n_chars"), salt = "tp")
        .groupBy("lang").agg(sum("n_chars").as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // budgets replicate the documented integer arithmetic exactly:
    // w = floor(1000*sqrt(n)), budget = floor(T*w/sum)
    val wBig = math.floor(1000 * math.sqrt(2400.0)).toLong
    val wSmall = math.floor(1000 * math.sqrt(600.0)).toLong
    val t = 1000L
    val expBig = t * wBig / (wBig + wSmall)
    val expSmall = t * wSmall / (wBig + wSmall)
    val got = selectedSize(0.5, t)
    // exact-cutoff semantics: selected size reaches the budget, overshoot
    // strictly less than one doc (10 chars)
    assert(got("big") >= expBig && got("big") < expBig + 10)
    assert(got("small") >= expSmall && got("small") < expSmall + 10)
    // sqrt temperature gives the small domain (natural share 20%) a 1/3
    // share: sqrt(600)/(sqrt(2400)+sqrt(600)) = 1/3
    assert(math.abs(got("small").toDouble / (got("big") + got("small")) -
      1.0 / 3.0) < 0.02)

    // alpha=1: natural proportions (80/20)
    val nat = selectedSize(1.0, 1000L)
    assert(math.abs(nat("small").toDouble / (nat("big") + nat("small")) -
      0.2) < 0.02)

    // alpha=0: uniform across domains regardless of size
    val uni = selectedSize(0.0, 1000L)
    assert(math.abs(uni("small").toDouble / (uni("big") + uni("small")) -
      0.5) < 0.02)
  }

  test("splitByCluster: near-dup pairs never straddle splits; all docs assigned") {
    val spark2 = spark
    import spark2.implicits._
    // 30 clusters of 3 identical docs (J=1.0 pairs) + 40 singletons
    val dupes = (0L until 30L).flatMap { c =>
      (0L until 3L).map(m => (c * 10 + m, "s", s"alpha beta gamma delta c$c"))
    }
    val singles = (1000L until 1040L).map(i => (i, "s", s"unique text body $i only"))
    val df = (dupes ++ singles).toDF("doc_id", "source", "text")
    val out = graft.operators.Splits.splitByCluster(df, threshold = 0.8,
      fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out.size == dupes.size + singles.size, "every doc gets a row")
    // leakage safety: one split per component, dup triples share it
    val byComp = out.groupBy(_._2)
    assert(byComp.values.forall(_.map(_._3).distinct.size == 1))
    (0L until 30L).foreach { c =>
      val triple = out.filter(t => t._1 / 10 == c && t._1 < 1000)
      assert(triple.map(_._3).distinct.size == 1, s"cluster $c straddles splits")
      assert(triple.map(_._2).distinct == Seq(c * 10), s"cluster $c component")
    }
    // singleton assignment = the md5 rule on its own id
    val splits = out.filter(_._1 >= 1000L).map { case (id, comp, split) =>
      assert(comp == id)
      val u = uniformOf(id, "sp")
      val want = if (u < 0.8) "train" else if (u < 0.9) "val" else "test"
      assert(split == want, s"doc $id: $split != $want")
      split
    }
    assert(splits.toSet.size > 1, "40 singletons should hit multiple splits")
  }

  test("plan: top-n compiles to TakeOrderedAndProject, not a global sort") {
    val df = Sampling.weightedSample(
      graft.core.Tables.documents(spark, sf), "doc_id",
      greatest(col("n_chars"), lit(1)).cast("double"), n = 50, salt = "r6")
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), phys)
    assert(!phys.contains("rangepartitioning"),
      s"weighted sample fell back to a global range sort:\n$phys")
  }
}
