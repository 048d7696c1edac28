package graft

import graft.operators.Features
import org.apache.spark.sql.functions._

class FeatureSpec extends GraftSuite {

  test("countEncode dictionary matches a hand count") {
    val s2 = spark; import s2.implicits._
    val df = Seq("a", "a", "a", "b").toDF("c")
    val got = Features.countEncode(df, col("c")).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map("a" -> ((3L, 0.75)), "b" -> ((1L, 0.25))))
  }

  test("targetEncode shrinks toward the prior with smoothing") {
    val s2 = spark; import s2.implicits._
    // prior = 50; category 'a' mean 10 (n=2), 'b' mean 90 (n=2)
    val df = Seq(("a", 10L), ("a", 10L), ("b", 90L), ("b", 90L)).toDF("c", "y")
    val got = Features.targetEncode(df, col("c"), col("y"), m = 2.0)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    // enc(a) = (20 + 2*50)/(2+2) = 30; enc(b) = (180 + 100)/4 = 70
    assert(got("a") == 30.0 && got("b") == 70.0)
    // m = 0 -> raw category means
    val raw = Features.targetEncode(df, col("c"), col("y"), m = 0.0)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(raw("a") == 10.0 && raw("b") == 90.0)
  }

  test("targetEncodeOOF excludes the fold's own labels (leakage proof)") {
    val s2 = spark; import s2.implicits._
    // ids chosen so md5 first-nibble % 2 splits them into both folds;
    // poison fold-f labels: the fold-f encoding must NOT move
    val ids = (1L to 200L)
    val fold = udf((id: Long) => {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      (java.lang.Long.parseLong(hex, 16) % 2).toInt
    })
    val base = ids.map(i => ("x", i)).toDF("c", "id")
      .withColumn("f", fold(col("id")))
    // labels: fold 0 rows get 1000, fold 1 rows get 0
    val df = base.withColumn("y", when(col("f") === 0, 1000L).otherwise(0L))
    val enc = Features.targetEncodeOOF(df, col("c"), col("y"), col("id"),
        k = 2, m = 0.0001)
      .collect().map(r => (r.getInt(1), r.getDouble(4))).toMap
    // fold 0's encoding sees only fold-1 labels (all 0) and vice versa
    assert(enc(0) < 1.0, s"fold 0 leaked its own labels: ${enc(0)}")
    assert(enc(1) > 999.0, s"fold 1 leaked its own labels: ${enc(1)}")
  }

  test("targetEncodeOOF grid covers categories absent from a fold") {
    val s2 = spark; import s2.implicits._
    // a category whose every row hashes to one fold still gets k rows
    val df = Seq(("solo", 5L, 7L), ("other", 1L, 8L), ("other", 3L, 9L),
      ("other", 2L, 10L), ("other", 4L, 11L)).toDF("c", "y", "id")
    val rows = Features.targetEncodeOOF(df, col("c"), col("y"), col("id"),
      k = 4, m = 1.0).collect()
    assert(rows.length == 8) // 2 categories × 4 folds, dense
    assert(rows.forall(r => !r.isNullAt(4)))
  }

  test("targetEncodeOOF guards degenerate inputs (m = 0, single-fold data)") {
    val s2 = spark; import s2.implicits._
    // m == 0 would let the encoding denominator hit zero for single-fold
    // categories — must fail loudly, not emit silent nulls
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L)).toDF("c", "y", "id")
    intercept[IllegalArgumentException] {
      Features.targetEncodeOOF(df, col("c"), col("y"), col("id"), k = 2, m = 0.0)
    }
    // all rows hashing into ONE fold: prior_{−f} for that fold is 0/0 —
    // must fall back to the global mean, never null
    val fold = Features.foldOf(col("id"), 2)
    val ids = (1L to 50L).map(i => ("x", 10L, i))
    val oneFold = ids.toDF("c", "y", "id")
      .withColumn("f", fold).filter(col("f") === 0).drop("f")
    val rows = Features.targetEncodeOOF(oneFold, col("c"), col("y"), col("id"),
      k = 2, m = 1.0).collect()
    assert(rows.nonEmpty && rows.forall(r => !r.isNullAt(4)),
      "degenerate fold produced null encodings")
    // the fold that holds every row encodes from the global-mean prior
    val f0 = rows.find(_.getInt(1) == 0).get
    assert(f0.getDouble(4) == 10.0, s"expected global-mean fallback, got $f0")
  }

  test("encodeFromAgg over maintained state equals targetEncode over facts") {
    val s2 = spark; import s2.implicits._
    val facts = Seq(("a", 10L, 1), ("a", 20L, 1), ("b", 30L, 2), ("b", 50L, 3))
      .toDF("c", "y", "bucket_ts")
    // simulate IncrementalAgg state: count+sum per (bucket, category)
    val state = facts.groupBy(col("bucket_ts"), col("c"))
      .agg(count(lit(1)).as("count"), sum(col("y")).as("sum_value"))
    val fromState = graft.operators.Features.encodeFromAgg(state, "c", m = 3.0)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    val direct = graft.operators.Features.targetEncode(facts, col("c"), col("y"), m = 3.0)
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(fromState == direct)
  }

  test("foldOf: k beyond 16 is reachable and folds are near-balanced for k=3") {
    val s2 = spark; import s2.implicits._
    val df = (1L to 4000L).toDF("id")
    val f20 = df.select(Features.foldOf(col("id"), 20).as("f"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(f20.size == 20, s"k=20 reached only ${f20.size} folds: $f20")
    val sizes3 = df.groupBy(Features.foldOf(col("id"), 3).as("f")).count()
      .collect().map(_.getLong(1))
    // 32-bit-hash mod 3 is unbiased to ~2^-32; sample noise only
    assert(sizes3.max - sizes3.min < 300, s"k=3 folds skewed: ${sizes3.toSeq}")
  }

  test("featureHash16 separates two columns sharing the same value") {
    val s2 = spark; import s2.implicits._
    val v = Features.featureHash16(Seq(("en", "en")).toDF("a", "b"),
        Seq(col("a"), col("b"))).head().getSeq[Double](2)
    // value-only hashing would pile both features on ONE bucket with one
    // sign; position tags split them: md5("1:en") → bucket 4 sign +,
    // md5("2:en") → bucket 7 sign −
    assert(v(4) == 1.0 && v(7) == -1.0 && v.map(math.abs).sum == 2.0,
      s"columns sharing a value collided systematically: $v")
  }

  test("woeEncode separates classes with the documented smoothing") {
    val s2 = spark; import s2.implicits._
    val df = Seq(("a", true), ("a", true), ("a", false), ("b", false),
      ("b", false), ("b", true)).toDF("c", "p")
    val got = Features.woeEncode(df, col("c"), col("p"), alpha = 0.5)
      .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    val glo = math.log((3 + 0.5) / (3 + 0.5))
    val wa = math.log((2 + 0.5) / (1 + 0.5)) - glo
    val wb = math.log((1 + 0.5) / (2 + 0.5)) - glo
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == r6(wa) && got("b") == r6(wb))
    assert(got("a") > 0 && got("b") < 0)
  }

  test("featureHash16 buckets and signs follow the md5 nibbles; no shuffle") {
    val s2 = spark; import s2.implicits._
    val df = Seq(("en", "src1"), ("fr", "src2")).toDF("a", "b")
    val out = Features.featureHash16(df, Seq(col("a"), col("b")))
    // plan shape: pure projection — no exchange at all
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"hashing trick shuffled:\n$phys")
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def nib(s: String, n: Int) = {
      val c = md5hex(s).charAt(n - 1)
      if (c <= '9') c - '0' else c - 'a' + 10
    }
    val rows = out.collect().map(r => (r.getString(0), r.getString(1),
      r.getSeq[Double](2)))
    rows.foreach { case (a, b, v) =>
      assert(v.length == 16)
      val want = Array.fill(16)(0.0)
      Seq(a, b).zipWithIndex.foreach { case (s, i) =>
        val tagged = s"${i + 1}:$s" // column position is part of the hash
        want(nib(tagged, 1)) += (if (nib(tagged, 2) < 8) 1.0 else -1.0)
      }
      assert(v.toArray.toSeq == want.toSeq, s"row ($a, $b)")
    }
  }
}
