package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality
import graft.operators.Quality._

/** The declarative data-quality suite (operators/Quality.scala): a
  * user-defined constraint set over a hand-built table with KNOWN
  * defects — verdict counts must match the planted defects exactly, and
  * `failureRows` must return precisely the planted rows. */
class QualitySpec extends GraftSuite {

  test("user-defined suite: every constraint shape counts its planted " +
      "defects; failureRows returns exactly the offenders") {
    val spark2 = spark
    import spark2.implicits._
    // planted defects: one null id, one duplicate id (2 surplus rows? no —
    // 2 rows share id 3 → 1 surplus), one negative amount, one bad status,
    // one orphan account, and account "a1" holds 3 rows (cap 2)
    val df = Seq(
      (Option(1L), "a1", 10.0, "ok"),
      (Option(2L), "a1", -5.0, "ok"),      // negative amount
      (Option(3L), "a1", 7.0, "ok"),       // a1 now oversized (3 > 2)
      (Option(3L), "a2", 8.0, "ok"),       // duplicate id 3
      (Option(4L), "a9", 9.0, "weird"),    // bad status + orphan account
      (Option.empty[Long], "a2", 1.0, "ok") // null id
    ).toDF("id", "account", "amount", "status")
    val accounts = Seq("a1", "a2", "a3").toDF("acct_id")

    val suite = Seq(
      NotNull("id.not_null", "id"),
      Unique("id.unique", Seq("id")),
      FailsWhen("amount.positive", col("amount") <= 0.0),
      InSet("status.known", "status", Seq("ok", "held")),
      InRange("amount.range", "amount", 0.0, 9.5),
      RefIntegrity("account.exists", Seq("account"), accounts, Seq("acct_id")),
      MaxPerGroup("account.max_2_rows", Seq("account"), 2L))

    val verdicts = Quality.check(df, suite).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(verdicts == Map(
      "id.not_null" -> ((1L, 0)),
      // surplus rows with null tuples as GROUPS: 6 rows, 5 distinct keys
      // ({1},{2},{3},{4},{null}) → only the id-3 dup counts; the singleton
      // null row is NOT a violation (it rides the completeness check),
      // matching failureRows' window semantics
      "id.unique" -> ((1L, 0)),
      "amount.positive" -> ((1L, 0)),
      "status.known" -> ((1L, 0)),
      "amount.range" -> ((2L, 0)),        // -5.0 below and 10.0 above
      "account.exists" -> ((1L, 0)),
      "account.max_2_rows" -> ((1L, 0))), // one oversized group (a1)
      s"verdict mismatch: ${verdicts.toSeq.sortBy(_._1)}")

    // a clean suite on the same data passes with zero violations
    val clean = Quality.check(df, Seq(
      InRange("amount.loose", "amount", -100.0, 100.0),
      MaxPerGroup("account.max_9", Seq("account"), 9L))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(clean.toSet == Set(("amount.loose", 0L, 1),
      ("account.max_9", 0L, 1)))

    // verdict order is declaration order (no sort required of the caller)
    val names = Quality.check(df, suite).select("check_name")
      .collect().map(_.getString(0)).toSeq
    assert(names == suite.map(_.name))

    // failureRows: exactly the planted offenders
    def ids(c: Constraint) = Quality.failureRows(df, c)
      .select("id").collect().map(r =>
        if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq
    assert(ids(suite(0)) == Seq(-1L))               // the null-id row
    assert(ids(suite(1)) == Seq(3L, 3L))            // both rows of dup id
    assert(ids(suite(2)) == Seq(2L))                // negative amount
    assert(ids(suite(3)) == Seq(4L))                // weird status
    assert(ids(suite(4)) == Seq(1L, 2L))            // 10.0 and -5.0
    assert(ids(suite(5)) == Seq(4L))                // orphan account a9
    assert(ids(suite(6)) == Seq(1L, 2L, 3L))        // all rows of group a1
  }

  test("Unique null semantics: singleton null key is clean; duplicated " +
      "null keys count as surplus and check() agrees with failureRows") {
    val spark2 = spark
    import spark2.implicits._
    val one = Seq(Option(1L), Option(2L), Option.empty[Long])
      .toDF("id")
    val v1 = Quality.check(one, Seq(Unique("u", Seq("id")))).collect()
    assert(v1.head.getLong(1) == 0L && v1.head.getInt(2) == 1,
      "singleton null key must not violate uniqueness")
    assert(Quality.failureRows(one, Unique("u", Seq("id"))).count() == 0L)

    val two = Seq(Option(1L), Option.empty[Long], Option.empty[Long])
      .toDF("id")
    val v2 = Quality.check(two, Seq(Unique("u", Seq("id")))).collect()
    assert(v2.head.getLong(1) == 1L, "two null-keyed rows = 1 surplus")
    // failureRows returns BOTH rows of the duplicated null group
    assert(Quality.failureRows(two, Unique("u", Seq("id"))).count() == 2L)

    // multi-column tuple: (1,null) twice duplicates; (1,null) vs (2,null)
    // are distinct groups
    val multi = Seq((1L, Option.empty[String]), (1L, Option.empty[String]),
      (2L, Option.empty[String]), (1L, Option("x")))
      .toDF("a", "b")
    val v3 = Quality.check(multi,
      Seq(Unique("u", Seq("a", "b")))).collect()
    assert(v3.head.getLong(1) == 1L)
    assert(Quality.failureRows(multi, Unique("u", Seq("a", "b")))
      .count() == 2L)
  }

  test("statistical constraints: mean/stddev bounds verdict 0/1; " +
      "NoAnomalies counts z-outliers and returns them as failureRows") {
    val spark2 = spark
    import spark2.implicits._
    // 20 values ~N-ish around 10 (mean 10.0, stddev ~1) plus one wild
    // outlier at 100 — the only |z| > 3 row
    val vals = Seq.tabulate(20)(i => 9.0 + (i % 3)) :+ 100.0
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val out = Quality.check(df, Seq(
      MeanInRange("v.mean_ok", "v", 5.0, 20.0),
      MeanInRange("v.mean_fail", "v", 0.0, 9.0),     // mean ~14.3 > 9
      StddevInRange("v.sd_ok", "v", 1.0, 50.0),
      StddevInRange("v.sd_fail", "v", 0.0, 0.5),
      NoAnomalies("v.z3", "v", 3.0))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out("v.mean_ok") == ((0L, 1)))
    assert(out("v.mean_fail") == ((1L, 0)))
    assert(out("v.sd_ok") == ((0L, 1)))
    assert(out("v.sd_fail") == ((1L, 0)))
    assert(out("v.z3") == ((1L, 0)), out)
    // failureRows: the outlier row for NoAnomalies; EMPTY for the
    // dataset-level stats (no per-row offenders by definition)
    val anom = Quality.failureRows(df, NoAnomalies("v.z3", "v", 3.0))
      .select("v").collect().map(_.getDouble(0)).toSeq
    assert(anom == Seq(100.0))
    assert(Quality.failureRows(df,
      MeanInRange("v.mean_fail", "v", 0.0, 9.0)).count() == 0L)
    assert(Quality.failureRows(df,
      StddevInRange("v.sd_fail", "v", 0.0, 0.5)).count() == 0L)
    // empty + constant tables pass (null/zero stddev is not a violation)
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val c = Quality.check(const, Seq(
      NoAnomalies("v.z", "v", 1.0),
      StddevInRange("v.sd", "v", 0.0, 1.0))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c == Map("v.z" -> 0L, "v.sd" -> 0L))
    val empty = Seq.empty[Double].toDF("v")
    val e = Quality.check(empty, Seq(
      MeanInRange("v.m", "v", 0.0, 1.0),
      StddevInRange("v.sd", "v", 0.0, 1.0),
      NoAnomalies("v.z", "v", 3.0))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(e == Set(("v.m", 0L, 1), ("v.sd", 0L, 1), ("v.z", 0L, 1)))
  }

  test("duplicate constraint names are rejected; suite over an empty " +
      "table passes everything") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, "x")).toDF("id", "v").limit(0)
    intercept[IllegalArgumentException] {
      Quality.check(df, Seq(NotNull("a", "id"), NotNull("a", "v")))
    }
    val out = Quality.check(df, Seq(
      NotNull("id.not_null", "id"),
      Unique("id.unique", Seq("id")),
      MaxPerGroup("v.cap", Seq("v"), 1L))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set(("id.not_null", 0L, 1), ("id.unique", 0L, 1),
      ("v.cap", 0L, 1)))
  }
}
