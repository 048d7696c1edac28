package graft

import graft.operators.{Evaluation, Ranking}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EvalSpec extends GraftSuite {

  test("globalRunningSum matches the single-partition window cumsum") {
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("long").as("q"))
    val keys = Seq(col("l_orderkey"), col("l_linenumber"))
    val got = Ranking.globalRunningSum(li, keys, col("q"), parts = 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("cum"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val w = Window.orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = li.withColumn("cum", sum(col("q")).over(w))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getLong(3))).toMap
    assert(got == want)
  }

  test("globalRunningSum: null values fold to 0, all-null partitions don't NPE") {
    val s2 = spark; import s2.implicits._
    // low sort-key range = all-null values -> that partition's sum is null
    // without the coalesce, and the driver offset collection NPEs
    val df = Seq((1, None: Option[Long]), (2, None), (3, Some(5L)),
      (4, Some(7L)), (5, None), (6, Some(1L))).toDF("k", "v")
    val got = Ranking.globalRunningSum(df, Seq(col("k")), col("v"), parts = 3)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got == Map(1 -> 0L, 2 -> 0L, 3 -> 5L, 4 -> 12L, 5 -> 12L, 6 -> 13L))
  }

  test("aucExact: separable, all-tied, and hand-scored cases") {
    val s2 = spark; import s2.implicits._
    // perfectly separable -> AUC 1
    val sep = Seq((10, true), (9, true), (2, false), (1, false)).toDF("s", "y")
    assert(Evaluation.aucExact(sep, col("s"), col("y")).head().getDouble(2) == 1.0)
    // everything tied -> AUC 0.5
    val tied = Seq((5, true), (5, true), (5, false)).toDF("s", "y")
    assert(Evaluation.aucExact(tied, col("s"), col("y")).head().getDouble(2) == 0.5)
    // mixed with ties: pos scores {3, 2}, neg scores {2, 1}
    // pairs: (3,2)=1 (3,1)=1 (2,2)=.5 (2,1)=1 -> U=3.5, AUC=3.5/4
    val mix = Seq((3, true), (2, true), (2, false), (1, false)).toDF("s", "y")
    assert(Evaluation.aucExact(mix, col("s"), col("y")).head().getDouble(2) == 0.875)
  }

  test("aucExact matches the brute-force pairwise U on random data") {
    val s2 = spark; import s2.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map(_ => (rnd.nextInt(20), rnd.nextBoolean()))
    val df = rows.toDF("s", "y")
    val got = Evaluation.aucExact(df, col("s"), col("y")).head().getDouble(2)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val want = BigDecimal(u / (pos.size.toDouble * neg.size))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == want, s"auc $got vs brute $want")
  }

  test("calibrationBins: bucket populations are equal-depth and rates exact") {
    val s2 = spark; import s2.implicits._
    val df = (1 to 100).map(i => (i.toLong, i % 3 == 0, i.toLong)).toDF("s", "y", "id")
    val rows = Evaluation.calibrationBins(df, col("s"), col("y"), 4, Seq(col("id")))
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 4))
    assert(rows.map(_.getLong(1)).toSeq == Seq(25L, 25L, 25L, 25L))
    // bucket 1 holds scores 1..25 -> positives are multiples of 3: 8 of 25
    assert(rows(0).getLong(2) == 8L && rows(0).getDouble(3) == 0.32)
    assert(rows(0).getDouble(4) == 13.0) // mean of 1..25
  }

  test("aucExact drops NULL scores (unscored rows are not rankable)") {
    val s2 = spark; import s2.implicits._
    val df = Seq((Some(3L), true), (Some(2L), true), (Some(1L), false),
        (None: Option[Long], true), (None: Option[Long], false))
      .toDF("s", "y")
    val r = Evaluation.aucExact(df, col("s"), col("y")).head()
    // only the 3 scored rows count: 2 pos / 1 neg, perfectly separated
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 1L, 1.0)))
  }

  test("confusionAtThreshold counts and rates") {
    val s2 = spark; import s2.implicits._
    val df = Seq((10, true), (9, false), (4, true), (2, false)).toDF("s", "y")
    val r = Evaluation.confusionAtThreshold(df, col("s"), col("y"), lit(5)).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L, 1L)))
    assert(r.getDouble(4) == 0.5 && r.getDouble(5) == 0.5)
  }
}
