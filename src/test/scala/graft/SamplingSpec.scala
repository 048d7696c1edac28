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
