package graft

import java.time.Instant
import graft.functions.Buckets
import graft.functions.Buckets._
import scala.util.Random

class BucketsSpec extends GraftSuite {

  private val rnd = new Random(42)
  private val units = Seq(Second, Minute, Hour, Day, Week, Month)
  private def randInstant(): Instant = Instant.ofEpochMilli(math.abs(rnd.nextLong()) % 4102444800000L)
  private def randGran(): Granularity = Granularity(1 + rnd.nextInt(12), units(rnd.nextInt(units.size)))

  test("truncate is idempotent and <= input (1000 random cases)") {
    (1 to 1000).foreach { _ =>
      val t = randInstant(); val g = randGran()
      val b = truncate(t, g)
      assert(!b.isAfter(t), s"$t $g")
      assert(truncate(b, g) == b, s"$t $g")
    }
  }

  test("advance moves to the next bucket start; no bucket between (1000 random cases)") {
    (1 to 1000).foreach { _ =>
      val t = randInstant(); val g = randGran()
      val b = truncate(t, g)
      val n = advance(b, g)
      assert(n.isAfter(b), s"$t $g")
      assert(truncate(n, g) == n, s"$t $g")
      val mid = Instant.ofEpochMilli(b.toEpochMilli / 2 + n.toEpochMilli / 2)
      assert(truncate(mid, g) == b, s"$t $g mid=$mid")
    }
  }

  test("known anchors: Sunday weeks, epoch-anchored multi-day, calendar months") {
    val t = Instant.parse("2024-01-01T10:30:00Z") // a Monday
    assert(truncate(t, Granularity(1, Week)) == Instant.parse("2023-12-31T00:00:00Z"))
    assert(truncate(t, Granularity(4, Day)) == Instant.parse("2023-12-29T00:00:00Z"))
    assert(truncate(t, Granularity(1, Month)) == Instant.parse("2024-01-01T00:00:00Z"))
    assert(truncate(t, Granularity(3, Month)) == Instant.parse("2024-01-01T00:00:00Z"))
    assert(truncate(Instant.parse("2024-02-15T00:00:00Z"), Granularity(3, Month)) ==
      Instant.parse("2024-01-01T00:00:00Z"))
    assert(truncate(t, Granularity(2, Hour)) == Instant.parse("2024-01-01T10:00:00Z"))
  }

  test("bucketSeconds uses true calendar month lengths") {
    assert(bucketSeconds(Instant.parse("2024-02-01T00:00:00Z"), Granularity(1, Month)) == 29L * 86400)
    assert(bucketSeconds(Instant.parse("2023-02-01T00:00:00Z"), Granularity(1, Month)) == 28L * 86400)
    assert(bucketSeconds(Instant.parse("2024-01-01T00:00:00Z"), Granularity(1, Week)) == 604800L)
  }

  test("generateSlots covers [start,end) contiguously") {
    val s = Instant.parse("2024-01-05T07:00:00Z")
    val e = Instant.parse("2024-02-01T00:00:00Z")
    val slots = generateSlots(s, e, Granularity(1, Day))
    assert(slots.head == Instant.parse("2024-01-05T00:00:00Z"))
    assert(slots.last.isBefore(e))
    slots.sliding(2).foreach {
      case Seq(a, b) => assert(advance(a, Granularity(1, Day)) == b)
      case _ =>
    }
  }

  test("column form agrees with pure form") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val instants = Seq(
      "2024-01-01T00:00:00Z", "2024-01-07T13:14:15Z", "2023-12-31T23:59:59Z",
      "2024-02-29T12:00:00Z", "1999-06-06T06:06:06Z", "2026-08-12T01:02:03Z")
      .map(Instant.parse)
    val df = instants.map(i => new java.sql.Timestamp(i.toEpochMilli)).toDF("ts")
    for (g <- Seq(Granularity(1, Hour), Granularity(2, Hour), Granularity(1, Day),
      Granularity(4, Day), Granularity(1, Week), Granularity(2, Week),
      Granularity(1, Month), Granularity(3, Month))) {
      val got = df.select(unix_millis(Buckets.bucketExpr(col("ts"), g)).as("b"))
        .collect().map(_.getLong(0)).toSeq
      val want = instants.map(i => truncate(i, g).toEpochMilli)
      assert(got == want, s"granularity $g")
    }
  }

  test("column form agrees with pure form on 1000 random instants, " +
      "1900-2100 (pins the integer civil-date month key)") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    // full span incl. pre-1970 (negative epoch), leap days, century years
    val lo = Instant.parse("1900-01-01T00:00:00Z").toEpochMilli
    val hi = Instant.parse("2100-01-01T00:00:00Z").toEpochMilli
    val instants = Seq.fill(1000)(
      Instant.ofEpochMilli(lo + (rnd.nextDouble() * (hi - lo)).toLong))
    val df = instants.map(i => new java.sql.Timestamp(i.toEpochMilli)).toDF("ts")
    for (g <- Seq(Granularity(1, Month), Granularity(3, Month),
      Granularity(1, Week), Granularity(1, Day))) {
      val got = df.select(unix_millis(Buckets.bucketExpr(col("ts"), g)).as("b"))
        .collect().map(_.getLong(0)).toSeq
      val want = instants.map(i => truncate(i, g).toEpochMilli)
      assert(got == want, s"granularity $g: first diff at " +
        got.zip(want).zipWithIndex.find(p => p._1._1 != p._1._2)
          .map(p => s"${instants(p._2)}").getOrElse("?"))
    }
  }

  test("bucketSecondsExpr agrees with pure bucketSeconds") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val buckets = Seq("2024-01-01T00:00:00Z", "2024-02-01T00:00:00Z", "2023-02-01T00:00:00Z")
      .map(Instant.parse)
    val df = buckets.map(i => new java.sql.Timestamp(i.toEpochMilli)).toDF("bucket")
    for (g <- Seq(Granularity(1, Month), Granularity(2, Month), Granularity(1, Day))) {
      val got = df.select(Buckets.bucketSecondsExpr(col("bucket"), g).cast("long"))
        .collect().map(_.getLong(0)).toSeq
      val want = buckets.map(b => bucketSeconds(b, g))
      assert(got == want, s"granularity $g")
    }
  }

  test("slot cap throws past 100000") {
    assertThrows[IllegalArgumentException] {
      generateSlots(Instant.EPOCH, Instant.parse("1974-01-01T00:00:00Z"), Granularity(1, Second))
    }
  }

  test("native tumbling window(step, step, anchor) == truncate for sub-month granularities") {
    // the mapping streamingMetricsAt relies on: Spark's window anchor is
    // the epoch, ours too (weeks shift to Sunday 1970-01-04 via startTime)
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val rnd = new Random(11)
    val instants = (1 to 80).map(_ =>
      Instant.ofEpochMilli(math.abs(rnd.nextLong()) % 4102444800000L))
    val df = instants.map(i => new java.sql.Timestamp(i.toEpochMilli)).toDF("ts")
    val grans = Seq(Granularity(1, Hour), Granularity(7, Minute),
      Granularity(90, Second), Granularity(2, Day), Granularity(1, Week),
      Granularity(3, Week), Granularity(5, Day))
    for (g <- grans) {
      val step = s"${g.unit.seconds * g.value} seconds"
      val anchor = if (g.unit == Week) "259200 seconds" else "0 seconds"
      val got = df.select(unix_millis(
          window(col("ts"), step, step, anchor).getField("start")).as("b"))
        .collect().map(_.getLong(0)).toSeq
      val want = instants.map(i => truncate(i, g).toEpochMilli)
      assert(got == want, s"granularity $g")
    }
  }
}
