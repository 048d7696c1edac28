package graft

import java.sql.Timestamp
import java.time.Instant
import graft.functions.Buckets.Granularity
import graft.operators.Metrics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of the reference's metrics data-correctness conformance suite
  * (`internal/logstore/drivertest/metrics_data_correctness.go`, dataset in
  * `metrics_dataset.go`): a deterministic January-2000 dataset with known
  * totals for every measure × dimension × filter × granularity combination
  * the metrics engine supports. This is the edge-case net beyond the oracled
  * gates — multi-unit buckets, Sunday weeks, dense-fill cardinality,
  * no-granularity totals, tenant isolation.
  */
class MetricsCorrectnessSpec extends GraftSuite {

  import Metrics.Request

  private val T1 = "m_tenant_1"
  private val T2 = "m_tenant_2"
  private val topics = Seq("user.created", "user.deleted", "user.updated")

  /** metrics_dataset.go:30-100 — 300 tenant-1 entries (5 sparse days × 10
    * hourly + dense Jan 15 bell curve) + 5 tenant-2 entries. */
  private lazy val entries: DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    def utc(month: Int, day: Int, hour: Int, min: Int = 0, sec: Int = 0): Timestamp =
      Timestamp.from(Instant.parse(f"2000-$month%02d-$day%02dT$hour%02d:$min%02d:$sec%02dZ"))

    val sparseDays = Seq(3, 7, 11, 22, 28)
    val sparseTimes = sparseDays.flatMap(d => (9 to 18).map(h => utc(1, d, h)))
    val denseHours = Seq(10 -> 25, 11 -> 50, 12 -> 100, 13 -> 50, 14 -> 25)
    val denseTimes = denseHours.flatMap { case (h, n) =>
      (0 until n).map { i =>
        val off = i * 3600 / n
        utc(1, 15, h, off / 60, off % 60)
      }
    }
    val times = sparseTimes ++ denseTimes // 50 + 250, insertion order
    val t1 = times.zipWithIndex.map { case (ts, i) =>
      val status = if (i % 5 <= 2) "success" else "failed"
      val code =
        if (status == "success") { if (i % 2 == 0) "200" else "201" }
        else { if (i % 2 == 0) "500" else "422" }
      (s"m_evt_1_$i", T1, s"m_dest_1.${i % 2 + 1}", topics(i % 3), ts,
        status, code, 1, i % 10 == 9, i % 3 != 2)
    }
    val t2 = Seq(utc(1, 5, 9), utc(1, 10, 9), utc(1, 15, 12, 15),
      utc(1, 22, 9), utc(1, 27, 9)).zipWithIndex.map { case (ts, i) =>
      (s"m_evt_2_$i", T2, "m_dest_2.1", "user.created", ts,
        "success", "200", 1, false, true)
    }
    (t1 ++ t2).toDF("event_id", "tenant_id", "destination_id", "topic", "ts",
      "status", "code", "attempt_number", "manual", "eligible_for_retry")
  }

  private val fullRange = (Instant.parse("2000-01-01T00:00:00Z"), Instant.parse("2000-02-01T00:00:00Z"))
  private val denseRange = (Instant.parse("2000-01-15T00:00:00Z"), Instant.parse("2000-01-16T00:00:00Z"))

  private def total(measures: Seq[String], dims: Seq[String] = Nil,
                    filters: Map[String, Seq[String]] = Map("tenant_id" -> Seq(T1)),
                    range: (Instant, Instant) = fullRange): Array[org.apache.spark.sql.Row] =
    Metrics.queryTotal(spark, entries,
      Request(range._1, range._2, Granularity.parse("1d"), measures, dims, filters),
      Metrics.attemptMeasures).collect()

  private def bucketed(g: String, measures: Seq[String], dims: Seq[String] = Nil,
                       filters: Map[String, Seq[String]] = Map("tenant_id" -> Seq(T1)),
                       range: (Instant, Instant) = fullRange): Array[org.apache.spark.sql.Row] =
    Metrics.query(spark, entries,
      Request(range._1, range._2, Granularity.parse(g), measures, dims, filters),
      Metrics.attemptMeasures).df.collect()

  // ─── event-level (count/rate over delivery events) ───────────────────

  test("count all: 300") {
    val r = total(Seq("count"))
    assert(r.length == 1 && r.head.getLong(0) == 300)
  }

  test("by topic: 100 each") {
    val r = total(Seq("count"), dims = Seq("topic"))
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == topics.map(_ -> 100L).toMap)
  }

  test("by destination_id: 150 each") {
    val r = total(Seq("count"), dims = Seq("destination_id"))
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("m_dest_1.1" -> 150L, "m_dest_1.2" -> 150L))
  }

  test("by tenant_id (no tenant filter): 300 + 5") {
    val r = total(Seq("count"), dims = Seq("tenant_id"), filters = Map.empty)
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map(T1 -> 300L, T2 -> 5L))
  }

  test("filter by topic: 100; by destination: 150") {
    assert(total(Seq("count"),
      filters = Map("tenant_id" -> Seq(T1), "topic" -> Seq(topics.head))).head.getLong(0) == 100)
    assert(total(Seq("count"),
      filters = Map("tenant_id" -> Seq(T1), "destination_id" -> Seq("m_dest_1.1"))).head.getLong(0) == 150)
  }

  test("tenant isolation: tenant 2 sees 5") {
    assert(total(Seq("count"), filters = Map("tenant_id" -> Seq(T2))).head.getLong(0) == 5)
  }

  test("empty time range: empty result (no zero row)") {
    val r = total(Seq("count"),
      range = (Instant.parse("1999-01-01T00:00:00Z"), Instant.parse("1999-02-01T00:00:00Z")))
    assert(r.isEmpty)
  }

  test("rate, no granularity: 300 / 2678400 s") {
    val r = total(Seq("rate"))
    assert(r.length == 1 && math.abs(r.head.getDouble(0) - 300.0 / 2678400.0) < 1e-7)
  }

  test("rate with 1h granularity on dense day: rate = count/3600 in all 24 buckets") {
    val r = bucketed("1h", Seq("count", "rate"), range = denseRange)
    assert(r.length == 24)
    r.foreach { row =>
      assert(math.abs(row.getAs[Double]("rate") - row.getAs[Long]("count") / 3600.0) < 1e-7)
    }
  }

  test("granularity 1M: one bucket of 300") {
    val r = bucketed("1M", Seq("count"))
    assert(r.length == 1 && r.head.getAs[Long]("count") == 300)
  }

  test("granularity 1w: totals preserved") {
    val r = bucketed("1w", Seq("count"))
    assert(r.nonEmpty && r.map(_.getAs[Long]("count")).sum == 300)
  }

  test("granularity 2d: totals preserved (epoch-anchored multi-day buckets)") {
    val r = bucketed("2d", Seq("count"))
    assert(r.nonEmpty && r.map(_.getAs[Long]("count")).sum == 300)
  }

  test("granularity 1d on dense day range: one bucket of 250") {
    val r = bucketed("1d", Seq("count"), range = denseRange)
    assert(r.length == 1 && r.head.getAs[Long]("count") == 250)
  }

  test("granularity 1h on dense day: bell curve 25/50/100/50/25, 24 buckets") {
    val r = bucketed("1h", Seq("count"), range = denseRange)
    assert(r.length == 24)
    val hourly = r.map(row =>
      row.getAs[Timestamp]("bucket").toInstant.atZone(java.time.ZoneOffset.UTC).getHour ->
        row.getAs[Long]("count")).toMap
    assert(hourly(10) == 25 && hourly(11) == 50 && hourly(12) == 100 &&
      hourly(13) == 50 && hourly(14) == 25)
    assert(r.map(_.getAs[Long]("count")).sum == 250)
  }

  test("granularity 1m on dense-day hours: 60 buckets, totals 25 and 100") {
    val h10 = bucketed("1m", Seq("count"),
      range = (Instant.parse("2000-01-15T10:00:00Z"), Instant.parse("2000-01-15T11:00:00Z")))
    assert(h10.length == 60 && h10.map(_.getAs[Long]("count")).sum == 25)
    val h12 = bucketed("1m", Seq("count"),
      range = (Instant.parse("2000-01-15T12:00:00Z"), Instant.parse("2000-01-15T13:00:00Z")))
    assert(h12.length == 60 && h12.map(_.getAs[Long]("count")).sum == 100)
  }

  // ─── attempt-level measure matrix ────────────────────────────────────

  test("successful and failed counts: 180 / 120") {
    val r = total(Seq("count", "successful_count", "failed_count")).head
    assert(r.getLong(0) == 300 && r.getLong(1) == 180 && r.getLong(2) == 120)
  }

  test("error rate: 0.4") {
    assert(math.abs(total(Seq("error_rate")).head.getDouble(0) - 0.4) < 1e-3)
  }

  test("retry measures: first=270, retry=0, manual=30, avg=1.0") {
    val r = total(Seq("first_attempt_count", "retry_count", "manual_retry_count",
      "avg_attempt_number")).head
    assert(r.getLong(0) == 270 && r.getLong(1) == 0 && r.getLong(2) == 30)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-3)
  }

  test("rate family, no granularity: total/successful/failed over 2678400 s") {
    val r = total(Seq("rate", "successful_rate", "failed_rate")).head
    assert(math.abs(r.getDouble(0) - 300.0 / 2678400.0) < 1e-7)
    assert(math.abs(r.getDouble(1) - 180.0 / 2678400.0) < 1e-7)
    assert(math.abs(r.getDouble(2) - 120.0 / 2678400.0) < 1e-7)
  }

  test("by status: success=180, failed=120") {
    val r = total(Seq("count"), dims = Seq("status"))
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("success" -> 180L, "failed" -> 120L))
  }

  test("by attempt_number: all 300 at 1") {
    val r = total(Seq("count"), dims = Seq("attempt_number"))
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(1 -> 300L))
  }

  test("by code: 200=90, 201=90, 500=60, 422=60") {
    val r = total(Seq("count"), dims = Seq("code"))
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("200" -> 90L, "201" -> 90L, "500" -> 60L, "422" -> 60L))
  }

  test("filters: status/code/manual/attempt_number") {
    def one(extra: (String, Seq[String])): Long =
      total(Seq("count"), filters = Map("tenant_id" -> Seq(T1), extra)).head.getLong(0)
    assert(one("status" -> Seq("failed")) == 120)
    assert(one("code" -> Seq("500")) == 60)
    assert(one("manual" -> Seq("true")) == 30)
    assert(one("attempt_number" -> Seq("1")) == 300)
  }

  test("attempt metrics: 1h dense-day buckets carry the bell curve too") {
    val r = bucketed("1h", Seq("count", "failed_count"), range = denseRange)
    assert(r.length == 24)
    assert(r.map(_.getAs[Long]("count")).sum == 250)
    // i%5∈{3,4} failed; dense-day indices 50..299 → 100 failures on Jan 15
    assert(r.map(_.getAs[Long]("failed_count")).sum == 100)
  }

  // ─── characteristics (drivertest/metrics_characteristics.go) ─────────

  test("deterministic bucket counts across granularity/range combos") {
    def buckets(s: String, e: String, g: String): Int =
      bucketed(g, Seq("count"),
        range = (Instant.parse(s), Instant.parse(e))).length
    assert(buckets("2000-01-15T00:00:00Z", "2000-01-16T00:00:00Z", "1h") == 24)
    assert(buckets("2000-01-01T00:00:00Z", "2000-01-08T00:00:00Z", "1d") == 7)
    assert(buckets("2000-01-15T10:00:00Z", "2000-01-15T11:00:00Z", "1m") == 60)
    assert(buckets("2000-01-15T10:00:00Z", "2000-01-15T11:00:00Z", "5m") == 12)
    // granularity larger than the range → one bucket
    assert(buckets("2000-01-15T10:00:00Z", "2000-01-15T16:00:00Z", "1d") == 1)
  }

  test("empty buckets carry explicit zeros, never nulls; ordering is chronological") {
    val r = bucketed("1h", Seq("count", "rate"), range = denseRange)
    assert(r.length == 24)
    r.foreach { row =>
      assert(!row.isNullAt(row.fieldIndex("count")) && !row.isNullAt(row.fieldIndex("rate")))
    }
    // hours 0-9 and 15-23 are empty on the dense day → zero, not null
    assert(r.count(_.getAs[Long]("count") == 0L) == 19)
    val times = r.map(_.getAs[Timestamp]("bucket").getTime)
    assert(times.sameElements(times.sorted), "buckets must come back in time order")
  }

  test("no-data range with granularity still zero-fills every bucket") {
    val r = bucketed("1d", Seq("count"),
      range = (Instant.parse("2000-03-01T00:00:00Z"), Instant.parse("2000-03-11T00:00:00Z")))
    assert(r.length == 10 && r.forall(_.getAs[Long]("count") == 0L))
  }

  test("bucket alignment: starts truncate to the granularity boundary") {
    // range starting mid-hour at 1h: first bucket is the enclosing hour
    val r1 = bucketed("1h", Seq("count"),
      range = (Instant.parse("2000-01-15T10:30:00Z"), Instant.parse("2000-01-15T12:00:00Z")))
    assert(r1.head.getAs[Timestamp]("bucket").toInstant ==
      Instant.parse("2000-01-15T10:00:00Z"))
    val r2 = bucketed("1d", Seq("count"),
      range = (Instant.parse("2000-01-15T10:30:00Z"), Instant.parse("2000-01-17T00:00:00Z")))
    assert(r2.head.getAs[Timestamp]("bucket").toInstant ==
      Instant.parse("2000-01-15T00:00:00Z"))
  }

  test("dimensions don't cartesian-explode: each observed topic gets exactly 24 buckets") {
    val r = bucketed("1h", Seq("count"), dims = Seq("topic"), range = denseRange)
    val byTopic = r.groupBy(_.getAs[String]("topic"))
    assert(r.length == byTopic.size * 24)
    byTopic.foreach { case (_, rows) =>
      assert(rows.length == 24, "dense filling per observed combo along the time axis")
    }
  }

  test("too many buckets surfaces the resource-limit client error") {
    intercept[Metrics.ResourceLimitExceeded] {
      bucketed("1s", Seq("count"),
        range = (Instant.parse("2000-01-01T00:00:00Z"), Instant.parse("2000-01-03T00:00:00Z")))
    }
  }

  test("no granularity, no-data range: empty, not zero-filled (queryTotal)") {
    val r = total(Seq("count"),
      range = (Instant.parse("2000-02-01T00:00:00Z"), Instant.parse("2000-03-01T00:00:00Z")))
    assert(r.isEmpty)
  }

  test("metadata: row count + truncation flag via run()") {
    val (rows, truncated) = Metrics.run(spark, entries,
      Request(fullRange._1, fullRange._2, Granularity.parse("1d"), Seq("count"),
        filters = Map("tenant_id" -> Seq(T1))),
      Metrics.attemptMeasures)
    assert(rows.length == 31 && !truncated)
  }
}
