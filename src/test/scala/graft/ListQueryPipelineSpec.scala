package graft

import java.time.Instant
import graft.core.Tables
import graft.operators.{Keyset, ListQuery}
import graft.streaming.{Alerts, Pipeline}
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class ListQueryPipelineSpec extends GraftSuite {

  test("list API: filters + clamped limit + cursor walk match a direct query") {
    val df = Tables.events(spark, sf)
    val req = ListQuery.Request(
      inFilters = Map("event_type" -> Seq("purchase", "click")),
      timeFilters = Seq((ListQuery.Gte, Instant.parse("2024-01-05T00:00:00Z")),
        (ListQuery.Lt, Instant.parse("2024-01-20T00:00:00Z"))),
      order = Keyset.Asc, limit = 40)
    val p1 = ListQuery.list(df, req, "evt", "ts", "event_id")
    val p2 = ListQuery.list(df, req.copy(next = p1.next), "evt", "ts", "event_id")
    val got = (p1.rows ++ p2.rows).map(_.getAs[Long]("event_id"))
    val want = df.filter(col("event_type").isin("purchase", "click") &&
        col("ts") >= lit("2024-01-05").cast("timestamp") &&
        col("ts") < lit("2024-01-20").cast("timestamp"))
      .orderBy(col("ts"), col("event_id")).limit(80)
      .collect().map(_.getAs[Long]("event_id")).toSeq
    assert(got == want)
  }

  test("list API: Lte/Gt bounds are inclusive/exclusive at µs precision") {
    val df = Tables.events(spark, sf)
    val pivot = Instant.parse("2024-01-15T00:00:00Z")
    val lte = ListQuery.list(df, ListQuery.Request(
      timeFilters = Seq((ListQuery.Lte, pivot)), order = Keyset.Desc, limit = 5),
      "evt", "ts", "event_id")
    lte.rows.foreach(r =>
      assert(!r.getAs[java.sql.Timestamp]("ts").toInstant.isAfter(pivot)))
    val gt = ListQuery.list(df, ListQuery.Request(
      timeFilters = Seq((ListQuery.Gt, pivot)), order = Keyset.Asc, limit = 5),
      "evt", "ts", "event_id")
    gt.rows.foreach(r =>
      assert(r.getAs[java.sql.Timestamp]("ts").toInstant.isAfter(pivot)))
  }

  test("retrieve: point lookup") {
    val df = Tables.events(spark, sf)
    assert(ListQuery.retrieve(df, "event_id", 42L).map(_.getAs[Long]("event_id")) == Some(42L))
    assert(ListQuery.retrieve(df, "event_id", -1L).isEmpty)
  }

  test("end-to-end streaming: raw JSON -> validate -> fanout -> attempts -> alerts") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext

    val destinations = Seq(
      Destination("d1", "t1", "webhook", Seq("order.*"), None, disabled = false),
      Destination("d2", "t1", "webhook", Seq("*"),
        Some("""{"data":{"amount":{"$gte":100}}}"""), disabled = false)).toDS()

    // stage 1: raw JSON stream → validated events → fanout tasks (streaming)
    val raw = MemoryStream[String]
    val tasks = Pipeline.matchFanout(spark,
      Pipeline.validateAndDefault(raw.toDF()), destinations)
    val q1 = tasks.writeStream.format("memory").queryName("e2e_tasks")
      .outputMode("append").start()
    try {
      raw.addData(
        """{"event_id":"e1","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:00Z","data":{"amount":150}}""",
        """{"event_id":"e2","tenant_id":"t1","topic":"order.created","event_time":"2024-01-01T00:00:01Z","data":{"amount":50}}""",
        """{"event_id":"e3","tenant_id":"t1","topic":"user.created","event_time":"2024-01-01T00:00:02Z","data":{"amount":500}}""",
        """{"event_id":"bad","tenant_id":"t1","topic":"order.created","data":"nope"}""")
      q1.processAllAvailable()
      val got = spark.sql("SELECT event_id, destination_id FROM e2e_tasks")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("e1", "d1"), ("e1", "d2"), ("e2", "d1"), ("e3", "d2")))
    } finally q1.stop()

    // stage 2: delivery outcomes (simulated: d1 always fails) → alert stream
    val attempts = MemoryStream[Attempt]
    val alerts = Alerts.evaluateStream(spark, attempts.toDS(),
      Alerts.Config(autoDisableCount = 2, thresholds = Seq(100), maxRetries = 10))
    val q2 = alerts.writeStream.format("memory").queryName("e2e_alerts")
      .outputMode("append").start()
    try {
      val t0 = new java.sql.Timestamp(1704067200000L)
      attempts.addData(
        Attempt("a1", "e1", "t1", "d1", "webhook", 1, false, "failed", t0, "500"),
        Attempt("a2", "e2", "t1", "d1", "webhook", 1, false, "failed", t0, "500"),
        Attempt("a3", "e1", "t1", "d2", "webhook", 1, false, "success", t0, "200"))
      q2.processAllAvailable()
      val kinds = spark.sql("SELECT kind, destination_id FROM e2e_alerts")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      assert(kinds == Seq(("destination_disabled", "d1")))
    } finally q2.stop()
  }
}
