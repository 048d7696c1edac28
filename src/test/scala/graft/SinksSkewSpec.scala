package graft

import java.time.Instant
import graft.functions.Buckets.Granularity
import graft.operators.{Metrics, Skew}
import graft.streaming.Sinks
import org.apache.spark.sql.functions._

class SinksSkewSpec extends GraftSuite {

  test("file webhook sink: signed deliveries land per destination, outcomes returned") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val secret = "whsec_test"
    val tasks = Seq(
      ("e1", "t1", "d1", 1, false, new java.sql.Timestamp(0), "order.created", """{"amount":1}""", Map.empty[String, String], true, "webhook"),
      ("e2", "t1", "d2", 1, false, new java.sql.Timestamp(0), "order.created", """{"amount":2}""", Map.empty[String, String], true, "webhook"))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    val registry = new Sinks.Registry(Seq(Sinks.FileWebhookSink(root, secret)))
    val outcomes = registry.deliver(tasks).collect()
    assert(outcomes.length == 2 && outcomes.forall(_.getAs[String]("status") == "success"))

    // the wire payloads exist per destination and carry a valid signature
    val delivered = spark.read.text(s"$root/destination_id=d1").collect().map(_.getString(0))
    assert(delivered.length == 1)
    val parsed = graft.functions.JsonMatch.parse(delivered.head)
    assert(parsed.get("event_id").asText == "e1")
    assert(parsed.get("signature").asText ==
      Sinks.renderSignature(secret)(parsed.get("data").asText))
  }

  test("opevents: alerts map to the reference's operational topics") {
    val spark2 = spark
    import spark2.implicits._
    val alerts = Seq(
      graft.streaming.Model.Alert("t1", "d1", "consecutive_failure", 50, 5,
        new java.sql.Timestamp(1704067200000L)),
      graft.streaming.Model.Alert("t1", "d1", "destination_disabled", 100, 10,
        new java.sql.Timestamp(1704067260000L)),
      graft.streaming.Model.Alert("t1", "d2", "retries_exhausted", 0, 3,
        new java.sql.Timestamp(1704067320000L))).toDS()
    val ope = graft.streaming.Opevents.toOperationalEvents(alerts).collect()
    val topics = ope.map(_.getAs[String]("topic")).toSet
    assert(topics == Set("alert.destination.consecutive_failure",
      "alert.destination.disabled", "alert.attempt.exhausted_retries"))
    ope.foreach { r =>
      assert(r.getAs[String]("event_id").startsWith("ope_t1:"))
      assert(graft.functions.JsonMatch.parse(r.getAs[String]("data"))
        .has("failure_count"))
    }
  }

  test("metadata merge priority: system < delivery < event") {
    val got = Sinks.mergeMetadata(
      Map("a" -> "sys", "b" -> "sys", "c" -> "sys"),
      Map("b" -> "del", "d" -> "del"),
      Map("c" -> "evt", "d" -> "evt", "e" -> "evt"))
    assert(got == Map("a" -> "sys", "b" -> "del", "c" -> "evt", "d" -> "evt", "e" -> "evt"))

    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Map("a" -> "sys", "b" -> "sys"), Map("b" -> "del"), Map("a" -> "evt")))
      .toDF("s", "d", "e")
    val merged = df.select(Sinks.mergeMetadataExpr(col("s"), col("d"), col("e")))
      .head().getMap[String, String](0)
    assert(merged == Map("a" -> "evt", "b" -> "del"))
  }

  test("salted aggregation equals direct aggregation") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 10000).map(i => (if (i % 100 == 0) "cold" else "hot", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", salts = 8)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("salted join is row-identical to the unsalted join for every left-family type") {
    val spark2 = spark
    import spark2.implicits._
    // 90% of the big side on one hot key, plus keys with no dimension row
    val big = ((1 to 9000).map(i => ("hot", i)) ++
      (1 to 500).map(i => (s"k${i % 50}", i)) ++
      (1 to 100).map(i => (s"orphan${i % 10}", i))).toDF("k", "v")
    val small = (Seq("hot") ++ (0 until 50).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "w")
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val plain = big.join(small, Seq("k"), jt)
      val salted = graft.operators.Skew.saltedJoin(big, small, Seq("k"),
        salts = 8, joinType = jt)
      assert(salted.columns.toSeq == plain.columns.toSeq, jt)
      val a = plain.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val b = salted.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(a == b, s"$jt diverged")
    }
  }

  test("metrics request validation fails fast on bad input") {
    val cat = Metrics.eventMeasures
    val dims = Set("event_type", "user_id")
    val ok = Metrics.Request(Instant.EPOCH, Instant.ofEpochSecond(3600),
      Granularity.parse("1h"), Seq("count"), Seq("event_type"))
    Metrics.validate(ok, cat, dims) // must not throw
    assertThrows[IllegalArgumentException](
      Metrics.validate(ok.copy(measures = Seq("nope")), cat, dims))
    assertThrows[IllegalArgumentException](
      Metrics.validate(ok.copy(dimensions = Seq("nope")), cat, dims))
    assertThrows[IllegalArgumentException](
      Metrics.validate(ok.copy(granularity = Granularity.parse("99h")), cat, dims))
    assertThrows[IllegalArgumentException](
      Metrics.validate(ok.copy(start = Instant.ofEpochSecond(7200)), cat, dims))
  }
}
