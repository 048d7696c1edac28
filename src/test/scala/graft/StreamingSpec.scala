package graft

import java.sql.Timestamp
import graft.core.Backoff
import graft.streaming.{Alerts, Pipeline, Retry}
import graft.streaming.Model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends GraftSuite {

  private def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)

  private val destinations = Seq(
    Destination("d_all", "t1", "webhook", Seq("*"), None, disabled = false),
    Destination("d_orders", "t1", "kafka", Seq("order.*"), None, disabled = false),
    Destination("d_big", "t1", "webhook", Seq("order.*"),
      Some("""{"data":{"amount":{"$gte":100}}}"""), disabled = false),
    Destination("d_off", "t1", "webhook", Seq("*"), None, disabled = true),
    Destination("d_other_tenant", "t2", "webhook", Seq("*"), None, disabled = false))

  test("match/fanout: broadcast join + topic glob + json filter + disabled skip") {
    val spark2 = spark
    import spark2.implicits._
    val events = Seq(
      ("e1", "t1", "order.created", true, ts(0), Map("k" -> "v"), """{"amount":150}"""),
      ("e2", "t1", "order.created", true, ts(1), Map.empty[String, String], """{"amount":50}"""),
      ("e3", "t1", "user.created", true, ts(2), Map.empty[String, String], """{"amount":999}"""),
      ("e4", "t2", "order.created", true, ts(3), Map.empty[String, String], """{}"""))
      .toDF("event_id", "tenant_id", "topic", "eligible_for_retry", "event_time", "metadata", "data")
    val fanout = Pipeline.matchFanout(spark, events, destinations.toDS())
    val got = fanout.select("event_id", "destination_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("e1", "d_all"), ("e1", "d_orders"), ("e1", "d_big"), // amount>=100
      ("e2", "d_all"), ("e2", "d_orders"), // filter rejects d_big
      ("e3", "d_all"), // topic glob rejects order-only dests
      ("e4", "d_other_tenant")))
    val stamped = Pipeline.stampMatches(fanout)
      .filter(col("event_id") === "e1")
      .select("matched_destination_ids").head().getSeq[String](0).toSet
    assert(stamped == Set("d_all", "d_orders", "d_big"))
  }

  test("direct-addressed events match only the named destination (eventhandler.go:202-224)") {
    val spark2 = spark
    import spark2.implicits._
    val events = Seq(
      // direct to d_orders: others would also match this topic, but only
      // the named destination is a candidate
      ("e1", "t1", "d_orders", "order.created", true, ts(0), Map.empty[String, String], """{"amount":150}"""),
      // direct to a destination whose TOPIC rejects: no fanout at all
      ("e2", "t1", "d_orders", "user.created", true, ts(1), Map.empty[String, String], """{}"""),
      // direct to a destination whose FILTER rejects: no fanout
      ("e3", "t1", "d_big", "order.created", true, ts(2), Map.empty[String, String], """{"amount":50}"""),
      // direct to a disabled destination: no fanout
      ("e4", "t1", "d_off", "order.created", true, ts(3), Map.empty[String, String], """{}"""),
      // no direct address: normal topic matching
      ("e5", "t1", null, "order.created", true, ts(4), Map.empty[String, String], """{"amount":150}"""))
      .toDF("event_id", "tenant_id", "destination_id", "topic",
        "eligible_for_retry", "event_time", "metadata", "data")
    val got = Pipeline.matchFanout(spark, events, destinations.toDS())
      .select("event_id", "destination_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("e1", "d_orders"),
      ("e5", "d_all"), ("e5", "d_orders"), ("e5", "d_big")))
  }

  test("fanout envelope: escaped fields, RFC3339 UTC time, sub-second filter boundary") {
    val spark2 = spark
    import spark2.implicits._
    // the filter matches on the envelope the reference builds
    // (entities.go:63-91): id/topic/time/metadata/data, time rendered
    // RFC3339 at SECONDS precision (entities.go:71)
    val dests = Seq(
      // quote in the filter value: only matches if the envelope JSON-escapes
      Destination("d_q", "t1", "webhook", Seq("*"),
        Some("""{"topic":"order\"quoted"}"""), disabled = false),
      // string $gte on time: events at/after 00:00:01Z match; an event at
      // 00:00:00.900 truncates to ...T00:00:00Z and must NOT match
      Destination("d_t", "t1", "webhook", Seq("*"),
        Some("""{"time":{"$gte":"2024-01-01T00:00:01Z"}}"""), disabled = false),
      Destination("d_m", "t1", "webhook", Seq("*"),
        Some("""{"metadata":{"src":"api"}}"""), disabled = false))
    val events = Seq(
      ("eq", "t1", "order\"quoted", true, new Timestamp(1704067200900L),
        Map.empty[String, String], """{}"""),
      ("et", "t1", "plain.topic", true, ts(1),
        Map("src" -> "api"), """{}"""))
      .toDF("event_id", "tenant_id", "topic", "eligible_for_retry", "event_time", "metadata", "data")
    val got = Pipeline.matchFanout(spark, events, dests.toDS())
      .select("event_id", "destination_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("eq", "d_q"), ("et", "d_t"), ("et", "d_m")))
  }

  test("kafka sink: record shape (key from partition template, headers, spool)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kafka_spool").toString
    val sink = graft.streaming.Sinks.KafkaSink(
      topic = "out-topic", partitionKeyTemplate = "order.id",
      spoolDir = s"$dir/records")
    val tasks = Seq(
      ("e1", "t1", "d_orders", 1, false, ts(0), "order.created",
        """{"order":{"id":"o-77"}}""", Map("m" -> "1"), true, "kafka"),
      ("e2", "t1", "d_orders", 1, false, ts(1), "order.created",
        """{"order":{}}""", Map.empty[String, String], true, "kafka"))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    val attempts = sink.publish(tasks)
    assert(attempts.filter(col("status") === "success").count() == 2)
    val recs = spark.read.parquet(s"$dir/records")
      .select(col("key").cast("string"), col("topic"),
        element_at(col("headers"), "content-type").as("ct"),
        element_at(col("headers"), "m").as("m"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(recs == Set(
      ("o-77", "out-topic", "application/json", "1"),
      ("e2", "out-topic", "application/json", null))) // fallback key = event id
  }

  test("object-store sink: one object per delivery at the templated key") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("s3_sink").toString
    val sink = graft.streaming.Sinks.ObjectStoreSink(dir,
      keyTemplate = "{time.date}/{metadata.region}/{event_id}.json")
    val tasks = Seq(
      ("e1", "t1", "d_s3", 1, false, ts(0), "order.created",
        """{"a":1}""", Map("region" -> "eu"), true, "s3"))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    val attempts = sink.publish(tasks)
    assert(attempts.head().getAs[String]("status") == "success")
    val f = new java.io.File(dir, "2024-01-01/eu/e1.json")
    assert(f.exists, s"object missing at ${f.getPath}")
    assert(scala.io.Source.fromFile(f).mkString == """{"a":1}""")
    // a metadata value trying to escape the root is refused
    val evil = Seq(("e9", "t1", "d_s3", 1, false, ts(0), "order.created",
      """{}""", Map("region" -> "../../escape"), true, "s3"))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    val err = intercept[org.apache.spark.SparkException] { sink.publish(evil).count() }
    assert(err.getMessage.contains("escapes the sink root") ||
      Option(err.getCause).exists(_.getMessage.contains("escapes the sink root")))
  }

  test("registry routes one mixed batch across all ten provider sink types") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("registry_route").toString
    val hdToken = java.util.Base64.getEncoder.encodeToString("src_r:k".getBytes("UTF-8"))
    val registry = new graft.streaming.Sinks.Registry(Seq(
      graft.streaming.Sinks.FileWebhookSink(s"$tmp/webhook", "sec"),
      graft.streaming.Sinks.FileWebhookSink(s"$tmp/webhook_std", "sec",
        contentTemplate = graft.streaming.Signatures.StandardWebhooks.ContentTemplate,
        destType = "webhook_standard"),
      graft.streaming.Sinks.KafkaSink("t-out", spoolDir = s"$tmp/kafka"),
      graft.streaming.Sinks.ObjectStoreSink(s"$tmp/s3"),
      graft.streaming.Sinks.SqsSink("https://sqs/q", s"$tmp/sqs"),
      graft.streaming.Sinks.KinesisSink("st1", s"$tmp/kinesis"),
      graft.streaming.Sinks.PubSubSink("top", s"$tmp/pubsub"),
      graft.streaming.Sinks.RabbitMqSink("ex", s"$tmp/rabbit"),
      graft.streaming.Sinks.ServiceBusSink("q", s"$tmp/sbus"),
      graft.streaming.Sinks.HookdeckSink(hdToken, s"$tmp/hookdeck"),
      graft.streaming.Sinks.MockSink("mock")))
    val allTypes = Seq("webhook", "webhook_standard", "kafka", "s3", "aws_sqs",
      "aws_kinesis", "gcp_pubsub", "rabbitmq", "azure_servicebus", "hookdeck", "mock")
    val batch = allTypes.zipWithIndex.map { case (t, i) =>
      (s"e$i", "t1", s"d_$i", 1, false, ts(i), "a.b", s"""{"p":$i}""",
        Map.empty[String, String], true, t)
    }.toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
      "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    val outcomes = registry.deliver(batch)
    val byType = outcomes.collect()
      .map(r => r.getAs[String]("destination_type") -> r.getAs[String]("status")).toMap
    assert(byType.keySet == allTypes.toSet)
    assert(byType.values.forall(_ == "success"))
    // each spool transport left its artifact
    Seq("kafka", "sqs", "kinesis", "pubsub", "rabbit", "sbus", "hookdeck").foreach { d =>
      assert(spark.read.parquet(s"$tmp/$d").count() == 1, d)
    }
    assert(new java.io.File(s"$tmp/webhook").exists)
    assert(Option(new java.io.File(s"$tmp/s3").listFiles()).exists(_.nonEmpty))
  }

  test("deliver() materializes the micro-batch once regardless of sink-type count") {
    val spark2 = spark
    import spark2.implicits._
    val acc = spark.sparkContext.longAccumulator("batch_materializations")
    val rows = (0 until 100).map(i =>
      (s"e$i", "t1", s"d$i", 1, false, ts(i), "a.b", s"""{"p":$i}""",
        Map.empty[String, String], true, Seq("m1", "m2", "m3")(i % 3)))
    val rdd = spark.sparkContext.parallelize(rows, 4).map { r => acc.add(1); r }
    val batch = spark2.createDataFrame(rdd).toDF(
      "event_id", "tenant_id", "destination_id", "attempt", "manual",
      "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    val registry = new graft.streaming.Sinks.Registry(Seq(
      graft.streaming.Sinks.MockSink("m1"),
      graft.streaming.Sinks.MockSink("m2"),
      graft.streaming.Sinks.MockSink("m3")))
    val outcomes = registry.deliver(batch)
    assert(outcomes.count() == 100)
    // un-persisted, the type probe + 3 publishes would re-read the source
    // 4 times (400 adds); the persisted pass reads it exactly once
    assert(acc.value == 100L, s"micro-batch recomputed: ${acc.value} materializations")
  }

  test("log sink is replay-idempotent: same micro-batch applied twice = identical state") {
    val spark2 = spark
    import spark2.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft_replay").toString
    def mkBatch(ids: Seq[String]) = ids.map(i =>
      (s"att_$i", s"e_$i", "t1", "d1", "webhook", 1, false, "success", ts(5), "200"))
      .toDF("attempt_id", "event_id", "tenant_id", "destination_id",
        "destination_type", "attempt_number", "manual", "status",
        "attempt_time", "code")
    val b7 = mkBatch(Seq("a", "b", "c"))
    Pipeline.logSinkBatch(b7, path, batchId = 7L)
    val once = spark.read.parquet(path).orderBy("attempt_id").collect().toSeq
    // checkpoint-failure replay: the SAME epoch arrives again — must no-op
    Pipeline.logSinkBatch(b7, path, batchId = 7L)
    val twice = spark.read.parquet(path).orderBy("attempt_id").collect().toSeq
    assert(twice == once, "replayed micro-batch changed table state")
    assert(spark.read.parquet(path).count() == 3)
    // a NEW epoch still appends
    Pipeline.logSinkBatch(mkBatch(Seq("d")), path, batchId = 8L)
    assert(spark.read.parquet(path).count() == 4)
  }

  test("commit-log sink: replay token is atomic with data visibility") {
    val spark2 = spark
    import spark2.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft_cltx_sink").toString
    def mkBatch(ids: Seq[String]) = ids.map(i =>
      (s"att_$i", s"e_$i", "t1", "d1", "webhook", 1, false, "success", ts(5), "200"))
      .toDF("attempt_id", "event_id", "tenant_id", "destination_id",
        "destination_type", "attempt_number", "manual", "status",
        "attempt_time", "code")
    val b7 = mkBatch(Seq("a", "b", "c"))
    Pipeline.logSinkBatchTx(b7, table, batchId = 7L)
    val v1 = graft.operators.CommitLog.snapshot(table)
    // same epoch replayed: no new version, no new files, same rows
    Pipeline.logSinkBatchTx(b7, table, batchId = 7L)
    val v2 = graft.operators.CommitLog.snapshot(table)
    assert(v2.version == v1.version && v2.files == v1.files,
      "replayed epoch must be a no-op in the log itself")
    assert(graft.operators.CommitLog.scan(spark, table).count() == 3)
    // a new epoch appends; compaction can run against the same table
    Pipeline.logSinkBatchTx(mkBatch(Seq("d")), table, batchId = 8L)
    graft.operators.CommitLog.compactMonth(spark, table,
      v1.files.head.month, "attempt_id", "attempt_time")
    assert(graft.operators.CommitLog.scan(spark, table).count() == 4)
  }

  test("hot destination: salted repartition bounds single-task skew") {
    val spark2 = spark
    import spark2.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_salt").toString
    // 90%-tenant scenario: one destination receives the whole batch
    val tasks = (0 until 800).map(i =>
      (s"e$i", "t1", "d_hot", 1, false, ts(i), "a.b", s"""{"p":$i}""",
        Map.empty[String, String], true, "webhook"))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    // AQE's size-based coalescing re-merges these tiny test partitions (at
    // real scale it only merges SMALL ones — a hot destination's salt groups
    // stay split); disable it here to observe the salt structure itself
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey, "true")
    try {
      spark.conf.set(coalesceKey, "false")
      graft.streaming.Sinks.FileWebhookSink(root, "sec", saltBuckets = 8)
        .publish(tasks).collect()
    } finally spark.conf.set(coalesceKey, prev)
    // salt spreads the hot destination across tasks: >1 output file in its dir
    val files = Option(new java.io.File(s"$root/destination_id=d_hot").listFiles())
      .map(_.count(_.getName.startsWith("part-"))).getOrElse(0)
    assert(files > 1, s"hot destination written by a single task ($files files)")
    // and the payload count survives the salting
    assert(spark.read.text(s"$root/destination_id=d_hot").count() == 800)
  }

  test("validateAndDefault: ids/time/eligibility defaulted, non-object data dropped") {
    val spark2 = spark
    import spark2.implicits._
    val raw = Seq(
      """{"tenant_id":"t1","topic":"a.b","data":{"x":1}}""",
      """{"tenant_id":"t1","topic":"a.b","data":"not-an-object"}""",
      """{"topic":"missing.tenant","data":{}}""").toDF("value")
    val out = Pipeline.validateAndDefault(raw).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("event_id") != null)
    assert(r.getAs[Timestamp]("event_time") != null)
    assert(r.getAs[Boolean]("eligible_for_retry"))
    // configured topic list: unknown topics drop, "*" passes
    // (eventhandler.go:71-76 ErrInvalidTopic)
    val raw2 = Seq(
      """{"tenant_id":"t1","topic":"a.b","data":{}}""",
      """{"tenant_id":"t1","topic":"z.z","data":{}}""",
      """{"tenant_id":"t1","topic":"*","data":{}}""").toDF("value")
    val topics = Pipeline.validateAndDefault(raw2,
        availableTopics = Seq("a.b", "c.d"))
      .select("topic").collect().map(_.getString(0)).toSet
    assert(topics == Set("a.b", "*"))
  }

  test("alert evaluator: threshold crossings, reset on success, idempotent redelivery") {
    val cfg = Alerts.Config(autoDisableCount = 10, thresholds = Seq(50, 100), maxRetries = 3)
    def att(id: String, n: Int, status: String, t: Long) =
      Attempt(id, "e1", "t1", "d1", "webhook", n, manual = false, status, ts(t), "500")
    val key = ("t1", "d1")
    val st0 = Alerts.AlertState(Set.empty, exhaustedSignalled = false)

    // 5 distinct failures → 50% alert at exactly 5
    val (st1, a1) = Alerts.evaluate(cfg, key, (1 to 5).map(i => att(s"a$i", 1, "failed", i)), st0)
    assert(a1.map(_.kind) == Seq("consecutive_failure"))
    assert(a1.head.failure_count == 5 && a1.head.threshold_pct == 50)

    // redelivery of the same attempt ids → no new alert (set semantics)
    val (st2, a2) = Alerts.evaluate(cfg, key, (1 to 5).map(i => att(s"a$i", 1, "failed", i)), st1)
    assert(a2.isEmpty && st2.failingAttemptIds.size == 5)

    // 5 more → 100% = disable
    val (st3, a3) = Alerts.evaluate(cfg, key, (6 to 10).map(i => att(s"a$i", 1, "failed", i)), st2)
    assert(a3.map(_.kind) == Seq("destination_disabled"))

    // success resets
    val (st4, a4) = Alerts.evaluate(cfg, key, Seq(att("ok", 1, "success", 11)), st3)
    assert(a4.isEmpty && st4.failingAttemptIds.isEmpty)

    // exhaustion fires once
    val (st5, a5) = Alerts.evaluate(cfg, key,
      Seq(att("x1", 4, "failed", 12), att("x2", 5, "failed", 13)), st4)
    assert(a5.count(_.kind == "retries_exhausted") == 1)
    assert(st5.exhaustedSignalled)
  }

  test("alert evaluator end-to-end over a stream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val cfg = Alerts.Config(autoDisableCount = 4, thresholds = Seq(50, 100), maxRetries = 99)
    val mem = MemoryStream[Attempt]
    val alerts = Alerts.evaluateStream(spark, mem.toDS(), cfg)
    val q = alerts.writeStream.format("memory").queryName("alerts_out")
      .outputMode("append").start()
    try {
      mem.addData((1 to 2).map(i =>
        Attempt(s"f$i", "e1", "t1", "d9", "webhook", 1, false, "failed", ts(i), "500")))
      q.processAllAvailable()
      mem.addData((3 to 4).map(i =>
        Attempt(s"f$i", "e1", "t1", "d9", "webhook", 1, false, "failed", ts(i), "500")))
      q.processAllAvailable()
      val got = spark.sql("SELECT kind, failure_count FROM alerts_out ORDER BY failure_count")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(got == Seq(("consecutive_failure", 2), ("destination_disabled", 4)))
    } finally q.stop()
  }

  test("retry transition: schedule, cancel-on-success, manual override, exhaustion") {
    val b = Backoff(baseMillis = 1000, factor = 2, maxRetries = 3)
    def out(n: Int, status: String, manual: Boolean = false, t: Long = 0) =
      Retry.Outcome("e1", "t1", "d1", n, status, eligible_for_retry = true,
        manual, ts(0), "top", "{}", Map.empty, ts(t))

    // failure schedules retry #2 after base backoff
    val (st1, due1) = Retry.transition(b, None, Seq(out(1, "failed", t = 10)), ts(10).getTime)
    assert(due1.isEmpty && st1.isDefined)
    assert(st1.get.task.attempt == 2)
    assert(st1.get.fireAtMillis == ts(10).getTime + 1000)

    // timer past fire time → task due, state cleared
    val (st2, due2) = Retry.transition(b, st1, Nil, st1.get.fireAtMillis + 1)
    assert(st2.isEmpty && due2.map(_.attempt) == Seq(2))

    // success cancels pending
    val (st3, due3) = Retry.transition(b, st1, Seq(out(2, "success", t = 11)), ts(11).getTime)
    assert(st3.isEmpty && due3.isEmpty)

    // manual retry replaces pending and is immediately due
    val (st4, due4) = Retry.transition(b, st1, Seq(out(2, "failed", manual = true, t = 12)), ts(12).getTime)
    assert(st4.isEmpty && due4.map(t => (t.attempt, t.manual)) == Seq((3, true)))

    // exhausted: attempt 4 would exceed maxRetries=3 → nothing scheduled
    val (st5, due5) = Retry.transition(b, None, Seq(out(3, "failed", t = 13)), ts(13).getTime)
    assert(st5.isEmpty && due5.isEmpty)

    // backoff growth
    assert(b.delayMillis(1) == 1000 && b.delayMillis(2) == 2000 && b.delayMillis(3) == 4000)
  }

  test("retry stream: future fire-at waits for the timer, then emits") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val mem = MemoryStream[Retry.Outcome]
    val due = Retry.scheduleStream(spark, mem.toDS(),
      Backoff(baseMillis = 2500, factor = 2, maxRetries = 5))
    // NOTE: never processAllAvailable() here — a processing-time-timer
    // stateful op always "requires another batch", so it would never latch;
    // the query self-drives and we poll observable output instead.
    val q = due.writeStream.format("memory").queryName("retry_due")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      val t0 = System.currentTimeMillis()
      val now = new Timestamp(t0)
      mem.addData(Retry.Outcome("eT", "t1", "dT", 1, "failed",
        eligible_for_retry = true, manual = false, now, "top", "{}", Map.empty, now))
      def fired(): Long = spark.sql("SELECT * FROM retry_due WHERE event_id='eT'").count()
      // poll until emission (deadline 30s)
      val deadline = t0 + 30000
      while (fired() == 0 && System.currentTimeMillis() < deadline) Thread.sleep(200)
      val elapsed = System.currentTimeMillis() - t0
      assert(fired() == 1, "timer-driven retry task must be emitted")
      assert(elapsed >= 2500, s"fired after ${elapsed}ms — before the backoff elapsed")
      val task = spark.sql("SELECT attempt, manual FROM retry_due WHERE event_id='eT'").head()
      assert(task.getInt(0) == 2 && !task.getBoolean(1))
    } finally q.stop()
  }

  test("log sink batch: dedup by attempt_id, month partitioning") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_log").toString
    val batch = Seq(
      Attempt("a1", "e1", "t1", "d1", "webhook", 1, false, "failed", ts(0), "500"),
      Attempt("a1", "e1", "t1", "d1", "webhook", 1, false, "success", ts(1), "200"),
      Attempt("a2", "e2", "t1", "d1", "webhook", 1, false, "success", ts(2), "200"))
      .toDF()
    Pipeline.logSinkBatch(batch, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(back.columns.contains("month"))
  }

  test("streaming curation: watermark-bounded dedup, quality gate, pii scrub, state eviction") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val curated = graft.streaming.CurationStream.curate(
      mem.toDF().toDF("doc_id", "event_time", "text"), watermark = "10 minutes")
    val q = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      val t0 = 1704067200000L
      val good = "the quick brown fox jumps over the lazy dog " * 12
      val withPii = (good + "contact me at alice@example.com for the data " * 4).trim
      mem.addData(
        ("d1", new Timestamp(t0), good.trim),
        ("d2", new Timestamp(t0 + 1000), good.trim), // exact dup, collapses
        ("d3", new Timestamp(t0 + 2000), "x"),       // fails the quality gate
        ("d4", new Timestamp(t0 + 3000), withPii))
      q.processAllAvailable()
      val ids = spark.sql("SELECT doc_id FROM curated")
        .collect().map(_.getString(0)).toSet
      assert(ids == Set("d1", "d4"), ids.toString)
      val scrubbed = spark.sql("SELECT text FROM curated WHERE doc_id='d4'")
        .head().getString(0)
      assert(scrubbed.contains("<EMAIL>") && !scrubbed.contains("alice@example.com"))

      // watermark eviction bounds the dedup state: once it passes the
      // first sighting, the same content is admitted again
      mem.addData(("wm", new Timestamp(t0 + 3600000L), good.trim + " advance the clock"))
      q.processAllAvailable()
      mem.addData(("d5", new Timestamp(t0 + 7200000L), good.trim))
      q.processAllAvailable()
      val again = spark.sql("SELECT doc_id FROM curated")
        .collect().map(_.getString(0)).toSet
      assert(again.contains("d5"),
        s"re-sighting after watermark eviction should re-admit, got $again")
    } finally q.stop()
  }

  test("streaming fuzzy intake: MinHash ledger drops cross-micro-batch variants; replayed batch is a no-op") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_fuzzy_intake")
    val (corpus, ledger, ckpt) = (s"$base/corpus", s"$base/ledger", s"$base/ckpt")
    val ts19 = (1 to 19).map(i => s"t$i")
    val doc = (ts19 :+ "u").mkString(" ")        // batch-1 original
    val variant = (ts19 :+ "v").mkString(" ")    // J = 19/21 ≈ 0.905
    val fresh = "completely different content with no shared vocabulary anywhere"

    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = graft.streaming.CurationStream.fuzzyIntake(
      mem.toDF().toDF("doc_id", "event_time", "text"), corpus, ledger, ckpt)
    try {
      val t0 = 1704067200000L
      mem.addData((1L, new Timestamp(t0), doc), (2L, new Timestamp(t0 + 1000), fresh))
      q.processAllAvailable()
      // second micro-batch: a near-dup VARIANT (not exact) and a new doc
      mem.addData((10L, new Timestamp(t0 + 2000), variant),
        (11L, new Timestamp(t0 + 3000), "wholly novel words never met before"))
      q.processAllAvailable()
      val verdicts = graft.operators.CommitLog.scan(spark, corpus)
        .select("doc_id", "kept").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(verdicts == Map(1L -> true, 2L -> true, 10L -> false, 11L -> true),
        verdicts.toString)

      // direct replay of micro-batch 1 (crash-recovery path): tokens make
      // both commits no-ops — same verdict rows, same ledger size
      val before = (graft.operators.CommitLog.scan(spark, corpus).count(),
        graft.operators.CommitLog.scan(spark, ledger).count())
      graft.streaming.CurationStream.fuzzyIntakeBatch(
        Seq((10L, new Timestamp(t0 + 2000), variant),
          (11L, new Timestamp(t0 + 3000), "wholly novel words never met before"))
          .toDF("doc_id", "event_time", "text"),
        batchId = 1L, corpus, ledger, "event_time", "doc_id", "text", 0.8)
      val after = (graft.operators.CommitLog.scan(spark, corpus).count(),
        graft.operators.CommitLog.scan(spark, ledger).count())
      assert(before == after, s"$before -> $after")
    } finally q.stop()
  }

  test("streaming embedding intake: bucket ledger drops cross-micro-batch near-dups; replay is a no-op") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark2.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_emb_intake")
    val (corpus, ledger, ckpt) = (s"$base/corpus", s"$base/ledger", s"$base/ckpt")
    def dir(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array.tabulate(64)(j =>
        if (j == 0) math.cos(r).toFloat else if (j == 1) math.sin(r).toFloat else 0f)
    }
    val ortho = Array.tabulate(64)(j => if (j == 5) 1f else 0f)

    val mem = MemoryStream[(Long, Timestamp)]
    // MemoryStream can't encode float arrays in a tuple column cleanly
    // everywhere, so attach the vector by id inside the stream transform
    val vecOf = Map(1L -> dir(0), 2L -> ortho, 10L -> dir(18),
      11L -> Array.tabulate(64)(j => if (j == 7) 1f else 0f))
    val toVec = udf((id: Long) => vecOf(id))
    val q = graft.streaming.CurationStream.embeddingIntake(
      mem.toDF().toDF("vec_id", "event_time")
        .withColumn("embedding", toVec(col("vec_id"))),
      corpus, ledger, ckpt, threshold = 0.9)
    try {
      val t0 = 1704067200000L
      mem.addData((1L, new Timestamp(t0)), (2L, new Timestamp(t0 + 1000)))
      q.processAllAvailable()
      // batch 2: vec 10 is cos 18 deg off vec 1 (0.951 >= 0.9 -> dropped
      // via the ledger); vec 11 is orthogonal to everything -> kept
      mem.addData((10L, new Timestamp(t0 + 2000)), (11L, new Timestamp(t0 + 3000)))
      q.processAllAvailable()
      val verdicts = graft.operators.CommitLog.scan(spark, corpus)
        .select("vec_id", "kept").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(verdicts == Map(1L -> true, 2L -> true, 10L -> false, 11L -> true),
        verdicts.toString)

      // crash-recovery replay of micro-batch 1: both tokens no-op
      val before = (graft.operators.CommitLog.scan(spark, corpus).count(),
        graft.operators.CommitLog.scan(spark, ledger).count())
      graft.streaming.CurationStream.embeddingIntakeBatch(
        Seq((10L, new Timestamp(t0 + 2000), vecOf(10L)),
          (11L, new Timestamp(t0 + 3000), vecOf(11L)))
          .toDF("vec_id", "event_time", "embedding"),
        batchId = 1L, corpus, ledger, "event_time", "vec_id", "embedding", 0.9)
      val after = (graft.operators.CommitLog.scan(spark, corpus).count(),
        graft.operators.CommitLog.scan(spark, ledger).count())
      assert(before == after, s"$before -> $after")
    } finally q.stop()
  }
}
