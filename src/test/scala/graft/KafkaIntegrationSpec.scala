package graft

import java.sql.Timestamp
import graft.streaming.Sinks
import org.apache.spark.sql.functions._

/** Real-broker integration for the Kafka delivery sink (VERDICT r7 task
  * #4; reference `destregistry/providers/destkafka/destkafka.go:209-258`):
  * produce through `KafkaSink`'s real `format("kafka")` path, consume the
  * topic back through the connector, and assert the exact record shape
  * the renderer contract pins (key from the partition-key template,
  * value = raw payload bytes, headers = delivery metadata + content-type).
  *
  * SKIPS CLEANLY (canceled, not failed) when the environment cannot run
  * it — both conditions are external dependencies this zero-egress
  * container does not ship:
  *   - the `spark-sql-kafka-0-10` connector (plus kafka-clients) on the
  *     classpath, and
  *   - a reachable broker, via `GRAFT_KAFKA_BOOTSTRAP=host:port`
  *     (an integration environment runs a single-node KRaft broker and
  *     exports the address).
  * The renderer path (spool formats) stays covered unconditionally by
  * `SinkRenderersSpec`.
  */
class KafkaIntegrationSpec extends GraftSuite {

  private def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
      true
    } catch { case _: Throwable => false }

  test("KafkaSink produce → consume round-trip pins the wire record shape " +
      "(skips without spark-sql-kafka + GRAFT_KAFKA_BOOTSTRAP)") {
    assume(connectorPresent,
      "spark-sql-kafka-0-10 / kafka-clients not on the classpath " +
        "(this container is zero-egress; run in an integration env)")
    val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
    assume(bootstrap.isDefined,
      "no broker configured: export GRAFT_KAFKA_BOOTSTRAP=host:port " +
        "(single-node KRaft is sufficient)")
    val bs = bootstrap.get
    val spark2 = spark
    import spark2.implicits._

    val topic = s"graft-it-${System.nanoTime()}"
    val tasks = Seq(
      ("e1", "t1", "d1", 1, false, new Timestamp(1704067200000L),
        "order.created", """{"user":"u7","n":1}""",
        Map("trace" -> "abc"), true))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry")

    val sink = Sinks.KafkaSink(topic,
      partitionKeyTemplate = "user",
      outputFormat = "kafka",
      outputOptions = Map("kafka.bootstrap.servers" -> bs))
    val outcomes = sink.publish(tasks).collect()
    assert(outcomes.length == 1 &&
      outcomes.head.getAs[String]("status") == "success")

    val rec = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bs)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .option("includeHeaders", "true")
      .load()
      .selectExpr("CAST(key AS STRING) AS key",
        "CAST(value AS STRING) AS value",
        "transform(headers, h -> struct(h.key as key, CAST(h.value AS STRING) as value)) AS hdrs")
      .head()
    // key: the JMESPath partition-key template over the payload
    // (partitionkey.go:11-40; event-id fallback when the path misses)
    assert(rec.getAs[String]("key") == "u7")
    // value: the RAW payload bytes, byte-for-byte (no re-encoding)
    assert(rec.getAs[String]("value") == """{"user":"u7","n":1}""")
    // headers: delivery metadata + the fixed content-type
    val hdrs = rec.getSeq[org.apache.spark.sql.Row](2)
      .map(h => h.getString(0) -> h.getString(1)).toMap
    assert(hdrs.get("content-type").contains("application/json"))
    assert(hdrs.get("trace").contains("abc"))
  }
}
