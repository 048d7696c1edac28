package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.api.HttpApi
import graft.core.Tables
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** The operational-metrics export surface (reference `internal/emetrics/`):
  * GET /metrics serves Prometheus text with control-plane counters
  * (published/eligible by topic, API calls + latency by route template)
  * and data-plane families derived from the platform's own stores — the
  * attempt log (delivered by type×status) and the Runner's GK latency
  * rollup (delivery-latency quantiles). Counters are pinned against a
  * known workload; store-derived families against known table contents. */
class EmetricsSpec extends GraftSuite {

  private lazy val client = HttpClient.newHttpClient()

  private def getText(server: HttpApi.Server, path: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${server.port}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  private def post(server: HttpApi.Server, path: String, body: String): Int =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.port}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString()).statusCode()

  private def metricValue(page: String, line: String): Option[Double] =
    page.linesIterator.find(_.startsWith(line + " "))
      .map(_.substring(line.length + 1).trim.toDouble)

  test("GET /metrics: publish counters exact, delivered counts from the " +
      "log, latency quantiles from the GK rollup, API calls by template") {
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_emetrics")
    // attempt log: 7 success + 3 failed mock deliveries
    val logDir = s"$base/log"
    (1 to 10).map(i => (s"att_$i", "mock",
        if (i <= 7) "success" else "failed"))
      .toDF("attempt_id", "destination_type", "status")
      .write.parquet(logDir)
    // latency rollup: values 1..1000 ms at one (destination, hour) grain
    val rollup = s"$base/latrollup"
    Sketches.updateQuantileRollup(
      (1 to 1000).map(i => ("d1", java.sql.Timestamp.valueOf("2024-03-01 10:00:00"),
        i.toDouble)).toDF("destination_id", "bucket_ts", "latency_ms"),
      rollup, Seq("destination_id", "bucket_ts"), "latency_ms",
      java.sql.Timestamp.valueOf("2024-03-01 11:00:00"))

    val destTable = s"$base/destinations"
    val server = HttpApi.start(spark, HttpApi.Config(
      events = Tables.events(spark, sf),
      destTable = destTable,
      storeSecret = "s",
      publishSpool = Some(s"$base/spool"),
      attempts = Some(() => spark.read.parquet(logDir)),
      latencyRollup = Some(rollup)))
    try {
      // unique topics → exact counters even if other suites run concurrently
      assert(post(server, "/api/v1/publish",
        """{"tenant_id":"t1","topic":"emx.alpha","data":{"a":1}}""") == 202)
      assert(post(server, "/api/v1/publish",
        """{"tenant_id":"t1","topic":"emx.alpha","data":{"a":2}}""") == 202)
      assert(post(server, "/api/v1/publish",
        """{"tenant_id":"t1","topic":"emx.beta","data":{"a":3},"eligible_for_retry":false}""") == 202)

      val (code, page) = getText(server, "/metrics")
      assert(code == 200)

      // control-plane counters: exact for this spec's unique topics
      assert(metricValue(page, """graft_published_events_total{topic="emx.alpha"}""").contains(2.0), page)
      assert(metricValue(page, """graft_published_events_total{topic="emx.beta"}""").contains(1.0), page)
      assert(metricValue(page, """graft_eligible_events_total{topic="emx.alpha"}""").contains(2.0), page)
      // ineligible publish must not create an eligible series
      assert(metricValue(page, """graft_eligible_events_total{topic="emx.beta"}""").isEmpty, page)

      // data-plane: delivered counts come from the log table — exact
      assert(metricValue(page, """graft_delivered_events_total{type="mock",status="success"}""").contains(7.0), page)
      assert(metricValue(page, """graft_delivered_events_total{type="mock",status="failed"}""").contains(3.0), page)

      // delivery latency from the GK rollup: eps=0.01 over 1..1000 →
      // p50 within ±10 of 500, p99 within ±10 of 990
      val p50 = metricValue(page, """graft_delivery_latency_ms{quantile="0.5"}""")
      val p99 = metricValue(page, """graft_delivery_latency_ms{quantile="0.99"}""")
      assert(p50.exists(v => math.abs(v - 500) <= 10), s"p50=$p50\n$page")
      assert(p99.exists(v => math.abs(v - 990) <= 10), s"p99=$p99\n$page")
      assert(metricValue(page, "graft_delivery_latency_observations_total").contains(1000.0), page)

      // API accounting by route TEMPLATE (≥: counters are process-global)
      val calls = metricValue(page,
        """graft_api_calls_total{method="POST",path="/api/v1/publish"}""")
      assert(calls.exists(_ >= 3.0), page)
      val latCount = metricValue(page,
        """graft_api_response_latency_ms_count{method="POST",path="/api/v1/publish"}""")
      assert(latCount == calls, page)
      // the scrape route itself must not self-count
      assert(!page.contains("""path="/metrics""""), page)
    } finally server.stop()
  }
}
