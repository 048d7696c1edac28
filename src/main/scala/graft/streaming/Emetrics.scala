package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Operational pipeline metrics — the reference's emetrics surface
  * (`internal/emetrics/emetrics.go:44-135`: otel counters/histograms for
  * published/eligible/delivered events, delivery latency, API calls and
  * response latency) re-expressed Spark-first:
  *
  *  - CONTROL-PLANE counters (events published/eligible by topic, API
  *    calls and response latency by route template) are in-process
  *    [[LongAdder]]s — the same process-local accounting the reference's
  *    otel counters do, exported by scrape instead of push.
  *  - DATA-PLANE metrics are NOT separately accumulated: delivered-event
  *    counts by (destination type, status) are a declarative aggregate
  *    over the attempt log itself, and delivery-latency quantiles read
  *    from the GK sketch rollup the Runner already maintains inside each
  *    micro-batch ([[graft.operators.Sketches]]) — the store of record IS
  *    the metric source, so a scrape can never drift from the log, and at
  *    100 TB the scrape cost is a manifest-pruned aggregate plus a
  *    handful of sketch rows, not a second accounting pipeline.
  *
  * Export format: Prometheus/OpenMetrics text exposition (the standard
  * scrape format), served by `GET /metrics` on
  * [[graft.api.HttpApi]]. Latency is exported summary-style
  * (`_sum`/`_count` per route; quantile gauges for delivery latency).
  */
object Emetrics {

  private val publishedByTopic = new ConcurrentHashMap[String, LongAdder]()
  private val eligibleByTopic = new ConcurrentHashMap[String, LongAdder]()
  private val apiCallsByRoute = new ConcurrentHashMap[(String, String), LongAdder]()
  private val apiLatSumByRoute = new ConcurrentHashMap[(String, String), LongAdder]()

  private def add(m: ConcurrentHashMap[String, LongAdder], k: String, n: Long): Unit =
    m.computeIfAbsent(k, _ => new LongAdder).add(n)

  /** Reference `EventPublished` + `EventEligbible` (emetrics.go:115-123),
    * called by the publish ingest path. */
  def eventPublished(topic: String, eligibleForRetry: Boolean): Unit = {
    add(publishedByTopic, topic, 1L)
    if (eligibleForRetry) add(eligibleByTopic, topic, 1L)
  }

  /** Reference `APICalls` + `APIResponseLatency` (emetrics.go:123-135).
    * `route` must be the TEMPLATE ("/api/v1/{tenant}/events"), never the
    * raw path — label cardinality stays bounded by the route table. */
  def apiCall(method: String, route: String, latencyMs: Long): Unit = {
    val k = (method, route)
    apiCallsByRoute.computeIfAbsent(k, _ => new LongAdder).add(1L)
    apiLatSumByRoute.computeIfAbsent(k, _ => new LongAdder).add(math.max(0L, latencyMs))
  }

  /** Test isolation: counters are process-global by design (one API shell
    * per JVM in a deployment). */
  def reset(): Unit = {
    publishedByTopic.clear(); eligibleByTopic.clear()
    apiCallsByRoute.clear(); apiLatSumByRoute.clear()
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** Render the full scrape page. `attempts` is the live attempt-log
    * thunk (delivered counts aggregate over it); `latencyRollup` the GK
    * rollup table the Runner maintains (delivery-latency quantiles read
    * from sketch state — no attempt scan). Either side being absent
    * simply omits its families, mirroring a deployment without that
    * service wired. */
  def render(spark: SparkSession,
             attempts: Option[() => DataFrame],
             latencyRollup: Option[String]): String = {
    val sb = new StringBuilder
    import scala.jdk.CollectionConverters._

    sb ++= "# TYPE graft_published_events_total counter\n"
    sb ++= "# HELP graft_published_events_total Number of published events\n"
    publishedByTopic.asScala.toSeq.sortBy(_._1).foreach { case (t, n) =>
      sb ++= s"""graft_published_events_total{topic="${esc(t)}"} ${n.sum}\n"""
    }
    sb ++= "# TYPE graft_eligible_events_total counter\n"
    sb ++= "# HELP graft_eligible_events_total Number of retry-eligible published events\n"
    eligibleByTopic.asScala.toSeq.sortBy(_._1).foreach { case (t, n) =>
      sb ++= s"""graft_eligible_events_total{topic="${esc(t)}"} ${n.sum}\n"""
    }
    sb ++= "# TYPE graft_api_calls_total counter\n"
    sb ++= "# HELP graft_api_calls_total Number of API calls\n"
    apiCallsByRoute.asScala.toSeq.sortBy(_._1).foreach { case ((m, p), n) =>
      sb ++= s"""graft_api_calls_total{method="${esc(m)}",path="${esc(p)}"} ${n.sum}\n"""
    }
    sb ++= "# TYPE graft_api_response_latency_ms summary\n"
    sb ++= "# HELP graft_api_response_latency_ms API response latency\n"
    apiLatSumByRoute.asScala.toSeq.sortBy(_._1).foreach { case ((m, p), s) =>
      val c = Option(apiCallsByRoute.get((m, p))).map(_.sum).getOrElse(0L)
      sb ++= s"""graft_api_response_latency_ms_sum{method="${esc(m)}",path="${esc(p)}"} ${s.sum}\n"""
      sb ++= s"""graft_api_response_latency_ms_count{method="${esc(m)}",path="${esc(p)}"} $c\n"""
    }

    attempts.foreach { thunk =>
      try {
        val counts = thunk().groupBy(col("destination_type"), col("status"))
          .count().collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .sortBy(_._1)
        sb ++= "# TYPE graft_delivered_events_total counter\n"
        sb ++= "# HELP graft_delivered_events_total Delivery attempts in the log by destination type and status\n"
        counts.foreach { case ((t, st), n) =>
          sb ++= s"""graft_delivered_events_total{type="${esc(t)}",status="${esc(st)}"} $n\n"""
        }
      } catch { case _: Exception => () } // absent/empty log: omit family
    }

    latencyRollup.foreach { table =>
      try {
        val ps = Seq(0.5, 0.9, 0.99)
        val row = graft.operators.Sketches
          .quantilesAcross(spark, table, Seq.empty, ps).head()
        val qs = row.getSeq[Double](0)
        sb ++= "# TYPE graft_delivery_latency_ms gauge\n"
        sb ++= "# HELP graft_delivery_latency_ms Delivery latency quantiles from the per-micro-batch GK rollup\n"
        ps.zip(qs).foreach { case (p, v) =>
          sb ++= s"""graft_delivery_latency_ms{quantile="$p"} $v\n"""
        }
        sb ++= s"graft_delivery_latency_observations_total ${row.getLong(1)}\n"
      } catch { case _: Exception => () } // rollup not yet written: omit
    }
    sb.result()
  }
}
