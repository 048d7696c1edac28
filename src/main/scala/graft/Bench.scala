package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Queries are fully materialized through the noop sink (count() would let
  * Catalyst prune the world). One untimed warmup pass amortizes JIT +
  * codegen so the numbers measure the plans, not the JVM.
  */
object Bench {

  /** Headline set: one per operator family (scan/agg, join+topk, metrics
    * fill+rate, window, explode, exact+LSH dedup, knn, JSON filter). */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_orders", "scan_project_filter",
    "filter_in_time_range", "json_filter_gte", "json_filter_native",
    "latest_event_per_user", "metrics_count_hourly", "metrics_daily_by_type",
    "sessionize_30min", "explode_tokens", "dedup_jaccard_pairs",
    "dedup_minhash_lsh", "knn_brute_force", "embedding_cosine_pairs",
    "text_token_stats", "asof_click_before_purchase", "range_join_60s",
    "rollup_order_stats", "pivot_event_counts", "top3_per_user",
    "salted_agg_by_type", "dedup_clusters", "q17_small_quantity",
    "moving_avg_revenue")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val qs = headline.filter(SparkEntry.queries.contains)

    def runOne(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup (untimed): JIT, codegen caches, file listing
    qs.foreach(n => try runOne(n) catch { case _: Throwable => () })

    val results = qs.map { name =>
      val t0 = System.nanoTime()
      val ok = try { runOne(name); true } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
