package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline query set on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Queries are fully materialized through the noop sink (count() would let
  * Catalyst prune the world). Methodology mirrors the DuckDB side
  * (`scripts/duck_bench.py`: per-query warmup run, then a timed full
  * re-execution): each query gets one untimed warmup pass (JIT, codegen,
  * file listing, OS page cache — the things a steady-state engine has),
  * then the cache manager is CLEARED so the timed pass re-executes the
  * whole query including its own persist materializations — Spark's
  * plan-matching cache reuse would otherwise let a timed run skip work
  * its warmup did, which DuckDB's timed runs cannot. Clearing again after
  * the timed pass keeps 25 queries' accumulated intermediates from
  * evicting each other (the storage pool is shared; cross-query churn
  * measured +3–6 s on the dedup family under the previous
  * warmup-all-then-time-all loop).
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
    "moving_avg_revenue", "dedup_span_removal", "bm25_topk",
    "weighted_sample_topn", "logstore_optimize", "dedup_minhash_lsh_fast",
    "pack_sequences", "incremental_minhash_dedup", "semdedup_kmeans",
    // the embedding ledger (incremental_embedding_dedup) stays a
    // correctness-gate-only op: its cost is 4 sequential commits of
    // mostly fixed job/IO overhead (the minhash ledger above already
    // represents the incremental family here, against a DuckDB oracle
    // that replays comparable work)
    "hybrid_rrf_topk", "mixture_sample_budget",
    // HLL sketch-rollup family: 3 incremental state commits + a replay +
    // the estimate readout — the distinct-count maintenance cycle
    "sketch_distinct_rollup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional args: query names to bench (default: full headline set)
    val wanted: Seq[String] =
      if (args.nonEmpty) args.toSeq else headline
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

    val qs = wanted.filter(SparkEntry.queries.contains)

    def runOne(name: String, dir: String = sfDir): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      catch { case _: Throwable => "" }

    // (steal, idle) seconds accumulated across all CPUs, from /proc/stat —
    // the direct evidence separating "query got slower" from "host stole
    // the CPU while the clock ran".
    def cpuStat(): (Double, Double) =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines().next()
          .trim.split("\\s+").drop(1).map(_.toDouble)
        val hz = 100.0 // USER_HZ
        (f(7) / hz, f(3) / hz)
      } catch { case _: Throwable => (-1.0, -1.0) }

    /** One cold timed pass → (seconds, cpu-steal seconds DURING the pass).
      * The steal delta is the per-run poison detector: a 2026-08-14 full
      * run recorded 873 stolen CPU-seconds — without per-run attribution
      * every number in such an artifact is unusable; with it, each run is
      * individually trustworthy or individually discountable. */
    def timedRun(name: String, dir: String = sfDir): (Double, Double) = {
      spark.catalog.clearCache() // timed pass re-executes everything
      // settle async unpersist/broadcast cleanup + prior query's garbage
      // BEFORE the clock starts, so it isn't charged to this query
      System.gc()
      Thread.sleep(200)
      val (s0, _) = cpuStat()
      val t0 = System.nanoTime()
      val ok = try { runOne(name, dir); true } catch { case _: Throwable => false }
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      val (s1, _) = cpuStat()
      spark.catalog.clearCache() // no cross-query storage-pool churn
      (dt, if (s0 < 0 || s1 < 0) 0.0 else s1 - s0)
    }

    // Every timed pass is kept raw (VERDICT r6 task #1): the artifact
    // carries the full per-run list behind each reported number so a reader
    // sees variance directly instead of inferring it from the median.
    def benchOne(name: String, dir: String): (Double, Seq[(Double, Double)]) = {
      try runOne(name, dir) catch { case _: Throwable => () } // warmup (untimed)
      val first = timedRun(name, dir)
      // multi-second queries carry multi-second GC/AQE/scheduling noise at
      // local[32]; report the MEDIAN of three cold runs (not the min —
      // median is the honest central tendency, and duck_bench.py applies
      // the same rule)
      var runs =
        if (first._1 > 2.0) Seq(first, timedRun(name, dir), timedRun(name, dir))
        else Seq(first)
      // This host steals CPU in bursts (measured: a 9 s query stalling to
      // 134 s with zero other processes; /proc/stat shows episodic steal).
      // A burst can poison two of three runs, so when the spread screams
      // "contention" (max > 4x min) take two more passes — the raw list
      // keeps every run, so widening the sample is visible, not hidden.
      if (runs.size > 1 && runs.map(_._1).max > 4 * runs.map(_._1).min)
        runs = runs ++ Seq(timedRun(name, dir), timedRun(name, dir))
      // steal-aware median: a run that lost > max(0.5 s, 25% of its wall)
      // to the hypervisor is contention-poisoned — median over the clean
      // runs when any exist. Every raw (time, steal) pair stays in the
      // artifact, so the exclusion is auditable, not hidden.
      val clean = runs.filter { case (t, s) => t >= 0 && s <= math.max(0.5, 0.25 * t) }
      val basis = (if (clean.nonEmpty) clean else runs).map(_._1)
      (basis.sorted.apply(basis.size / 2), runs)
    }

    val wallT0 = System.nanoTime()
    val loadBefore = loadavg()
    val (stealT0, idleT0) = cpuStat()

    val full = qs.map { name => name -> benchOne(name, sfDir) }
    val results = full.map { case (n, (med, _)) => n -> med }
    // Scaling evidence (VERDICT r5 task #2): re-time the same queries at
    // the sibling sf0.01 dir so the per-query sf0.01→sf0.1 ratio — the
    // "sub-second queries sit on the local-mode scheduling floor" claim —
    // is auditable from the BENCH artifact itself rather than asserted.
    val smallDir = {
      val p = java.nio.file.Paths.get(sfDir)
      p.resolveSibling("sf0.01").toString
    }
    val smallFull: Seq[(String, (Double, Seq[(Double, Double)]))] =
      if (smallDir != sfDir && java.nio.file.Files.isDirectory(
            java.nio.file.Paths.get(smallDir)))
        qs.map { name => name -> benchOne(name, smallDir) }
      else Seq.empty
    val small = smallFull.map { case (n, (med, _)) => n -> med }

    // Streaming sustained-load numbers ride in the same artifact (VERDICT
    // r5 task #9): two-phase StreamBench at 60k events — throughput, then
    // verification with per-stage p50/p99 and exact attempt accounting.
    // Skipped when benching a query subset (fast iteration) or when
    // SPARK_GRAFT_NO_STREAM is set.
    val streamPart =
      if (args.nonEmpty || sys.env.contains("SPARK_GRAFT_NO_STREAM")) ""
      else {
        val s1 =
          try s""","stream":${StreamBench.run(spark, 60000)}"""
          catch { case e: Throwable => s""","stream_error":"${e.getClass.getSimpleName}""""}
        val s2 =
          try s""","curation":${StreamBench.curationRun(spark, 20000)}"""
          catch { case e: Throwable => s""","curation_error":"${e.getClass.getSimpleName}""""}
        val s3 =
          try s""","vector_intake":${StreamBench.vectorIntakeRun(spark, 10000)}"""
          catch { case e: Throwable => s""","vector_intake_error":"${e.getClass.getSimpleName}""""}
        s1 + s2 + s3
      }

    def toJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    def runsJson(rs: Seq[(String, (Double, Seq[(Double, Double)]))],
                 pick: ((Double, Double)) => Double): String =
      rs.map { case (k, (_, runs)) =>
        "\"" + k + "\":" + runs.map(v => f"${pick(v)}%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val qJson = toJson(results)
    val total = results.map(_._2).filter(_ >= 0).sum
    val smallPart =
      if (small.nonEmpty)
        s""","queries_small":${toJson(small)},"runs_small":${runsJson(smallFull, _._1)}""" +
        s""","runs_small_steal":${runsJson(smallFull, _._2)},"sf_small":"$smallDir""""
      else ""
    val wallSec = (System.nanoTime() - wallT0) / 1e9
    // Load context makes an externally-contended run self-diagnosing: a
    // loadavg far above the 32 cores this JVM uses, or stolen CPU seconds
    // accumulating, means something else was eating the machine while the
    // clock ran.
    val (stealT1, idleT1) = cpuStat()
    val envPart =
      f""","wall_sec":$wallSec%.1f,"cpu_steal_sec":${stealT1 - stealT0}%.1f,"cpu_idle_sec":${idleT1 - idleT0}%.1f,"loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}""""
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"runs":${runsJson(full, _._1)},"runs_steal":${runsJson(full, _._2)},"sf":"$sfDir"$smallPart$streamPart$envPart}"""
    // Stdout can be tail-truncated by a harness (it ate BENCH_r06); the
    // file copy is the durable artifact. Subset runs (fast iteration on
    // named queries) write a sidecar instead, so they can never clobber
    // the committed full-headline artifact.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (args.nonEmpty) "BENCH_partial.json" else "BENCH.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
