package graft.tools

import graft.core.Tables
import graft.operators.Sketches
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch profiler for the sketch_distinct_rollup gate: times each of
  * the four update cycles and the readout separately, with a job listener
  * attributing wall to individual Spark jobs. Not part of the shipped
  * surface. */
object ProfSketch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master("local[32]").appName("prof-sketch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(jobs.get(je.jobId)).foreach(t0 =>
          done.add((je.jobId, System.nanoTime() - t0)))
    })

    def gate(label: String): Unit = {
      done.clear()
      val t00 = System.nanoTime()
      val ev = Tables.events(spark, sfDir).select(
          col("event_id"), col("user_id"), col("event_type"), col("value"),
          expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"))
        .withColumn("ev_month", date_format(col("ts"), "yyyy-MM"))
      val table = java.nio.file.Files
        .createTempDirectory("graft_profsketch").toString + "/rollup"
      val t0 = 1704067200000L
      def phase[A](name: String)(f: => A): A = {
        done.clear()
        val s = System.nanoTime()
        val r = f
        val jw = done.toArray.map { case (_, d: Long) => d / 1000000 }.sum
        println(f"[prof-$label] $name: ${(System.nanoTime() - s) / 1e9}%.3f s " +
          s"jobs=${done.size()} jobWallMs=$jw")
        r
      }
      (0 until 3).foreach { b =>
        phase(s"update$b") {
          Sketches.updateDistinctRollup(
            ev.filter(pmod(col("event_id"), lit(3)) === b), table,
            Seq("ev_month", "event_type"), "user_id",
            new java.sql.Timestamp(t0 + b * 3600000L), token = Some(s"sk-$b"))
        }
      }
      phase("replay") {
        Sketches.updateDistinctRollup(
          ev.filter(pmod(col("event_id"), lit(3)) === 1), table,
          Seq("ev_month", "event_type"), "user_id",
          new java.sql.Timestamp(t0 + 3600000L), token = Some("sk-1"))
      }
      phase("readout") {
        val exact = ev.groupBy("ev_month", "event_type")
          .agg(countDistinct(col("user_id")).as("n_exact"))
        Sketches.estimates(spark, table, Seq("ev_month", "event_type"))
          .join(exact, Seq("ev_month", "event_type"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[prof-$label] TOTAL: ${(System.nanoTime() - t00) / 1e9}%.3f s  " +
        s"jobs=${done.size()} jobWallSumMs=${done.toArray.map { case (_, d: Long) => d / 1000000 }.sum}")
    }
    gate("warm")
    gate("timed")

    // raw cost decomposition
    val ev = Tables.events(spark, sfDir).select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"))
      .withColumn("ev_month", date_format(col("ts"), "yyyy-MM"))
    def t(name: String)(f: => Unit): Unit = {
      val s = System.nanoTime(); f
      println(f"[raw] $name: ${(System.nanoTime() - s) / 1e9}%.3f s")
    }
    t("trivial job")(spark.range(1000).count())
    t("trivial job 2")(spark.range(1000).count())
    for (i <- 1 to 3) t(s"bs agg collect $i")(
      graft.core.Caching.narrowBatchScope(spark) {
        ev.filter(pmod(col("event_id"), lit(3)) === 0)
          .groupBy("ev_month", "event_type")
          .agg(expr("hll_sketch_agg(user_id)")).collect()
      })
    val out = java.nio.file.Files.createTempDirectory("profsk_w").toString
    for (i <- 1 to 2) t(s"bs agg parquet write $i")(
      graft.core.Caching.narrowBatchScope(spark) {
        ev.filter(pmod(col("event_id"), lit(3)) === 0)
          .groupBy("ev_month", "event_type")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
          .withColumn("month", lit("2024-01"))
          .repartition(col("month"))
          .write.mode("overwrite").partitionBy("month").parquet(s"$out/w$i")
      })
    spark.stop()
  }
}
