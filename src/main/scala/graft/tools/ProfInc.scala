package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Scratch profiler for incremental_minhash_dedup: runs the 4-batch gate
  * once (warm) then once timed with a job listener, printing per-job wall
  * and per-batch phase timings. Not part of the shipped surface. */
object ProfInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master("local[32]").appName("prof-inc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PROF_WSCG", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, d) =>
          done.add((je.jobId, System.nanoTime() - t0, d))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for (a <- si.submissionTime; b <- si.completionTime)
          yield (b - a) / 1000.0).getOrElse(-1.0)
        if (dur > 0.15)
          println(f"[stage] ${si.stageId}%4d $dur%6.2f s tasks=${si.numTasks}%4d  ${si.name.take(120)}")
      }
    })

    def gate(): Unit = {
      val docs = graft.core.Tables.documents(spark, sfDir)
      val ledger = java.nio.file.Files
        .createTempDirectory("graft_prof_lsh").toString + "/ledger"
      val batchOf = expr("CAST(substring(source, 4) AS INT) % 4")
      val t0 = 1704067200000L
      val rt0 = System.nanoTime()
      val out = graft.operators.Dedup.incrementalMinhashReplay(
        (0 until 4).map(b => docs.filter(batchOf === b)), ledger,
        new java.sql.Timestamp(t0), threshold = 0.8,
        tokenPrefix = Some("batch"), portableBanding = true)
      println(f"[prof] replay call: ${(System.nanoTime() - rt0) / 1e9}%.2f s")
      val ft0 = System.nanoTime()
      out.write.format("noop").mode("overwrite").save()
      println(f"[prof] final noop write: ${(System.nanoTime() - ft0) / 1e9}%.2f s")
    }

    // warmup
    gate(); spark.catalog.clearCache()
    done.clear(); jobs.clear()
    System.gc(); Thread.sleep(300)
    val t0 = System.nanoTime()
    gate()
    println(f"[prof] TOTAL timed: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    Thread.sleep(500)
    import scala.jdk.CollectionConverters._
    val all = done.asScala.toSeq.sortBy(_._1)
    println(f"[prof] jobs: ${all.size}, sum job wall: ${all.map(_._2).sum / 1e9}%.2f s")
    all.foreach { case (id, ns, d) =>
      if (ns / 1e9 > 0.05) println(f"[prof] job $id%3d ${ns / 1e9}%6.2f s  ${d.take(140)}")
    }
    spark.stop()
  }
}
