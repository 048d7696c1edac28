package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Generic scratch profiler for any SparkEntry gate query: runs the query
  * once (warm) then once timed with a job/stage listener, printing per-job
  * wall times and slow stages. Measurement tooling only — not part of the
  * shipped surface. Usage: runMain graft.tools.ProfQ <query> [query ...] */
object ProfQ {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfQ <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master(s"local[$cpus]").appName("prof-q")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // scratch A/B lever: SPARK_GRAFT_PROF_CONF="k=v;k2=v2" applies session
    // confs before the run (e.g. codegen toggles), measurement-only
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Long, String)]()
    @volatile var printStages = false
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
        if (printStages && dur > 0.15)
          println(f"[stage] ${si.stageId}%4d $dur%6.2f s tasks=${si.numTasks}%4d  ${si.name.take(120)}")
      }
    })

    args.foreach { name =>
      val q = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      def run(): Unit =
        q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(s"\n===== $name (warmup) =====")
      run(); spark.catalog.clearCache()
      done.clear(); jobs.clear()
      System.gc(); Thread.sleep(300)
      printStages = true
      println(s"===== $name (timed) =====")
      val t0 = System.nanoTime()
      run()
      val dt = (System.nanoTime() - t0) / 1e9
      printStages = false
      spark.catalog.clearCache()
      Thread.sleep(400)
      import scala.jdk.CollectionConverters._
      val all = done.asScala.toSeq.sortBy(_._1)
      println(f"[prof] $name TOTAL: $dt%.2f s  jobs=${all.size}  sum-job-wall=${all.map(_._2).sum / 1e9}%.2f s")
      all.foreach { case (id, ns, d) =>
        if (ns / 1e9 > 0.05)
          println(f"[prof] job $id%4d ${ns / 1e9}%6.2f s  ${d.take(140)}")
      }
    }
    spark.stop()
  }
}
