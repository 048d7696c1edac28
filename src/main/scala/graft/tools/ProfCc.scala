package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for the dedup_clusters pipeline: times each
  * phase of jaccardPairs + connectedComponents separately (labelled
  * jobs). Measurement tooling only — not part of the shipped surface. */
object ProfCc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master(s"local[$cpus]").appName("prof-cc")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    // warmup whole query once
    graft.SparkEntry.queries("dedup_clusters")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    System.gc(); Thread.sleep(300)

    val docs = graft.core.Tables.documents(spark, sfDir)
    val t0 = System.nanoTime()
    val pairs = timed("jaccardPairs plan+verify") {
      val p = graft.operators.Dedup.jaccardPairs(docs, threshold = 0.8)
      p.write.format("noop").mode("overwrite").save()
      p
    }
    val comp = timed("connectedComponents") {
      val c = graft.operators.Dedup.connectedComponents(pairs)
      c.write.format("noop").mode("overwrite").save()
      c
    }
    println(f"[phase] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // second pass: inside jaccardPairs, time candidate-gen sub-phases
    spark.catalog.clearCache()
    System.gc(); Thread.sleep(300)
    val toks = timed("tokenSets persist+count") {
      val t = graft.operators.Dedup.jaccardCandidates(docs, 0.8)
      t // lazy; count below in candidates
    }
    timed("candidates materialize") {
      toks.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
