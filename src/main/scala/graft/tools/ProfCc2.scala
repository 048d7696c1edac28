package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: replicate connectedComponents' loop with partition-count and
  * per-phase prints to find where session-width stages come from.
  * Measurement tooling only. */
object ProfCc2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master(s"local[$cpus]").appName("prof-cc2")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.documents(spark, sfDir)
    val pairs = graft.operators.Dedup.jaccardPairs(docs, threshold = 0.8)

    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc2] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val edges0 = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    val edgeCount = t("edges0.count")(edges0.count())
    println(s"[cc2] edgeCount=$edgeCount edges0.parts=${edges0.rdd.getNumPartitions}")
    graft.core.Caching.widthScope(spark, edgeCount) {
      if (sys.env.contains("SPARK_GRAFT_CC_NOAQE"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      val w = graft.core.Caching.sizedWidth(spark, edgeCount)
      println(s"[cc2] scoped width=$w conf=${spark.conf.get("spark.sql.shuffle.partitions")}")
      val edges = edges0.coalesce(w).cache()
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("component", col("id"))
      var iter = 0
      var converged = false
      while (!converged && iter < 20) {
        val viaNeighbors = edges
          .join(labels.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id"))
          .agg(min(col("component")).as("n_comp"))
        val step = t(s"iter $iter checkpoint") {
          labels.join(viaNeighbors, Seq("id"), "left")
            .select(col("id"), col("component").as("old"),
              least(col("component"), coalesce(col("n_comp"), col("component"))).as("component"))
            .localCheckpoint()
        }
        println(s"[cc2] iter $iter step.parts=${step.rdd.getNumPartitions}")
        converged = t(s"iter $iter isEmpty")(
          step.filter(col("component") =!= col("old")).isEmpty)
        labels = step.select("id", "component")
        iter += 1
      }
      println(s"[cc2] iters=$iter")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
