package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for pagerank_trade (deleted after use). */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.core.FastFs.install(SparkSession.builder())
      .master("local[32]").appName("prprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import graft.core.Tables
    def ms[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    // warm
    (0 until 2).foreach { _ =>
      graft.SparkEntry.queries("pagerank_trade")(s, sfDir).count()
    }
    (0 until 3).foreach { rd =>
      graft.core.Caching.noAqeScope(s) {
        val prevW = s.conf.get("spark.sql.shuffle.partitions", "32")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val pairs = Tables.lineitem(s, sfDir)
            .select(col("l_orderkey"), col("l_suppkey"))
            .join(Tables.orders(s, sfDir).select(col("o_orderkey"), col("o_custkey")),
              col("l_orderkey") === col("o_orderkey"))
            .select((col("o_custkey") * 2L).as("a"),
              (col("l_suppkey") * 2L + 1L).as("b"))
            .distinct()
          val tPairs = ms(pairs.count())
          val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
            .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
          val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
          val e = edges.join(deg, Seq("src"))
          e.persist()
          val tCache = ms(e.count())
          var ranks = deg.select(col("src").as("node"), lit(1.0).as("rank"))
          val tIters = (1 to 3).map { _ =>
            ms {
              ranks = e.join(ranks, col("src") === col("node"))
                .select(col("dst"),
                  round(col("rank") / col("d") * 1e9, 0).cast("long").as("contrib"))
                .groupBy(col("dst"))
                .agg((lit(0.15) + lit(0.85) * (sum(col("contrib")) / lit(1e9)))
                  .as("rank"))
                .withColumnRenamed("dst", "node")
              ranks = ranks.localCheckpoint(true) // materialize THIS iteration
            }
          }
          val tOut = ms {
            ranks.orderBy(col("rank").desc).limit(25).collect()
          }
          e.unpersist(false)
          println(f"round=$rd pairs=$tPairs%.0f cache=$tCache%.0f " +
            f"iters=${tIters.map(t => f"$t%.0f").mkString(",")} out=$tOut%.0f")
        } finally s.conf.set("spark.sql.shuffle.partitions", prevW)
      }
    }
    s.stop()
  }
}
