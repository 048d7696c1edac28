package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan for the named gate
  * queries (default: a pushdown-sensitive subset) so scan pruning,
  * PushedFilters, join strategies and WholeStageCodegen spans can be
  * inspected. Usage: runMain graft.Explain [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.FastFs.install(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("scan_project_filter", "filter_in_time_range", "q3_top_orders",
        "topk_orders_by_price", "metrics_count_hourly", "json_filter_gte")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
