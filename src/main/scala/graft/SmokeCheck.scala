package graft
import org.apache.spark.sql.SparkSession
object SmokeCheck {
  def main(args: Array[String]): Unit = {
    // deliberately minimal session — mimics whatever the driver builds
    val spark = graft.core.FastFs.install(SparkSession.builder()).master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE rows=$n")
    spark.stop()
  }
}
