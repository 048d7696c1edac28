package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All timestamp handling assumes session timezone UTC. `events.ts` is stored
  * as nanosecond-precision parquet; we normalize to Spark's microsecond
  * `TimestampType` eagerly so every downstream comparison/bucketing op sees a
  * single well-defined type.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Events with `ts` coerced to TimestampType (UTC instant semantics).
    *
    * The driver writes `ts` as parquet TIMESTAMP(NANOS), which Spark rejects
    * unless `nanosAsLong` is on; we read it as epoch-nanos LONG and truncate
    * to µs with integer division (matches DuckDB's `::TIMESTAMP` cast). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    val ts = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts").cast("timestamp")
    }
    df.withColumn("ts", ts)
  }
}
