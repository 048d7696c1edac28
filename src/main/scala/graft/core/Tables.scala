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
    * to µs with integer division (matches DuckDB's `::TIMESTAMP` cast).
    *
    * The raw nanos survive as `ts_ns`: a range predicate on the CONVERTED
    * column sits above a projection and never reaches the parquet scan, so
    * time filters must go through [[tsRangeNs]], which is an exact
    * equivalent (floor(ns/1000) ≥ Xµs ⟺ ns ≥ X·1000) and pushes into
    * row-group skipping — the difference between scanning a month and
    * scanning everything at 100 TB. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        df.withColumn("ts_ns", unix_micros(col("ts").cast("timestamp")) * 1000L)
          .withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Pushdown-friendly [start,end) time-range predicate over `ts_ns`,
    * exactly equivalent to `ts >= start && ts < end` on the µs-truncated
    * timestamp column. */
  def tsRangeNs(start: java.time.Instant, end: java.time.Instant): org.apache.spark.sql.Column =
    col("ts_ns") >= lit(start.toEpochMilli * 1000000L) &&
      col("ts_ns") < lit(end.toEpochMilli * 1000000L)
}
