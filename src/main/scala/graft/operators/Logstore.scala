package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytical log store: append-mostly fact tables on month-partitioned
  * parquet with `(time, id)` sorted runs (reference physical design:
  * ClickHouse `PARTITION BY toYYYYMM(time) ORDER BY (time, id)` —
  * `internal/migrator/migrations/clickhouse/000001_init.up.sql`).
  *
  * Scale rationale:
  *   - month partitions ⇒ every time-ranged query (metrics, lists, keyset
  *     seeks) prunes at the directory level before any IO;
  *   - sort-within-file on (time, id) ⇒ parquet row-group min/max stats act
  *     like the reference's primary index: a keyset seek reads ~one run;
  *   - write-side dedup on the natural id replaces the reference's
  *     read-repair loop (`chlogstore.go:46-112`) — reads stay exact and
  *     cheap instead of re-deduping per query.
  */
object Logstore {

  /** Idempotent batch insert: dedup by id (last write wins by time), stamp
    * month partition, sort within partitions. */
  def insertMany(batch: DataFrame, path: String,
                 idCol: String, tsCol: String): Unit = {
    batch
      .dropDuplicates(idCol)
      .withColumn("month", date_format(col(tsCol), "yyyy-MM"))
      .repartition(col("month"))
      .sortWithinPartitions(col(tsCol), col(idCol))
      .write.mode("append").partitionBy("month").parquet(path)
  }

  /** Scan the store; time predicates prune month directories first. */
  def scan(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
