package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic SF scale-up for bench evidence (VERDICT r11 task #1):
  * writes an sf(0.1·N) directory by unioning N key-shifted copies of the
  * sf0.1 tables, so the same query + oracle pair can be timed at a scale
  * where the local-mode per-job scheduling floor (~0.1 s/stage) stops
  * dominating sub-second queries.
  *
  * Copy c shifts every join/tiebreak key by c·2³² (far above any real id,
  * so copies cannot collide or cross-join), and leaves values untouched —
  * the scaled corpus has N× rows, N× distinct keys, and the same value
  * distributions, which is exactly what a floor-amortization measurement
  * needs (more data per stage, same plan shape). Content is intentionally
  * repeated: both engines read the identical parquet, so the pairing
  * stays apples-to-apples.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <dstDir> <copies> [tables]
  * Default tables: the ones the four r11 bench outliers read
  * (documents, embeddings, lineitem, orders).
  */
object ScaleData {

  private val Shift = 1L << 32

  /** per-table key columns to shift per copy (everything else passes
    * through unchanged) */
  private val keyCols: Map[String, Seq[String]] = Map(
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "lineitem" -> Seq("l_orderkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "events" -> Seq("event_id"))

  def scaled(spark: SparkSession, srcDir: String, table: String,
             copies: Int): DataFrame = {
    val src = graft.core.Tables.table(spark, srcDir, table)
    val keys = keyCols.getOrElse(table, Seq.empty)
    // explode(sequence), not an N-way union: one scan, O(1) plan size —
    // a 700-copy union tree costs more to PLAN than to run
    val exploded = src.withColumn("_copy",
      explode(sequence(lit(0L), lit(copies - 1L))))
    keys.foldLeft(exploded) { (df, k) =>
      df.withColumn(k, col(k) + col("_copy") * lit(Shift))
    }.drop("_copy")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleData <srcDir> <dstDir> <copies> [tables,..]")
    val Array(srcDir, dstDir, copiesS) = args.take(3)
    val copies = copiesS.toInt
    val requested =
      if (args.length > 3) args(3).split(",").toSeq
      else Seq("documents", "embeddings", "lineitem", "orders")
    // Shifting a child's foreign key (o_custkey, l_orderkey) without
    // regenerating the parent would leave copies 1..N-1 dangling and
    // silently drop (N-1)/N of the join matches in any customer/order
    // join — so pull in key parents transitively (ADVICE r12).
    val parentOf = Map("orders" -> "customer", "lineitem" -> "orders")
    val tables = Iterator.iterate(requested.distinct) { ts =>
      (ts ++ ts.flatMap(parentOf.get)).distinct
    }.sliding(2).collectFirst { case Seq(a, b) if a == b => a }.get
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scaledata")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tables.foreach { t =>
      scaled(spark, srcDir, t, copies)
        .repartition(32) // even file sizes; no artificial clustering by copy
        .write.mode(SaveMode.Overwrite).parquet(s"$dstDir/$t.parquet")
      println(s"[scaledata] wrote $dstDir/$t.parquet (${copies}x $t)")
    }
    spark.stop()
  }
}
