package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** Pins the Z-order layout machinery: bit interleave against a brute
  * force, exact normalization bounds, and the actual pruning property —
  * a z-ordered table's per-file footers bound BOTH dimensions, where a
  * single-column sort bounds only its leading column. */
class LayoutSpec extends GraftSuite {

  private def brute(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zvalue matches brute-force interleave; normalize stays in range") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("x", "y")
      .select(Layout.zvalue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map { case (x, y) => brute(x, y, 16) })

    val vals = (0L to 1499L).toDF("v")
      .select(Layout.normalize(col("v"), 0L, 1499L).as("n"))
      .collect().map(_.getLong(0))
    assert(vals.min == 0L && vals.max == 65535L)
    assert(vals.toSeq == vals.toSeq.sorted, "normalization must be monotonic")
  }

  test("z-ordered files bound both dimensions; custkey-sort bounds only custkey") {
    val orders = graft.core.Tables.orders(spark, sf)
      .withColumn("odays", datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).cast("long"))
    val r = orders.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(col("odays")), max(col("odays"))).head()
    val (cSpan, dSpan) = ((r.getLong(1) - r.getLong(0)).toDouble,
      (r.getLong(3) - r.getLong(2)).toDouble)
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString

    Layout.zorderWrite(orders.select("o_orderkey", "o_custkey", "odays"),
      col("o_custkey"), col("odays"),
      (r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)),
      s"$tmp/z", numFiles = 16)
    orders.select("o_orderkey", "o_custkey", "odays")
      .repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(s"$tmp/c")

    // per-file fraction of each dimension's full span the footer covers
    def spans(path: String): Seq[(Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max(col("o_custkey")) - min(col("o_custkey"))) / cSpan).as("cf"),
          ((max(col("odays")) - min(col("odays"))) / dSpan).as("df"))
        .collect().map(x => (x.getDouble(1), x.getDouble(2))).toSeq

    val z = spans(s"$tmp/z"); val c = spans(s"$tmp/c")
    // the single-column sort leaves (nearly) every file spanning the full
    // date range — a date predicate prunes nothing
    assert(c.count(_._2 > 0.8) >= c.size - 1, s"custkey-sort date spans: $c")
    // z-order: most files cover well under half of EACH dimension, so
    // min/max footers prune on either predicate
    assert(z.count(_._1 <= 0.55) >= z.size * 3 / 4, s"z custkey spans: $z")
    assert(z.count(_._2 <= 0.55) >= z.size * 3 / 4, s"z date spans: $z")
  }

  test("optimizeMonth: content identical to compaction, both filter dims bounded") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_opt").toString
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      val ts = new java.sql.Timestamp(1704067200000L + rnd.nextInt(28 * 86400) * 1000L)
      (s"att_$i", s"d${rnd.nextInt(40)}", ts, s"payload_$i")
    }
    graft.operators.Logstore.insertMany(
      rows.toDF("attempt_id", "destination_id", "ts", "body"),
      s"$tmp/log", "attempt_id", "ts")

    val before = spark.read.parquet(s"$tmp/log")
      .select("attempt_id", "destination_id", "body")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    graft.operators.Logstore.optimizeMonth(spark, s"$tmp/log", "2024-01",
      "attempt_id", "ts", dimCol = "destination_id", targetFiles = 16)
    val after = spark.read.parquet(s"$tmp/log")
      .select("attempt_id", "destination_id", "body")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(after == before, "optimize must not change table content")

    // per-file footers: both the time range and the destination-hash
    // range must be bounded well under the full span for most files
    val spans = spark.read.parquet(s"$tmp/log")
      .withColumn("h", graft.operators.Logstore.dimHash16(col("destination_id")))
      .withColumn("t", unix_millis(col("ts").cast("timestamp")))
      .groupBy(input_file_name())
      .agg(((max(col("t")) - min(col("t"))) / (28.0 * 86400000)).as("tf"),
        ((max(col("h")) - min(col("h"))) / 65535.0).as("hf"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    assert(spans.size >= 8, s"expected multiple files, got ${spans.size}")
    assert(spans.count(_._1 <= 0.6) >= spans.size * 3 / 4, s"time spans: $spans")
    assert(spans.count(_._2 <= 0.6) >= spans.size * 3 / 4, s"hash spans: $spans")
  }

  test("scanPruned pushes the _dh bucket filter and actually skips row groups") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val rnd = new scala.util.Random(11)
    val rows = (1 to 20000).map { i =>
      val ts = new java.sql.Timestamp(1704067200000L + rnd.nextInt(28 * 86400) * 1000L)
      (s"att_$i", s"d${rnd.nextInt(40)}", ts, s"payload_$i")
    }
    graft.operators.Logstore.insertMany(
      rows.toDF("attempt_id", "destination_id", "ts", "body"),
      s"$tmp/log", "attempt_id", "ts")
    graft.operators.Logstore.optimizeMonth(spark, s"$tmp/log", "2024-01",
      "attempt_id", "ts", dimCol = "destination_id", targetFiles = 16)

    val probe = graft.operators.Logstore.scanPruned(spark, s"$tmp/log",
      tsCol = "ts",
      from = java.sql.Timestamp.valueOf("2024-01-03 00:00:00"),
      to = java.sql.Timestamp.valueOf("2024-01-17 00:00:00"),
      dimCol = "destination_id", values = Seq("d7"))
    // the bucket predicate must reach the parquet reader as an ordinary
    // pushed IN filter over the stored cluster column
    val phys = probe.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") && phys.contains("_dh"),
      s"_dh filter not pushed:\n$phys")
    // the driver-side literal hash must agree with the column form
    val expected = spark.range(1)
      .select(graft.operators.Logstore.dimHash16(lit("d7")).cast("int"))
      .head().getInt(0)
    assert(graft.operators.Logstore.dimHash16Value("d7") == expected)

    // and the skip must be REAL: the scan node may emit only the rows of
    // the row groups whose footer ranges survive the pushed filters —
    // far fewer than the whole store (16 z-files; one hash point + half
    // the month bounds a couple of them)
    val got = probe.collect()
    assert(got.nonEmpty && got.forall(_.getAs[String]("destination_id") == "d7"))
    val scanRows = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics("numOutputRows").value).sum
    assert(scanRows < 20000 / 2,
      s"expected row-group skipping, scan emitted $scanRows of 20000 rows")
  }
}
