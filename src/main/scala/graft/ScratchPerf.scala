package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf probe (not part of the library surface). */
object ScratchPerf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.HashExprs.install(spark)
    import org.apache.spark.storage.StorageLevel
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val threshold = 0.8
    val numHashes = 60
    val bands = 10
    val r = numHashes / bands

    // stage 1: tokenize + collapse
    val keyed = docs.select(col("doc_id").as("id"),
      TextFunctions.distinctTokens(col("text")).as("toks"))
      .withColumn("sz", size(col("toks")))
      .withColumn("setkey", md5(concat_ws(" ", array_sort(col("toks")))))
    val groups = keyed.groupBy("setkey")
      .agg(min(col("id")).as("rep"), collect_list(col("id")).as("members"),
        first(col("toks")).as("toks"), first(col("sz")).as("sz"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("collapse groupBy count") { println(groups.count()) }

    val toks = groups.select(col("rep").as("id"), col("toks"), col("sz"))
    val withSig = toks.withColumn("sig",
      graft.operators.Dedup.minhashSignature(col("toks"), numHashes))
    val sigs = withSig
      .select(col("id"),
        posexplode(array((0 until bands).map(b =>
          xxhash64(slice(col("sig"), lit(b * r + 1), lit(r)), lit(b))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("sig + band explode") { println(sigs.count()) }

    val cands = sigs.select(col("band"), col("bandhash"), col("id").as("id_a"))
      .join(sigs.select(col("band"), col("bandhash"), col("id").as("id_b")),
        Seq("band", "bandhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("band join + pair dedup") { println(cands.count()) }

    val verified = cands
      .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a"), col("sz").as("sz_a")), "id_a")
      .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b"), col("sz").as("sz_b")), "id_b")
    val common = size(array_intersect(col("toks_a"), col("toks_b")))
    val repPairs = verified.withColumn("jaccard",
        common.cast("double") / (col("sz_a") + col("sz_b") - common).cast("double"))
      .filter(col("jaccard") >= threshold)
    time("verify join + jaccard") { println(repPairs.count()) }

    // expansion
    val gm = groups.select(col("rep"), col("members"))
    val inter = repPairs
      .join(gm.select(col("rep").as("id_a"), col("members").as("ms_a")), "id_a")
      .join(gm.select(col("rep").as("id_b"), col("members").as("ms_b")), "id_b")
      .select(explode(col("ms_a")).as("a"), col("ms_b"), col("jaccard"))
      .select(col("a"), explode(col("ms_b")).as("b"), col("jaccard"))
    val intra = groups.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("a"), col("members"))
      .select(col("a"), explode(col("members")).as("b"))
      .filter(col("a") < col("b"))
    time("expansion") { println(inter.count() + intra.count()) }

    // full pipeline end-to-end for reference
    time("full minhashLshPairs") {
      graft.operators.Dedup.minhashLshPairs(docs, 0.8)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
