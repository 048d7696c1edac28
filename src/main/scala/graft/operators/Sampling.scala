package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted sampling without replacement over a corpus — the curation
  * primitive behind "sample a token budget proportionally to quality
  * score" (quality-weighted subsampling, SoftDeDup-style reweighting,
  * budget-proportional source mixing).
  *
  * Efraimidis–Spirakis A-ES: each row draws `key = ln(u) / w` (u uniform,
  * w its weight) and the global top-n by key IS a weighted sample without
  * replacement. One scan, no shuffle of rows: `orderBy(key).limit(n)`
  * compiles to `TakeOrderedAndProject` — per-partition partial top-n, a
  * driver merge of n·partitions keys — so it holds at any corpus size
  * where n fits on the driver.
  *
  * u derives DETERMINISTICALLY from `md5(id ++ salt)` (first 48 bits →
  * `(h + 0.5) / 2^48`), so the "random" sample is reproducible, engine
  * independent (DuckDB recomputes it bit-for-bit for the gate), and
  * re-drawable by changing the salt — the property a 100 TB pipeline
  * needs for resumable, auditable sampling runs.
  */
object Sampling {

  /** The deterministic uniform in (0,1) for a row id + salt. */
  def uniformOf(id: Column, salt: String): Column = {
    val h = conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 12),
      16, 10).cast("double")
    (h + lit(0.5)) / lit(281474976710656.0) // 2^48
  }

  /** A-ES key; larger is better. `weight` must be strictly positive. */
  def esKey(id: Column, weight: Column, salt: String): Column =
    log(uniformOf(id, salt)) / weight

  /** Top-n weighted sample; output keeps the input columns plus `es_key`
    * (the raw selection key, useful for resuming / auditing). */
  def weightedSample(df: DataFrame, idCol: String, weight: Column, n: Int,
                     salt: String = ""): DataFrame =
    df.withColumn("es_key", esKey(col(idCol), weight, salt))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(n)

  /** Stratified form: an independent weighted sample of `nPerGroup` WITHIN
    * each group (per-language / per-source curation quotas). One window
    * per group partition — the same A-ES keys, so a row's inclusion
    * depends only on (id, salt, weight) and its in-group competitors. */
  def weightedSamplePerGroup(df: DataFrame, idCol: String, groupCol: String,
                             weight: Column, nPerGroup: Int,
                             salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("es_key").desc, col(idCol))
    df.withColumn("es_key", esKey(col(idCol), weight, salt))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= nPerGroup)
      .drop("_rk")
  }
}
