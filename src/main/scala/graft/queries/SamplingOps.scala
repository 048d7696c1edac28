package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling is not reproducible across engines/partitionings;
  * content-hash sampling is: a row's split follows md5 of its id, so any
  * engine computes the same assignment, membership is stable under
  * re-partitioning/backfills, and downstream joins of "the train split"
  * always agree. Both ops are exact → DuckDB-oracled.
  */
object SamplingOps {

  /** Lexicographic threshold over the first 8 md5 hex chars ≈ fraction.
    * 0xcccccccc / 0xffffffff ≈ 0.8. */
  private val TrainThreshold = "cccccccc"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~80/20 hash split: deterministic, engine-independent, id-stable.
    "train_test_split" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("split",
          when(substring(md5(col("event_id").cast("string")), 1, 8) < TrainThreshold,
            "train").otherwise("test"))
        .groupBy(col("split"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("event_type"))
    }),

    // Efraimidis–Spirakis weighted sample without replacement, weight =
    // n_chars (budget-proportional selection). Deterministic md5-derived
    // uniforms make the draw reproducible and DuckDB-recomputable; the
    // plan is TakeOrderedAndProject (no global sort, no row shuffle).
    "weighted_sample_topn" -> ((s, dir) => {
      graft.operators.Sampling
        .weightedSample(Tables.documents(s, dir), "doc_id",
          greatest(col("n_chars"), lit(1)).cast("double"), n = 50, salt = "r6")
        .select(col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("es_key"))
    }),

    // stratified weighted sample: an independent A-ES draw of 5 docs per
    // language, weight = n_chars — the per-group curation-quota primitive.
    "weighted_sample_per_lang" -> ((s, dir) => {
      graft.operators.Sampling
        .weightedSamplePerGroup(Tables.documents(s, dir), "doc_id", "lang",
          greatest(col("n_chars"), lit(1)).cast("double"), nPerGroup = 5,
          salt = "r6g")
        .select(col("lang"), col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("es_key"))
    }),

    // per-group cap: at most 10 docs per source, chosen by hash order (a
    // deterministic "random" subset, stable across engines and runs).
    "capped_per_source" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy(col("source"), col("rk"))
    })
  )

  def oracles: Map[String, String] = Map(
    "train_test_split" ->
      s"""SELECT CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < '$TrainThreshold'
        |  THEN 'train' ELSE 'test' END AS split,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY split, event_type""".stripMargin,
    "weighted_sample_topn" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r6'), 1, 12))::UBIGINT + 0.5)
        |       / 281474976710656.0) / CAST(greatest(n_chars, 1) AS DOUBLE) AS raw_key
        |  FROM documents)
        |SELECT doc_id, n_chars, round(raw_key, 9) AS es_key FROM k
        |ORDER BY raw_key DESC, doc_id LIMIT 50""".stripMargin,
    "weighted_sample_per_lang" ->
      """WITH k AS (
        |  SELECT lang, doc_id, n_chars,
        |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r6g'), 1, 12))::UBIGINT + 0.5)
        |       / 281474976710656.0) / CAST(greatest(n_chars, 1) AS DOUBLE) AS raw_key
        |  FROM documents),
        |r AS (SELECT lang, doc_id, n_chars, raw_key,
        |  row_number() OVER (PARTITION BY lang ORDER BY raw_key DESC, doc_id) AS rk
        |  FROM k)
        |SELECT lang, doc_id, n_chars, round(raw_key, 9) AS es_key
        |FROM r WHERE rk <= 5""".stripMargin,
    "capped_per_source" ->
      """SELECT source, rk, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 10 ORDER BY source, rk""".stripMargin
  )
}
