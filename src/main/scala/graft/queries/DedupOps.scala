package graft.queries

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication gate queries over `documents`.
  *
  * `dedup_exact_stats` and `dedup_jaccard_pairs` are exact → DuckDB-oracled.
  * MinHash-LSH and SimHash are hash-family-specific (xxhash64) so they get
  * rows-only driver checks; their correctness is pinned by ScalaTest
  * (LSH recall vs the exact-Jaccard ground truth on the same data).
  */
object DedupOps {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup: corpus-level duplication stats + survivor count.
    "dedup_exact_stats" -> ((s, dir) => {
      Tables.documents(s, dir).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct_text"),
        countDistinct(graft.functions.TextFunctions.fingerprint(col("text"))).as("n_distinct_fp"))
    }),

    // exact token-set Jaccard near-dup pairs, blocked by source.
    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // MinHash+LSH candidates verified to the same threshold (rows-only).
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), threshold = 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // SimHash near-dup pairs (rows-only).
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxHamming = 3)
        .orderBy(col("id_a"), col("id_b")))
  )

  def oracles: Map[String, String] = Map(
    "dedup_exact_stats" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct_text,
        |  count(DISTINCT substr(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 16)) AS n_distinct_fp
        |FROM documents""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
        |FROM tok a JOIN tok b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin
    // dedup_minhash_lsh / dedup_simhash: intentionally no oracle (hash-family
    // specific); driver records rows-only, ScalaTest pins recall.
  )
}
