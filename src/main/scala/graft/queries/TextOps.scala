package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis gate queries over the `documents` table
  * (doc_id, text, lang, source, n_chars). */
object TextOps {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting: whitespace + BPE-ish estimate + content fingerprint.
    "text_token_stats" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenEstimate(col("text")).as("bpe_estimate"),
        fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // quality scoring (length/shape/stopword mix).
    "text_quality" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        round(stopwordRatio(col("text")), 6).as("stop_ratio"),
        qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // language ID (marker heuristic) vs the labeled lang column.
    "text_langid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), langId(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // cleaning/normalization pipeline: lowercase → non-printables to
    // spaces → collapse runs → trim (the pre-tokenization normal form).
    "text_normalize" -> ((s, dir) => {
      val cleaned = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^ -~]", " "), " +", " "))
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(cleaned).as("n_clean"),
        substring(md5(cleaned), 1, 16).as("fp_clean"))
        .orderBy(col("doc_id"))
    }),

    // A9 explode: corpus token frequencies.
    "explode_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    })
  )

  private val stopList = EnglishStopwords.map(w => s"'$w'").mkString(", ")
  private def markerList(lang: String) =
    LangMarkers.find(_._1 == lang).get._2.map(w => s"'$w'").mkString(", ")

  def oracles: Map[String, String] = Map(
    "text_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+'),
        |    r -> CAST(ceil(length(r) / 4.0) AS BIGINT)))
        |    + len(regexp_extract_all(text, '[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_estimate,
        |  substr(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text,' ')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ($stopList))) AS DOUBLE) AS stops
        |  FROM documents)
        |SELECT doc_id,
        |  round(stops / ntok, 6) AS stop_ratio,
        |  round(least(ntok/200.0, 1.0)*0.4
        |    + greatest(0.0, 1.0 - abs(CAST(length(text) AS DOUBLE)/ntok - 5.0)/5.0)*0.4
        |    + least(stops/ntok*5.0, 1.0)*0.2, 6) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""WITH h AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("en")}))) AS h_en,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("fr")}))) AS h_fr,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("es")}))) AS h_es,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("de")}))) AS h_de,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("zh")}))) AS h_zh
        |  FROM documents),
        |p AS (
        |  SELECT lang, CASE
        |    WHEN greatest(h_en,h_fr,h_es,h_de,h_zh) = 0 THEN 'und'
        |    WHEN h_en = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'en'
        |    WHEN h_fr = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'fr'
        |    WHEN h_es = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'es'
        |    WHEN h_de = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'de'
        |    ELSE 'zh' END AS predicted
        |  FROM h)
        |SELECT lang, predicted, count(*) AS n FROM p
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  length(trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', ' ', 'g'), ' +', ' ', 'g'))) AS n_clean,
        |  substr(md5(trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', ' ', 'g'), ' +', ' ', 'g'))), 1, 16) AS fp_clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin
  )
}
