package graft.queries

import graft.core.Tables
import graft.operators.Evaluation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gates for the model-evaluation operators
  * ([[graft.operators.Evaluation]]): exact tie-corrected AUC,
  * calibration bins, confusion matrix — all integral until the final
  * division, so DuckDB replays them exactly. */
object EvalOps {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Tie-corrected Mann–Whitney AUC of n_chars predicting lang='en' —
    // n_chars is heavily tied, so the ½-credit correction is exercised.
    "auc_exact" -> ((s, dir) =>
      Evaluation.aucExact(Tables.documents(s, dir),
        col("n_chars"), col("lang") === "en")),

    // Equal-population calibration deciles of the same score/label.
    "calibration_deciles" -> ((s, dir) =>
      Evaluation.calibrationBins(Tables.documents(s, dir),
        col("n_chars"), col("lang") === "en", k = 10,
        tiebreak = Seq(col("doc_id")))),

    // Threshold confusion matrix: price >= 150k predicting finished orders.
    "confusion_matrix" -> ((s, dir) =>
      Evaluation.confusionAtThreshold(Tables.orders(s, dir),
        col("o_totalprice"), col("o_orderstatus") === "F", lit(150000.0))))

  def oracles: Map[String, String] = Map(
    "auc_exact" ->
      """WITH s AS (
        |  SELECT n_chars AS sc,
        |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos,
        |         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS neg
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |c AS (SELECT pos, neg, sum(neg) OVER (ORDER BY sc) - neg AS neg_lt FROM s)
        |SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
        |       round(sum(pos * (2 * neg_lt + neg)) / (2.0 * sum(pos) * sum(neg)), 6) AS auc
        |FROM c""".stripMargin,

    "calibration_deciles" ->
      """WITH t AS (
        |  SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |         ntile(10) OVER (ORDER BY n_chars, doc_id) AS bucket
        |  FROM documents)
        |SELECT bucket, count(*) AS n, CAST(sum(y) AS BIGINT) AS pos,
        |       round(sum(y) / CAST(count(*) AS DOUBLE), 6) AS pos_rate,
        |       round(sum(n_chars) / CAST(count(*) AS DOUBLE), 6) AS score_mean
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "confusion_matrix" ->
      """WITH m AS (
        |  SELECT
        |    sum(CASE WHEN o_totalprice >= 150000.0 AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS tp,
        |    sum(CASE WHEN o_totalprice >= 150000.0 AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS fp,
        |    sum(CASE WHEN o_totalprice < 150000.0 AND o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS tn,
        |    sum(CASE WHEN o_totalprice < 150000.0 AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS fn
        |  FROM orders)
        |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |       CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
        |       round(tp / CAST(tp + fp AS DOUBLE), 6) AS precision,
        |       round(tp / CAST(tp + fn AS DOUBLE), 6) AS recall
        |FROM m""".stripMargin)
}
