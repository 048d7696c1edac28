package graft.queries

import graft.core.Tables
import graft.operators.Features
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gates for the categorical feature encoders
  * ([[graft.operators.Features]]). Labels enter the encoders
  * INTEGER-scaled (cents), folds and hash buckets are md5-nibble-derived,
  * so DuckDB replays every encoding table exactly. */
object FeatureOps {

  private def ordersCents(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).withColumn("y",
      round(col("o_totalprice") * 100).cast("long"))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // count + frequency encoding dictionary
    "count_encode_priority" -> ((s, dir) =>
      Features.countEncode(Tables.orders(s, dir), col("o_orderpriority"))
        .orderBy(col("cat"))),

    // smoothed target encoding (m = 50 virtual prior rows), label = cents
    "target_encode_priority" -> ((s, dir) =>
      Features.targetEncode(ordersCents(s, dir), col("o_orderpriority"),
        col("y"), m = 50.0).orderBy(col("cat"))),

    // LEAKAGE-SAFE out-of-fold encoding table: 5 categories × 4 md5 folds
    "target_encode_oof" -> ((s, dir) =>
      Features.targetEncodeOOF(ordersCents(s, dir), col("o_orderpriority"),
          col("y"), col("o_orderkey"), k = 4, m = 20.0)
        .orderBy(col("cat"), col("fold"))),

    // weight of evidence vs the global log-odds, target = finished orders
    "woe_encode_priority" -> ((s, dir) =>
      Features.woeEncode(Tables.orders(s, dir), col("o_orderpriority"),
        col("o_orderstatus") === "F", alpha = 0.5).orderBy(col("cat"))),

    // INCREMENTALLY-MAINTAINED target encoding: the dictionary reads off
    // IncrementalAgg state kept in sync across three fact appends and a
    // retention drop — the encoder "forgets" the dropped month; DuckDB
    // recomputes from scratch over the retained facts.
    "incremental_target_encode" -> ((s, dir) => {
      import graft.operators.{CommitLog, Features, IncrementalAgg}
      val base = java.nio.file.Files.createTempDirectory("graft_ite").toString
      val (fact, agg) = (s"$base/fact", s"$base/agg")
      val ev = Tables.events(s, dir).select(
        col("event_id"),
        expr("timestampadd(DAY, CAST(pmod(event_id, 3) * 30 AS INT), ts)").as("ts"),
        col("event_type"),
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      val spec = IncrementalAgg.Spec("ts", "cents", Seq("event_type"), "1d")
      (0 until 3).foreach { b =>
        CommitLog.append(ev.filter(pmod(col("event_id"), lit(3)) === b), fact,
          idCol = "event_id", tsCol = "ts", token = Some(s"b$b"))
        IncrementalAgg.refresh(s, fact, agg, spec)
      }
      CommitLog.dropMonthsBefore(fact, keepFromMonth = "2024-02")
      IncrementalAgg.refresh(s, fact, agg, spec)
      Features.encodeFromAgg(IncrementalAgg.readAgg(s, agg), "event_type",
        m = 100.0).orderBy(col("cat"))
    }),

    // TRAINED quality classifier (VERDICT r11 task #5): logistic-family
    // GD over hashed-source + token-stat integer features, one exact
    // integer-gradient aggregate per epoch — DuckDB replays the ENTIRE
    // 6-epoch weight trajectory (engine-exact fast sigmoid, no exp()).
    "quality_classifier_coeffs" -> ((s, dir) => {
      import graft.operators.{Features, QualityModel}
      val feats = QualityModel.documentFeatures
      val train = Tables.documents(s, dir)
        .filter(Features.foldOf(col("doc_id"), 5) =!= 0)
      val w = QualityModel.trainLogistic(train, feats,
        QualityModel.documentQualityLabel, lr = 0.5, epochs = 6)
      s.createDataFrame(feats.map(_._1).zip(w).map { case (nm, wi) =>
          (nm, BigDecimal(wi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }).toDF("feature", "weight").orderBy("feature")
    }),

    // held-out evaluation of the same trained scorer: exact tie-corrected
    // AUC over the test fold, score quantized to floor(z·10⁶) so ranking
    // is engine-exact (composes trainLogistic + Evaluation.aucExact).
    "quality_classifier_auc" -> ((s, dir) => {
      import graft.operators.{Evaluation, Features, QualityModel}
      val docs = Tables.documents(s, dir)
      val feats = QualityModel.documentFeatures
      val fold = Features.foldOf(col("doc_id"), 5)
      val w = QualityModel.trainLogistic(docs.filter(fold =!= 0), feats,
        QualityModel.documentQualityLabel, lr = 0.5, epochs = 6)
      val zq = floor(QualityModel.scoreExpr(feats, w) * lit(1000000.0))
      Evaluation.aucExact(docs.filter(fold === 0).withColumn("zq", zq),
        col("zq"), QualityModel.documentQualityLabel)
    }),

    // signed hashing trick: 16-bucket signed sums over two categorical
    // columns (linear readout — per-row vectors sum bucket-wise)
    "feature_hash_buckets" -> ((s, dir) =>
      Features.featureHash16(Tables.documents(s, dir),
          Seq(col("lang"), col("source")))
        .select(posexplode(col("fh")).as(Seq("b", "v")))
        .groupBy(col("b"))
        .agg(sum(col("v")).cast("long").as("signed_sum"))
        .orderBy(col("b"))))

  def oracles: Map[String, String] = Map(
    "quality_classifier_coeffs" -> graft.operators.QualityModel
      .coeffsOracleSql(graft.operators.QualityModel.documentFeatures.map(_._1),
        lr = 0.5, epochs = 6, folds = 5, testFold = 0),
    "quality_classifier_auc" -> graft.operators.QualityModel
      .aucOracleSql(lr = 0.5, epochs = 6, folds = 5, testFold = 0),
    "count_encode_priority" ->
      """SELECT o_orderpriority AS cat, count(*) AS n,
        |       round(count(*) * 1.0 / (SELECT count(*) FROM orders), 6) AS freq
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "target_encode_priority" ->
      """WITH o AS (SELECT o_orderpriority AS cat,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS y FROM orders),
        |g AS (SELECT sum(y) * 1.0 / count(*) AS prior FROM o)
        |SELECT cat, count(*) AS n,
        |       round((sum(y) + 50.0 * (SELECT prior FROM g)) / (count(*) + 50.0), 6) AS enc
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "target_encode_oof" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS cat,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS y,
        |         CAST(('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT % 4 AS INT) AS fold
        |  FROM orders),
        |cf AS (SELECT cat, fold, sum(y) AS s_cf, count(*) AS n_cf FROM o GROUP BY 1, 2),
        |bycat AS (SELECT cat, sum(s_cf) AS s_c, sum(n_cf) AS n_c FROM cf GROUP BY 1),
        |byfold AS (SELECT fold, sum(s_cf) AS s_f, sum(n_cf) AS n_f FROM cf GROUP BY 1),
        |g AS (SELECT sum(s_cf) AS s, sum(n_cf) AS n FROM cf),
        |grid AS (SELECT cat, CAST(unnest(range(4)) AS INT) AS fold FROM bycat)
        |SELECT grid.cat AS cat, grid.fold AS fold,
        |       CAST(bycat.n_c AS BIGINT) AS n_c,
        |       CAST(coalesce(cf.n_cf, 0) AS BIGINT) AS n_cf,
        |       round((bycat.s_c - coalesce(cf.s_cf, 0)
        |              + (20.0 * (g.s - coalesce(byfold.s_f, 0)))
        |                / (g.n - coalesce(byfold.n_f, 0)))
        |             / (bycat.n_c - coalesce(cf.n_cf, 0) + 20.0), 6) AS enc
        |FROM grid JOIN bycat USING (cat)
        |LEFT JOIN cf USING (cat, fold)
        |LEFT JOIN byfold USING (fold) CROSS JOIN g
        |ORDER BY 1, 2""".stripMargin,

    "woe_encode_priority" ->
      """WITH o AS (SELECT o_orderpriority AS cat,
        |                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS p FROM orders),
        |g AS (SELECT ln((sum(p) + 0.5) / (count(*) - sum(p) + 0.5)) AS glo FROM o)
        |SELECT cat, CAST(sum(p) AS BIGINT) AS pos,
        |       CAST(count(*) - sum(p) AS BIGINT) AS neg,
        |       round(ln((sum(p) + 0.5) / (count(*) - sum(p) + 0.5))
        |             - (SELECT glo FROM g), 6) AS woe
        |FROM o GROUP BY 1 ORDER BY 1""".stripMargin,

    "incremental_target_encode" ->
      """WITH ev AS (
        |  SELECT ts + to_days(CAST((event_id % 3) * 30 AS INT)) AS ts, event_type,
        |         CAST(round(value * 100.0) AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT event_type, cents FROM ev
        |      WHERE strftime(ts::TIMESTAMP, '%Y-%m') >= '2024-02'),
        |g AS (SELECT sum(cents) * 1.0 / count(*) AS prior FROM r)
        |SELECT event_type AS cat, count(*) AS n,
        |       round((sum(cents) + 100.0 * (SELECT prior FROM g))
        |             / (count(*) + 100.0), 6) AS enc
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "feature_hash_buckets" ->
      """WITH c AS (
        |  SELECT strpos('0123456789abcdef', substr(md5('1:' || lang), 1, 1)) - 1 AS b,
        |         CASE WHEN strpos('0123456789abcdef', substr(md5('1:' || lang), 2, 1)) - 1 < 8
        |              THEN 1 ELSE -1 END AS v
        |  FROM documents
        |  UNION ALL
        |  SELECT strpos('0123456789abcdef', substr(md5('2:' || source), 1, 1)) - 1 AS b,
        |         CASE WHEN strpos('0123456789abcdef', substr(md5('2:' || source), 2, 1)) - 1 < 8
        |              THEN 1 ELSE -1 END AS v
        |  FROM documents),
        |buckets AS (SELECT CAST(unnest(range(16)) AS INT) AS b)
        |SELECT buckets.b AS b, CAST(coalesce(sum(c.v), 0) AS BIGINT) AS signed_sum
        |FROM buckets LEFT JOIN c USING (b)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
