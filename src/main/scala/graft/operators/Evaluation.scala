package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-evaluation metrics at data scale: exact tie-corrected AUC via
  * distributed rank-sums, calibration bins, and threshold confusion
  * matrices.
  *
  * The naive AUC (`row_number() OVER (ORDER BY score)` then the
  * Mann–Whitney identity) collapses to one task at scale. This
  * implementation stays parallel end to end:
  *   1. ONE aggregate to per-DISTINCT-score (pos, neg) counts — the only
  *      pass over the facts, map-side combinable;
  *   2. [[Ranking.globalRunningSum]] over the (much smaller) distinct-
  *      score table for the cumulative negative count — range-partitioned
  *      prefix sum, no single-partition window;
  *   3. U-statistic with the standard tie correction (each tied
  *      pos/neg pair contributes ½), all in INTEGER arithmetic:
  *      2U = Σ_s pos_s · (2·neg_<s + neg_s), AUC = 2U / (2·n⁺·n⁻) —
  *      exact, engine-reproducible, one final double division.
  * Keeping everything integral until the last division is what lets
  * DuckDB replay the whole computation in the `auc_exact` gate.
  */
object Evaluation {

  /** Exact tie-corrected AUC of `score` predicting boolean `positive`.
    * Returns one row: (n_pos, n_neg, auc). Score may be any orderable
    * numeric; ties get the standard ½ credit. NULL scores are EXCLUDED:
    * an unscored row is not rankable, and standard AUC drops it — letting
    * it through would also diverge from SQL engines that sort NULLS LAST
    * (Spark ASC ranks nulls first), silently biasing the statistic. */
  def aucExact(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val perScore = df.where(score.isNotNull).groupBy(score.as("s"))
      .agg(sum(when(positive, 1L).otherwise(0L)).as("pos"),
        sum(when(positive, 0L).otherwise(1L)).as("neg"))
    val cum = Ranking.globalRunningSum(perScore, Seq(col("s")), col("neg"),
      outCol = "cum_neg")
    cum
      .select(col("pos"), col("neg"), (col("cum_neg") - col("neg")).as("neg_lt"))
      // 2U ≤ 2·n⁺·n⁻ overflows a long past ~3×10⁹ balanced rows — and
      // Spark's non-ANSI sum would WRAP silently. decimal(38,0) keeps the
      // statistic exact to ~10¹⁹ rows; the one cast to double at the end
      // is exact for any gate-scale value (< 2⁵³)
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos").cast("decimal(38,0)") *
          (lit(2L) * col("neg_lt") + col("neg")).cast("decimal(38,0)")).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        round(col("u2").cast("double") / (lit(2.0) * col("n_pos") * col("n_neg")), 6)
          .as("auc"))
  }

  /** Calibration table: k equal-population score bins (exact NTILE via
    * [[Ranking.ntile]]), per-bin row count, positive rate, and mean
    * score. `tiebreak` totalizes the order so bins are engine-exact;
    * `score` should be integral (exact sums). */
  def calibrationBins(df: DataFrame, score: Column, positive: Column,
                      k: Int, tiebreak: Seq[Column]): DataFrame = {
    val base = df.select(score.cast("long").as("_s"),
      when(positive, 1L).otherwise(0L).as("_y"), struct(tiebreak: _*).as("_tb"))
    Ranking.ntile(base, k, Seq(col("_s"), col("_tb")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("_y")).as("pos"),
        sum(col("_s")).as("ssum"))
      .select(col("bucket"), col("n"), col("pos"),
        round(col("pos") / col("n").cast("double"), 6).as("pos_rate"),
        round(col("ssum") / col("n").cast("double"), 6).as("score_mean"))
      .orderBy(col("bucket"))
  }

  /** Confusion matrix + derived rates at `score >= threshold`: one
    * aggregate, exact counts, rounded rates. */
  def confusionAtThreshold(df: DataFrame, score: Column, positive: Column,
                           threshold: Column): DataFrame = {
    val pred = score >= threshold
    df.agg(
        sum(when(pred && positive, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !positive, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && !positive, 1L).otherwise(0L)).as("tn"),
        sum(when(!pred && positive, 1L).otherwise(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        round(col("tp") / (col("tp") + col("fp")).cast("double"), 6).as("precision"),
        round(col("tp") / (col("tp") + col("fn")).cast("double"), 6).as("recall"))
  }
}
