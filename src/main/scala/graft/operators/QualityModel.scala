package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear quality classifier (VERDICT r11 task #5) — the
  * fastText-style scorer a training-data pipeline TRAINS instead of
  * hand-setting curation thresholds: a logistic-family model over hashed
  * categorical features ([[Features.featureHash16]]'s tagged-md5 bucket
  * scheme) plus integer token statistics, trained by full-batch gradient
  * descent where EVERY epoch is ONE mergeable aggregate over the facts.
  *
  * Scale shape: the model is d doubles on the driver (d ≈ 20); an epoch
  * ships d exact longs per partition (map-side-combined integer gradient
  * sums) — wire cost independent of row count, the same two-tier split as
  * [[Projection]]'s covariance. No per-row state, no parameter shuffle.
  *
  * Determinism — the whole training run is ENGINE-EXACT, which is what
  * lets DuckDB replay every epoch in the `quality_classifier_*` oracles:
  *   - features are INTEGERS (hashed ±1 buckets, floor-scaled counts);
  *   - the squashing function is the FAST SIGMOID σ̂(z) = 0.5 + 0.5·z/(1+|z|)
  *     — composed only of +, ×, ÷, |·| (correctly-rounded IEEE ops, so any
  *     engine computes the same bits), deliberately NOT exp(): Java's
  *     Math.exp and C's libm disagree in the last ulp, and a 1-ulp wobble
  *     under an integer-quantization floor is exactly the gate-flake class
  *     ADVICE r11 flagged;
  *   - per-row gradient contributions quantize to integers
  *     (floor(err·xᵢ·10⁶ + 0.5)) so gradient sums are exact under ANY
  *     aggregation order — the weight trajectory is reproducible across
  *     partitionings, engines, and reruns;
  *   - z folds left-to-right over a fixed feature order; weight updates
  *     mirror one fixed association (w − lr·((G/10⁶)/n)).
  */
object QualityModel {

  /** Fast sigmoid — engine-exact squashing (see object doc). */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + lit(0.5) * (z / (lit(1.0) + abs(z)))

  /** The gate feature set over `documents`: bias, floor-scaled char /
    * token / stopword / mean-token-length stats, and the 16 signed hash
    * buckets of `source` (tagged-md5 scheme shared with
    * [[Features.featureHash16]], integer-valued here). Fixed order — the
    * fold order is part of the model's determinism contract. */
  def documentFeatures: Seq[(String, Column)] = {
    val ntok = size(split(col("text"), " "))
    val stats = Seq(
      "bias" -> lit(1L),
      "chars_100" -> floor(col("n_chars") / lit(100.0)),
      "tokens_10" -> floor(ntok / lit(10.0)).cast("long"),
      "stops" -> size(filter(split(col("text"), " "),
        t => t.isin(graft.functions.TextFunctions.EnglishStopwords: _*)))
        .cast("long"),
      "mtl" -> floor(length(col("text")) / ntok))
    val tagged = concat(lit("1:"), col("source").cast("string"))
    val bucket = Features.md5Nibble(tagged, 1)
    val sign = when(Features.md5Nibble(tagged, 2) < 8, 1L).otherwise(-1L)
    val hashed = (0 until 16).map { b =>
      s"fh$b" -> when(bucket === b, sign).otherwise(0L)
    }
    stats ++ hashed
  }

  /** The TEACHER label the gate classifier distills: the curation rule
    * "[[graft.functions.TextFunctions.qualityScore]] ≥ 0.5", UNROUNDED so
    * the boundary comparison is engine-exact (the rule is pure
    * +,×,÷,|·|,min,max arithmetic — identical bits anywhere). This is the
    * fastText-style pipeline move: hand-set heuristic verdicts become
    * training labels for a learned scorer (in production the teacher is
    * an expensive judge; here it is the repo's own curation rule, which
    * both engines can replay). */
  def documentQualityLabel: Column = {
    val nTok = size(split(col("text"), " ")).cast("double")
    val stops = size(filter(split(col("text"), " "),
      t => t.isin(graft.functions.TextFunctions.EnglishStopwords: _*)))
      .cast("double")
    val lenScore = least(nTok / 200.0, lit(1.0))
    val shape = greatest(lit(0.0),
      lit(1.0) - abs(length(col("text")).cast("double") / nTok - 5.0) / 5.0)
    val stopScore = least(stops / nTok * 5.0, lit(1.0))
    lenScore * 0.4 + shape * 0.4 + stopScore * 0.2 >= 0.5
  }

  /** Full-batch GD: `epochs` rounds, each ONE aggregate of d exact
    * integer gradient sums; weights update on the driver. Returns the
    * weights in feature order (unrounded — round at the readout).
    * `label` must be boolean; features integer-valued. */
  def trainLogistic(df: DataFrame, features: Seq[(String, Column)],
                    label: Column, lr: Double, epochs: Int,
                    scale: Double = 1e6): Seq[Double] = {
    require(features.nonEmpty && epochs >= 1 && lr > 0,
      s"need features, epochs >= 1, lr > 0; got ${features.size}, $epochs, $lr")
    val d = features.size
    val prepared = df.select(
      features.zipWithIndex.map { case ((_, c), i) => c.cast("long").as(s"x$i") } :+
        when(label, 1.0).otherwise(0.0).as("_y"): _*)
    graft.core.Caching.withCached(prepared) {
      // the row count rides the FIRST epoch's aggregate (one pass fewer:
      // that job doubles as the cache materialization; the maths are
      // unchanged — epoch 1's gradient at w = 0 never reads n, and the
      // update divides by the n returned by the same row)
      var n = 0L
      var w = Array.fill(d)(0.0)
      for (epoch <- 1 to epochs) {
        val z = (0 until d).map(i => lit(w(i)) * col(s"x$i")).reduceLeft(_ + _)
        val err = fastSigmoid(z) - col("_y")
        val aggs = (0 until d).map(i =>
          sum(floor(err * col(s"x$i") * lit(scale) + lit(0.5))).as(s"g$i"))
        val g =
          if (epoch == 1)
            prepared.agg(count(lit(1)).as("_n"), aggs: _*).head()
          else prepared.agg(aggs.head, aggs.tail: _*).head()
        if (epoch == 1) {
          n = g.getLong(0)
          require(n > 0, "trainLogistic over an empty frame")
        }
        val off = if (epoch == 1) 1 else 0
        w = Array.tabulate(d)(i =>
          w(i) - lr * ((g.getLong(i + off).toDouble / scale) / n))
      }
      w.toSeq
    }
  }

  /** The raw score z = Σ wᵢ·xᵢ (left-assoc over the fixed order). */
  def scoreExpr(features: Seq[(String, Column)], w: Seq[Double]): Column =
    features.zip(w).map { case ((_, c), wi) => lit(wi) * c.cast("long") }
      .reduceLeft(_ + _)

  // ---------------------------------------------------------------------
  // DuckDB replication (generated so gate and operator share the spec)
  // ---------------------------------------------------------------------

  /** SQL for the gate feature frame over `documents` — mirrors
    * [[documentFeatures]] expression by expression. */
  private val StopList = graft.functions.TextFunctions.EnglishStopwords
    .map(w => s"'$w'").mkString(", ")

  private def featureSql: (Seq[String], String) = {
    val nib1 = "strpos('0123456789abcdef', substr(md5('1:' || source), 1, 1)) - 1"
    val nib2 = "strpos('0123456789abcdef', substr(md5('1:' || source), 2, 1)) - 1"
    val cols = Seq(
      "CAST(1 AS BIGINT) AS x0",
      "CAST(floor(n_chars / 100.0) AS BIGINT) AS x1",
      "CAST(floor(len(string_split(text, ' ')) / 10.0) AS BIGINT) AS x2",
      s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($StopList))) AS BIGINT) AS x3",
      "CAST(floor(CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))) AS BIGINT) AS x4") ++
      (0 until 16).map { b =>
        s"CASE WHEN $nib1 = $b THEN (CASE WHEN $nib2 < 8 THEN 1 ELSE -1 END) " +
          s"ELSE 0 END AS x${5 + b}"
      }
    val names = (0 until 21).map(i => s"x$i")
    (names, cols.mkString(",\n       "))
  }

  /** SQL for [[documentQualityLabel]] — mirrored op by op. */
  private def labelSql: String = {
    val ntok = "CAST(len(string_split(text, ' ')) AS DOUBLE)"
    val stops = s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($StopList))) AS DOUBLE)"
    s"CASE WHEN least($ntok / 200.0, 1.0) * 0.4" +
      s" + greatest(0.0, 1.0 - abs(CAST(length(text) AS DOUBLE) / $ntok - 5.0) / 5.0) * 0.4" +
      s" + least($stops / $ntok * 5.0, 1.0) * 0.2 >= 0.5 THEN 1.0 ELSE 0.0 END"
  }

  /** Unrolled-epoch CTE chain: f (features+label+fold), tr (train fold),
    * n, w0 (zeros), then per epoch e{k} (gradient sums) and w{k} (updated
    * weights). Returns (ctes, finalWeightCte). */
  def trainingCtes(lr: Double, epochs: Int, folds: Int,
                   testFold: Int): (String, String) = {
    val (xs, featCols) = featureSql
    val d = xs.size
    val f =
      s"""f AS (
         |  SELECT doc_id,
         |       $featCols,
         |       $labelSql AS y,
         |       ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % $folds AS fold
         |  FROM documents)""".stripMargin
    val tr = s"tr AS (SELECT * FROM f WHERE fold <> $testFold)"
    val nC = "nn AS (SELECT count(*) AS n FROM tr)"
    val w0 = "w0 AS (SELECT " +
      xs.indices.map(i => s"0.0 AS w$i").mkString(", ") + ")"
    val steps = (1 to epochs).flatMap { k =>
      val z = xs.indices.map(i => s"w.w$i * x$i").mkString(" + ")
      val e =
        s"""e$k AS (
           |  SELECT ${xs.indices.map(i =>
               s"sum(CAST(floor(((0.5 + 0.5 * (z / (1 + abs(z)))) - y) * x$i * 1000000.0 + 0.5) AS BIGINT)) AS g$i")
             .mkString(",\n         ")}
           |  FROM (SELECT tr.*, ($z) AS z FROM tr, w${k - 1} w))""".stripMargin
      val w =
        s"""w$k AS (SELECT ${xs.indices.map(i =>
             s"w.w$i - $lr * ((CAST(e.g$i AS DOUBLE) / 1000000.0) / CAST(nn.n AS DOUBLE)) AS w$i")
           .mkString(", ")}
           |  FROM w${k - 1} w, e$k e, nn)""".stripMargin
      Seq(e, w)
    }
    ((Seq(f, tr, nC, w0) ++ steps).mkString(",\n"), s"w$epochs")
  }

  /** Oracle for `quality_classifier_coeffs`: the replayed training run's
    * final weights as (feature, weight) rows. */
  def coeffsOracleSql(featureNames: Seq[String], lr: Double, epochs: Int,
                      folds: Int, testFold: Int): String = {
    val (ctes, wFin) = trainingCtes(lr, epochs, folds, testFold)
    val rows = featureNames.zipWithIndex.map { case (nm, i) =>
      s"SELECT '$nm' AS feature, round(w$i, 6) + 0.0 AS weight FROM $wFin"
    }
    s"WITH $ctes\n${rows.mkString("\nUNION ALL\n")}\nORDER BY feature"
  }

  /** Oracle for `curation_scored_batch`: the replayed training run's
    * weights applied to EVERY document — per-doc quantized score, keep
    * verdict, and teacher label, with the epoch each doc arrived in
    * (the gate feeds micro-batches by doc_id mod `batches`). */
  def scoredBatchOracleSql(lr: Double, epochs: Int, folds: Int,
                           testFold: Int, batches: Int): String = {
    val (ctes, wFin) = trainingCtes(lr, epochs, folds, testFold)
    val z = featureSql._1.indices.map(i => s"w.w$i * x$i").mkString(" + ")
    s"""WITH $ctes
       |SELECT f.doc_id, CAST(f.doc_id % $batches AS BIGINT) AS epoch,
       |       CAST(floor(($z) * 1000000.0) AS BIGINT) AS zq,
       |       CAST(floor(($z) * 1000000.0) AS BIGINT) >= 0 AS kept,
       |       y = 1.0 AS teacher
       |FROM f, $wFin w
       |ORDER BY f.doc_id""".stripMargin
  }

  /** Oracle for `quality_classifier_auc`: score the HELD-OUT fold with
    * the replayed weights (zq = floor(z·10⁶) — monotone, engine-exact)
    * and run the exact tie-corrected AUC identity. */
  def aucOracleSql(lr: Double, epochs: Int, folds: Int,
                   testFold: Int): String = {
    val (ctes, wFin) = trainingCtes(lr, epochs, folds, testFold)
    val z = featureSql._1.indices.map(i => s"w.w$i * x$i").mkString(" + ")
    s"""WITH $ctes,
       |te AS (SELECT f.*, CAST(floor(($z) * 1000000.0) AS BIGINT) AS zq
       |       FROM f, $wFin w WHERE fold = $testFold AND ($z) IS NOT NULL),
       |s AS (SELECT zq,
       |             sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS pos,
       |             sum(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS neg
       |      FROM te GROUP BY 1),
       |c AS (SELECT pos, neg, sum(neg) OVER (ORDER BY zq) - neg AS neg_lt FROM s)
       |SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
       |       round(sum(pos * (2 * neg_lt + neg)) / (2.0 * sum(pos) * sum(neg)), 6) AS auc
       |FROM c""".stripMargin
  }
}
