package graft

import graft.operators.{Evaluation, Features, QualityModel}
import org.apache.spark.sql.functions._

/** The trained quality classifier: deterministic full-batch GD with
  * exact integer gradient sums, held-out discrimination, and the
  * degenerate-input contracts. Gate parity with the DuckDB-replayed
  * training run lives in `quality_classifier_*`. */
class QualityModelSpec extends GraftSuite {

  private lazy val docs = graft.core.Tables.documents(spark, sf)
  private lazy val feats = QualityModel.documentFeatures
  private lazy val label = QualityModel.documentQualityLabel

  test("training is deterministic run-to-run (exact weight equality)") {
    val w1 = QualityModel.trainLogistic(docs, feats, label, lr = 0.5, epochs = 3)
    val w2 = QualityModel.trainLogistic(docs, feats, label, lr = 0.5, epochs = 3)
    assert(w1 == w2, "integer-gradient GD must be bit-reproducible")
  }

  test("training reduces the squared-error loss epoch over epoch") {
    def loss(w: Seq[Double]): Double = {
      val z = QualityModel.scoreExpr(feats, w)
      val p = QualityModel.fastSigmoid(z)
      val y = when(label, 1.0).otherwise(0.0)
      docs.select(avg((p - y) * (p - y))).head().getDouble(0)
    }
    val losses = (0 to 6 by 2).map(e =>
      loss(if (e == 0) Seq.fill(feats.size)(0.0)
      else QualityModel.trainLogistic(docs, feats, label, lr = 0.5, epochs = e)))
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss did not decrease: $losses")
    }
  }

  test("held-out AUC of the distilled scorer beats 0.9") {
    val fold = Features.foldOf(col("doc_id"), 5)
    val w = QualityModel.trainLogistic(docs.filter(fold =!= 0), feats, label,
      lr = 0.5, epochs = 6)
    val zq = floor(QualityModel.scoreExpr(feats, w) * lit(1000000.0))
    val auc = Evaluation
      .aucExact(docs.filter(fold === 0).withColumn("zq", zq), col("zq"), label)
      .head().getDouble(2)
    assert(auc > 0.9, s"held-out AUC $auc — the scorer failed to learn the rule")
  }

  test("degenerate inputs fail loudly") {
    intercept[IllegalArgumentException] {
      QualityModel.trainLogistic(docs, feats, label, lr = 0.0, epochs = 3)
    }
    intercept[IllegalArgumentException] {
      QualityModel.trainLogistic(docs, feats, label, lr = 0.5, epochs = 0)
    }
    intercept[IllegalArgumentException] {
      QualityModel.trainLogistic(docs.limit(0), feats, label, lr = 0.5, epochs = 1)
    }
  }
}
