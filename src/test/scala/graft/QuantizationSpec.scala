package graft

import graft.core.Tables
import graft.operators.Quantization
import org.apache.spark.sql.functions._

class QuantizationSpec extends GraftSuite {

  private lazy val vecs = Tables.embeddings(spark, sf)
  private lazy val cb = Quantization.pqTrain(vecs, m = 8, k = 32, iters = 2)
  private lazy val query = vecs.filter(col("vec_id") === 0)
    .select(col("embedding")).head().getSeq[Float](0)

  test("pq codebooks: 8 subspaces, deterministic across re-trains, centroids 8-dim") {
    assert(cb.size == 8)
    cb.foreach { cents =>
      assert(cents.nonEmpty && cents.size <= 32)
      cents.foreach { case (_, c) => assert(c.size == 8) }
    }
    val cb2 = Quantization.pqTrain(vecs, m = 8, k = 32, iters = 2)
    assert(cb == cb2, "pq training is not deterministic")
  }

  test("pq k-means‖ training: deterministic, quantization error <= first-k's") {
    val cbPar = cb // ‖ is the default since r13
    assert(cbPar == Quantization.pqTrain(vecs, m = 8, k = 32, iters = 2),
      "k-means‖ pq training is not deterministic")
    val cbFirst = Quantization.pqTrain(vecs, m = 8, k = 32, iters = 2,
      parallelInit = false)
    // total quantization error (exact micro-unit sum of per-subspace d²)
    def err(books: Seq[Seq[(Int, Seq[Double])]]): Long = {
      val codes = Quantization.pqEncode(vecs, books)
      val decoded = books.zipWithIndex.map { case (cents, s) =>
        val m = cents.toMap
        org.apache.spark.sql.functions.element_at(
          org.apache.spark.sql.functions.map(m.toSeq.flatMap { case (cid, c) =>
            Seq(lit(cid), array(c.map(lit): _*))
          }: _*), col(s"c$s"))
      }
      val full = org.apache.spark.sql.functions.flatten(array(decoded: _*))
      val x = org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double"))
      codes.join(vecs.select(col("vec_id"), col("embedding")), "vec_id")
        .select(org.apache.spark.sql.functions.aggregate(
          org.apache.spark.sql.functions.zip_with(x, full, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, t) => acc + t).as("d2"))
        .agg(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.floor(col("d2") * 1e6)))
        .head().getLong(0)
    }
    val ePar = err(cbPar)
    val eFirst = err(cbFirst)
    assert(ePar <= eFirst,
      s"k-means‖ codebooks quantize worse than first-k: $ePar > $eFirst")
  }

  test("pq encode: one shuffle-free projection, codes within codebook range") {
    val codes = Quantization.pqEncode(vecs, cb)
    val phys = codes.queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), s"encode plan shuffles:\n$phys")
    val rows = codes.collect()
    assert(rows.length == vecs.count())
    val valid = cb.map(_.map(_._1).toSet)
    rows.foreach { r =>
      (0 until 8).foreach(s => assert(valid(s).contains(r.getInt(s + 1))))
    }
  }

  test("adc top-k plan: TakeOrderedAndProject over the codes scan, no join") {
    val codes = Quantization.pqEncode(vecs, cb)
    val df = Quantization.adcTopK(codes, cb, query, topK = 20)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), phys)
    assert(!phys.contains("Join"), s"ADC scan must not join:\n$phys")
  }

  test("rerank: shortlist side broadcasts; shortlist >= n degenerates to exact top-k") {
    val codes = Quantization.pqEncode(vecs, cb)
    val df = Quantization.adcRerankTopK(vecs, codes, cb, query,
      shortlist = 200, topK = 20)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), s"shortlist join must broadcast:\n$phys")

    // with the shortlist covering every row, re-rank must equal the exact
    // full-vector L2 top-k
    val n = vecs.count().toInt
    val got = Quantization.adcRerankTopK(vecs, codes, cb, query,
      shortlist = n, topK = 20).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val qd = query.map(_.toDouble)
    val exact = vecs.select(col("vec_id"),
        aggregate(zip_with(transform(col("embedding"), _.cast("double")),
          array(qd.map(lit): _*), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x).as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(20)
      .select(col("vec_id"), round(sqrt(col("d2")), 6).as("dist"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == exact.toSeq)
  }

  test("sq: codes in [0,255], encode shuffle-free, symmetric top-k all-integer") {
    val (lo, sc) = Quantization.sqTrain(vecs)
    assert(lo.size == 64 && sc.size == 64)
    val codes = Quantization.sqEncode(vecs, lo, sc)
    assert(!codes.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = codes.collect()
    rows.foreach(_.getSeq[Int](1).foreach(c => assert(c >= 0 && c <= 255)))

    val top = Quantization.sqTopK(codes, lo, sc, query, topK = 20)
    assert(top.schema("dist_q").dataType.typeName == "long")
    val phys = top.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"), phys)
    // self-row quantizes to its own codes → distance exactly 0, rank 1
    val first = top.head()
    assert(first.getLong(0) == 0L && first.getLong(1) == 0L, first)
  }

  test("adc distance estimate is within the quantization error of the exact distance") {
    val codes = Quantization.pqEncode(vecs, cb)
    // the ADC value for the query's own row: distance from the query to
    // the query's reconstruction — strictly less than any distance the
    // codebooks cannot express; sanity: self-row ranks first
    val top = Quantization.adcTopK(codes, cb, query, topK = 1).head()
    assert(top.getLong(0) == 0L, s"query row did not rank first: $top")
  }
}
