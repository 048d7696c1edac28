package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.VecAggExprs

/** Distributed dimensionality reduction over an embedding column: exact
  * PCA via a one-pass covariance aggregate, and Johnson–Lindenstrauss
  * random projection with an engine-reproducible sign matrix.
  *
  * Scale shape — both ops are the textbook two-tier decomposition:
  *   - the DATA pass is a single scan. PCA's covariance is ONE aggregate
  *     whose buffer is d + d² doubles ([[graft.plans.VecAggExprs]] — map-
  *     side partials, wire cost independent of row count); JL's matrix is
  *     k×d broadcast literals folded per row inside codegen (no shuffle
  *     at all).
  *   - the MODEL step (eigendecomposition) runs on the driver over the
  *     d×d covariance — d is the embedding width (64 here, ≤ a few
  *     thousand anywhere), never the row count. This is the same
  *     driver/executor split Spark MLlib's PCA uses; re-deriving it from
  *     the moments primitive keeps the whole pipeline declarative and
  *     lets the covariance re-use the engine's sketch/rollup machinery.
  *
  * Determinism: the JL sign matrix is md5-derived (`md5("i_j")` first hex
  * nibble < '8' → +1 else −1), so ANY engine rebuilds it bit-identically —
  * the same content-hash trick the sampling/split family uses
  * ([[graft.queries.SamplingOps]]); DuckDB replays the full projection in
  * the `jl_projection` oracle. The Jacobi eigensolver is cyclic with a
  * fixed sweep order and a deterministic sign convention, so PCA models
  * are reproducible across runs and partitionings.
  */
object Projection {

  /** (n, rawMean, covariance) of the first `dim` coordinates, one pass.
    * Population covariance from raw moments: cov(i,j) = E[xᵢxⱼ] −
    * E[xᵢ]E[xⱼ] — fine at embedding magnitudes (|x| ≲ few units). */
  def covariance(df: DataFrame, vecCol: String, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    VecAggExprs.install(df.sparkSession)
    val x = transform(slice(col(vecCol), 1, dim), _.cast("double"))
    val outer = flatten(transform(x, xi => transform(x, xj => xi * xj)))
    // count(x), not count(*): graft_vec_sum skips null-vector rows, so the
    // divisor must too or every covariance deflates when nulls exist
    val row = df.select(x.as("x"), outer.as("xx"))
      .agg(VecAggExprs.vecSum(col("x")).as("sx"),
        VecAggExprs.vecSum(col("xx")).as("sxx"),
        count(col("x")).as("n"))
      .head()
    val n = row.getLong(2)
    require(n > 0, "covariance over an empty frame") // before the buffer
    // reads: graft_vec_sum over zero rows is null, getSeq would NPE first
    val sx = row.getSeq[Double](0).toArray
    val sxx = row.getSeq[Double](1).toArray
    val mean = sx.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) => sxx(i * dim + j) / n - mean(i) * mean(j))
    (n, mean, cov)
  }

  /** floor(x·scale + 0.5) per coordinate — quantizes a float vector to
    * INTEGER-valued doubles with a formula every engine computes
    * bit-identically (cast, multiply, add, floor: four IEEE ops, no
    * rounding-mode ambiguity; DuckDB mirror:
    * `floor(CAST(e[i] AS DOUBLE) * scale + 0.5)`). Sums of integers stay
    * EXACT under any aggregation order below 2⁵³ — which is what makes a
    * cross-engine gate independent of float summation order: a raw double
    * sum folds left-to-right in one engine, pairwise in another, and a
    * 6-dp rounding boundary can flip on a 1-ulp difference. */
  def quantizeVec(vec: Column, scale: Double): Column =
    transform(vec, x => floor(x.cast("double") * scale + lit(0.5)).cast("double"))

  /** Covariance as rows (i, j, cov) with 1-based indices — the
    * DuckDB-oracle-friendly readout of [[covariance]].
    *
    * `quantScale = Some(s)`: coordinates are quantized via
    * [[quantizeVec]] BEFORE the moments pass and the covariance divided
    * by s² after — the whole statistic becomes exact-integer arithmetic
    * until the final three divisions, so the gate comparison cannot
    * depend on which order either engine summed 128k doubles. At scale s
    * and row count n the exactness bound is s²·max|x|²·n < 2⁵³ (s = 10⁴,
    * |x| ≤ 1, n ≤ 10⁹ — widen s down / shard up past that). */
  def covarianceDF(df: DataFrame, vecCol: String, dim: Int, roundTo: Int = 6,
                   quantScale: Option[Double] = None): DataFrame = {
    val src = quantScale match {
      case Some(s) => df.withColumn(vecCol, quantizeVec(col(vecCol), s))
      case None => df
    }
    val (_, _, cov) = covariance(src, vecCol, dim)
    val div = quantScale.map(s => s * s).getOrElse(1.0)
    val rows = for (i <- 0 until dim; j <- 0 until dim)
      yield (i + 1, j + 1, BigDecimal(cov(i)(j) / div).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble)
    df.sparkSession.createDataFrame(rows).toDF("i", "j", "cov")
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi rotations.
    * Returns (eigenvalues, eigenvectors as ROWS), sorted by eigenvalue
    * descending, each vector sign-fixed (largest-|component| positive) —
    * fully deterministic. O(d³) on the driver; d = vector width. */
  def jacobiEigen(a0: Array[Array[Double]], maxSweeps: Int = 100,
                  tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // t = tan(rotation): the stable root of t² + 2tθ − 1 = 0
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // sort by eigenvalue desc (tie → original index), sign-fix each vector
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val eigs = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      val m = col.indices.maxBy(j => (math.abs(col(j)), -j))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (eigs, vecs)
  }

  /** PCA model over the first `dim` coordinates: mean, ALL `dim`
    * eigenvalues (desc), top-`k` components as rows. */
  case class PcaModel(n: Long, mean: Array[Double], eigenvalues: Array[Double],
                      components: Array[Array[Double]])

  def pcaFit(df: DataFrame, vecCol: String, dim: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dim, s"pcaFit needs 1 <= k <= dim, got k=$k dim=$dim")
    val (n, mean, cov) = covariance(df, vecCol, dim)
    val (eigs, vecs) = jacobiEigen(cov)
    PcaModel(n, mean, eigs, vecs.take(k))
  }

  /** Project each vector onto the model's components: appends
    * `array<double>` column `outCol` of length k. Centered dot products
    * fold left-to-right per component — pure codegen, no shuffle. */
  def pcaProject(df: DataFrame, model: PcaModel, vecCol: String,
                 outCol: String = "pc"): DataFrame = {
    val dim = model.mean.length
    val x = transform(slice(col(vecCol), 1, dim), _.cast("double"))
    val centered = zip_with(x, array(model.mean.map(lit): _*), (a, b) => a - b)
    val comps = model.components.map { comp =>
      aggregate(zip_with(centered, array(comp.map(lit): _*), (a, b) => a * b),
        lit(0.0), (acc, t) => acc + t)
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Covariance read off MAINTAINED moments state
    * ([[Sketches.updateMomentsRollup]]): one row per (group, i, j) with
    * 1-based indices, cov rounded at the cross-engine fixed point. The
    * state is |groups| rows of d + d² doubles — this readout (and any
    * [[jacobiEigen]] over it) is driver-bounded and never re-reads
    * facts. */
  def covarianceFromState(spark: org.apache.spark.sql.SparkSession,
                          table: String, groupCols: Seq[String], dim: Int,
                          roundTo: Int = 6,
                          quantScale: Option[Double] = None): DataFrame = {
    // quantScale: the state was maintained over quantizeVec(_, s) vectors
    // (exact integer moments); divide the covariance back by s² here —
    // same cross-engine-exactness contract as covarianceDF
    val qdiv = quantScale.map(s => s * s).getOrElse(1.0)
    val scanned = CommitLog.scan(spark, table)
      .select(groupCols.map(col) ++ Seq(col("n_rows"), col("sx"), col("sxx")): _*)
    val rows = scanned.collect()
    val out = rows.flatMap { r =>
      val g = groupCols.indices.map(r.get)
      val n = r.getLong(groupCols.size)
      // a group whose every vector was null has no moments (n=0, null
      // arrays) — it has no covariance either: skip, don't NPE/NaN
      if (n == 0 || r.isNullAt(groupCols.size + 1)) Nil
      else {
      val sx = r.getSeq[Double](groupCols.size + 1)
      val sxx = r.getSeq[Double](groupCols.size + 2)
      require(sx.length == dim && sxx.length == dim * dim,
        s"state width ${sx.length} does not match dim=$dim — read with the " +
          "dim the rollup was maintained with")
      for (i <- 0 until dim; j <- 0 until dim) yield
        // Seq[Any]: a bare Seq(int, int, double) would WIDEN the ints to
        // Double (weak conformance) and break the IntegerType schema
        org.apache.spark.sql.Row.fromSeq(g ++ Seq[Any](i + 1, j + 1,
          BigDecimal((sxx(i * dim + j) / n - (sx(i) / n) * (sx(j) / n)) / qdiv)
            .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }
    val base = org.apache.spark.sql.types.StructType(
      scanned.schema.fields.take(groupCols.size))
    val schema = org.apache.spark.sql.types.StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("j", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("cov", org.apache.spark.sql.types.DoubleType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.toList.asJava, schema)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The deterministic ±1 JL matrix: r(i)(j) = +1 iff the first hex
    * nibble of md5("{i}_{j}") < '8' (1-based i ≤ k, j ≤ d) — E[r]=0,
    * engine-reproducible (DuckDB: `substr(md5(i||'_'||j),1,1) < '8'`). */
  def jlSignMatrix(k: Int, d: Int): Array[Array[Double]] =
    Array.tabulate(k, d)((i, j) =>
      if (md5hex(s"${i + 1}_${j + 1}").charAt(0) < '8') 1.0 else -1.0)

  /** Johnson–Lindenstrauss projection to k dims: appends `array<double>`
    * column `outCol`, entries (Σⱼ xⱼ·rᵢⱼ)/√k. The matrix ships as k×d
    * broadcast literals; the fold runs inside whole-stage codegen. */
  def jlProject(df: DataFrame, vecCol: String, dim: Int, k: Int,
                outCol: String = "proj"): DataFrame = {
    val m = jlSignMatrix(k, dim)
    val x = transform(slice(col(vecCol), 1, dim), _.cast("double"))
    val scale = math.sqrt(k.toDouble)
    val comps = m.map { rowI =>
      aggregate(zip_with(x, array(rowI.map(lit): _*), (a, b) => a * b),
        lit(0.0), (acc, t) => acc + t) / scale
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** [[jlProject]] over [[quantizeVec]]-quantized coordinates: each
    * component accumulates Σⱼ qⱼ·rᵢⱼ as an exact LONG (r = ±1, so the fold
    * is pure integer adds inside codegen), then divides by scale·√k once.
    * Same projection to within quantization error (≤ d/(2·scale·√k) per
    * entry), but the result is bit-identical across engines and
    * aggregation orders — this is the variant gates compare against a
    * DuckDB replay ([[graft.queries.RankProjOps]] `jl_projection`). */
  def jlProjectQuantized(df: DataFrame, vecCol: String, dim: Int, k: Int,
                         scale: Double, outCol: String = "proj"): DataFrame = {
    val m = jlSignMatrix(k, dim)
    val q = transform(slice(col(vecCol), 1, dim),
      x => floor(x.cast("double") * scale + lit(0.5)))
    val rootK = math.sqrt(k.toDouble)
    val comps = m.map { rowI =>
      val signs = array(rowI.map(r => lit(r.toLong)): _*)
      (aggregate(zip_with(q, signs, (a, b) => a * b),
        lit(0L), (acc, t) => acc + t).cast("double") / scale) / rootK
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
