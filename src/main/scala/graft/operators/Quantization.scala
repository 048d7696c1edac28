package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-side companion to
  * [[Similarity]]'s IVF/LSH ANN: compress each dim-D embedding to M small
  * integer codes (one per D/M-dim subspace, each quantized by its own
  * k-means codebook), then answer top-k queries by Asymmetric Distance
  * Computation (ADC) over the codes alone.
  *
  * Scale design:
  *   - **train** runs M independent deterministic k-means (same fixed-point
  *     conventions as [[Clustering.kmeansAssign]]: lowest-id init, argmin
  *     ties to the lowest cluster id, centroid coordinates rounded to 6
  *     decimals) over a slim (id, subvector) projection — M×iters scans,
  *     each one map-side-combined aggregate; train on a sample at 100 TB
  *     (pass a sampled frame), the codebooks are M×K×(D/M) doubles on the
  *     driver either way;
  *   - **encode** is ONE narrow projection — M argmin expressions over
  *     broadcast-literal centroids, no join, no shuffle; the codes table
  *     stores M small ints per vector (M bytes in parquet after dictionary
  *     encoding) instead of 4·D bytes of floats — a 16× memory cut at the
  *     gate's D=64/M=4 shape, which is what makes a 100 TB corpus's index
  *     fit a cluster's RAM;
  *   - **search (ADC)** precomputes the M×K table of squared distances
  *     from the query's subvectors to every centroid ON THE DRIVER (M×K
  *     doubles — the broadcast), then scans codes summing M literal-array
  *     lookups per row: whole-stage-codegen arithmetic, no vector column
  *     read, and the top-k collapses to TakeOrderedAndProject exactly like
  *     [[operators.Keyset]]'s plans.
  *
  * Cross-engine determinism (what lets DuckDB replay the whole pipeline in
  * the `pq_codes` / `pq_ann_topk` gates): subvector distances fold
  * sequentially in double on both engines (`aggregate`+`zip_with` here,
  * `list_distance` there — the [[Clustering]] trick), the driver-side LUT
  * squares the same sqrt'd double DuckDB squares, and the final ADC sum
  * adds the M lookups in subspace order.
  */
object Quantization {

  /** Squared L2 between a vector column and one literal centroid —
    * sequential double fold (same accumulation order as DuckDB's
    * `list_distance`). */
  private def dist2(v: Column, c: Seq[Double]): Column =
    aggregate(zip_with(v, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** 1-based slice of the (double-cast) vector column for subspace `s`. */
  private def subCol(vecCol: String, s: Int, sub: Int): Column =
    slice(transform(col(vecCol), _.cast("double")), s * sub + 1, sub)

  private def assignExpr(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    // argmin ties must break exactly as DuckDB's list_distance ranks them:
    // two distinct squared distances can round EQUAL after sqrt, so compare
    // sqrt(d2) (the oracle's metric), not d2 — same sqrt-then-square trick
    // as the ADC LUT below
    array_min(array(cents.map { case (cid, c) =>
      struct(sqrt(dist2(v, c)).as("d"), lit(cid).as("cluster"))
    }: _*)).getField("cluster")

  /** Train the M codebooks: for each subspace, `iters` Lloyd rounds from
    * deterministic k-means‖ seeding ([[Clustering.parallelInitFrame]] per
    * subspace — the round-13 default: better spread AND, since the
    * integer rework, SQL-replayable) or, with `parallelInit = false`,
    * from the legacy lowest-k-ids init. Returns, per subspace, the
    * (cid, centroid) list — driver-sized (M×K×(dim/M) doubles).
    *
    * The M subspace trainings are INDEPENDENT (disjoint coordinate
    * slices, no shared state), so they run as concurrent driver threads
    * sharing the scheduler — each training is a chain of small jobs
    * whose per-job floor, not data volume, dominates at gate SFs, and
    * overlapping the chains hides that floor (r14: pq_codes 15 s → the
    * subspace chains overlap ~M-way). Result order and every per-
    * subspace result are unchanged: concurrency only affects WHEN each
    * independent pure computation runs. */
  def pqTrain(vectors: DataFrame, m: Int, k: Int, iters: Int, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding",
              parallelInit: Boolean = true): Seq[Seq[(Int, Seq[Double])]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val sub = dim / m
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val trained = (0 until m).map { s => Future {
      val sv = vectors.select(col(idCol).as("id"), subCol(vecCol, s, sub).as("v"))
      graft.core.Caching.withCached(sv) {
        var cents: Seq[(Int, Seq[Double])] =
          if (parallelInit)
            Clustering.parallelInitFrame(sv, k).zipWithIndex
              .map { case (c, i) => (i, c) }
          else sv.orderBy("id").limit(k).collect()
            .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq
        var it = 0
        while (it < iters) {
          val dimAvgs = (0 until sub).map(j =>
            round(avg(element_at(col("v"), j + 1)), 6).as(s"d$j"))
          cents = sv.withColumn("cluster", assignExpr(col("v"), cents))
            .groupBy("cluster").agg(dimAvgs.head, dimAvgs.tail: _*)
            .collect()
            .map(r => (r.getInt(0), (0 until sub).map(j => r.getDouble(j + 1))))
            .sortBy(_._1).toSeq
          it += 1
        }
        cents
      }
    }}
    trained.map(Await.result(_, scala.concurrent.duration.Duration.Inf))
  }

  /** Encode every vector to its M codes in one projection: columns
    * (idCol, c0..c{m-1} int). No join, no shuffle. */
  def pqEncode(vectors: DataFrame, codebooks: Seq[Seq[(Int, Seq[Double])]],
               dim: Int = 64, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val m = codebooks.size
    val sub = dim / m
    vectors.select(col(idCol) +: codebooks.zipWithIndex.map { case (cents, s) =>
      assignExpr(subCol(vecCol, s, sub), cents).as(s"c$s")
    }: _*)
  }

  /** ADC top-k: driver-side M×K lookup table of squared sub-distances from
    * `query`, then one codes scan summing M literal-array lookups →
    * TakeOrderedAndProject. Returns (idCol, dist) with dist = the rounded
    * ADC distance estimate (sum of per-subspace squared distances). */
  def adcTopK(codes: DataFrame, codebooks: Seq[Seq[(Int, Seq[Double])]],
              query: Seq[Float], topK: Int, dim: Int = 64,
              idCol: String = "vec_id"): DataFrame = {
    val m = codebooks.size
    val sub = dim / m
    val q = query.map(_.toDouble)
    // LUT[s](cid) — sqrt-then-square so the double matches DuckDB's
    // list_distance(q_s, c) * list_distance(q_s, c) bit-for-bit.
    val lut: Seq[Array[Double]] = codebooks.zipWithIndex.map { case (cents, s) =>
      val qs = q.slice(s * sub, (s + 1) * sub)
      val arr = new Array[Double](cents.map(_._1).max + 1)
      cents.foreach { case (cid, c) =>
        val sd = math.sqrt(qs.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
          acc + (x - y) * (x - y) })
        arr(cid) = sd * sd
      }
      arr
    }
    val adc = (0 until m).map { s =>
      element_at(array(lut(s).map(lit).toIndexedSeq: _*), col(s"c$s") + 1)
    }.reduceLeft(_ + _)
    codes.select(col(idCol), adc.as("adc"))
      .orderBy(col("adc"), col(idCol))
      .limit(topK)
      .select(col(idCol), round(col("adc"), 6).as("dist"))
  }

  /** ADC-shortlist + exact re-rank (the standard PQ recall rescue, Jégou
    * et al. §V): take the `shortlist` best rows by ADC over codes alone,
    * then re-rank JUST those by exact full-vector L2 and keep `topK`.
    * The shortlist side is `limit`-bounded, so the join back to the
    * vectors broadcasts it — the full-vector column is only ever read for
    * `shortlist` rows, which is the whole point at 100 TB. Output dist is
    * the exact L2 (round 6), directly comparable to DuckDB's
    * `list_distance`. */
  def adcRerankTopK(vectors: DataFrame, codes: DataFrame,
                    codebooks: Seq[Seq[(Int, Seq[Double])]], query: Seq[Float],
                    shortlist: Int, topK: Int, dim: Int = 64,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sl = adcTopK(codes, codebooks, query, shortlist, dim, idCol).select(idCol)
    val qd = query.map(_.toDouble)
    val d2 = aggregate(zip_with(transform(col(vecCol), _.cast("double")),
      array(qd.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    vectors.join(broadcast(sl), idCol)
      .select(col(idCol), d2.as("d2"))
      .orderBy(col("d2"), col(idCol)).limit(topK)
      .select(col(idCol), round(sqrt(col("d2")), 6).as("dist"))
  }

  // ------------------------------------------------------------------
  // Scalar (int8) quantization — the near-lossless compression tier
  // ------------------------------------------------------------------

  /** Per-dimension linear int8 quantization parameters: (lo, scale) per
    * dim, from one min/max pass. min/max are order-independent, so the
    * values are exact on any engine — no fixed-point rounding needed. */
  def sqTrain(vectors: DataFrame, dim: Int = 64,
              vecCol: String = "embedding"): (Seq[Double], Seq[Double]) = {
    val v = transform(col(vecCol), _.cast("double"))
    val aggs = (0 until dim).flatMap(j => Seq(
      min(element_at(v, j + 1)).as(s"lo$j"), max(element_at(v, j + 1)).as(s"hi$j")))
    val r = vectors.agg(aggs.head, aggs.tail: _*).head()
    val lo = (0 until dim).map(j => r.getDouble(2 * j))
    val scale = (0 until dim).map(j => (r.getDouble(2 * j + 1) - r.getDouble(2 * j)) / 255.0)
    (lo, scale)
  }

  /** Encode each vector to 64 int8-range codes — one shuffle-free
    * projection: code_j = round((x_j − lo_j)/scale_j) ∈ [0, 255] (4× over
    * float32, 8× over the double the engine would otherwise compare in).
    * Constant dims (scale 0) encode as 0. */
  def sqEncode(vectors: DataFrame, lo: Seq[Double], scale: Seq[Double],
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), _.cast("double"))
    val codes = array(lo.indices.map { j =>
      if (scale(j) == 0.0) lit(0)
      else round((element_at(v, j + 1) - lit(lo(j))) / lit(scale(j)), 0).cast("int")
    }: _*)
    vectors.select(col(idCol), codes.as("codes"))
  }

  /** Symmetric quantized top-k: the query quantizes with the same (lo,
    * scale); distance is Σ_j (code_j − qcode_j)² · w_j with
    * w_j = round(scale_j²·10¹²) — ALL-INTEGER arithmetic, so the ranking
    * is bit-exact on any engine and any aggregation order (the property
    * the PQ path needs ordered-fold tricks for). One codes scan →
    * TakeOrderedAndProject. */
  def sqTopK(codes: DataFrame, lo: Seq[Double], scale: Seq[Double],
             query: Seq[Float], topK: Int,
             idCol: String = "vec_id"): DataFrame = {
    val qc = lo.indices.map { j =>
      if (scale(j) == 0.0) 0L
      else math.round((query(j).toDouble - lo(j)) / scale(j))
    }
    val w = scale.map(s => math.round(s * s * 1e12))
    val d = lo.indices.map { j =>
      val diff = element_at(col("codes"), j + 1).cast("long") - lit(qc(j))
      diff * diff * lit(w(j))
    }.reduceLeft(_ + _)
    codes.select(col(idCol), d.as("dist_q"))
      .orderBy(col("dist_q"), col(idCol))
      .limit(topK)
  }

  /** DuckDB replication of [[sqTrain]]+[[sqEncode]], exploded to
    * (idCol, dim, code) rows so every code is value-verified. */
  def sqCodesOracleSql(table: String = "embeddings", idCol: String = "vec_id",
                       vecCol: String = "embedding"): String =
    s"""WITH v AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS fv FROM $table),
       |e AS (SELECT id, generate_subscripts(fv, 1) AS j, unnest(fv) AS x FROM v),
       |mm AS (SELECT j, min(x) AS lo, max(x) AS hi FROM e GROUP BY j)
       |SELECT e.id AS $idCol, CAST(e.j - 1 AS INT) AS dim,
       |  CAST(CASE WHEN mm.hi = mm.lo THEN 0
       |    ELSE round((e.x - mm.lo) / ((mm.hi - mm.lo) / 255.0)) END AS INT) AS code
       |FROM e JOIN mm USING (j)
       |ORDER BY $idCol, dim""".stripMargin

  /** DuckDB replication of the symmetric int8 top-k for `queryId` — the
    * same all-integer distance, summed unordered (exactness needs no
    * order). */
  def sqAnnOracleSql(topK: Int, queryId: Long, table: String = "embeddings",
                     idCol: String = "vec_id", vecCol: String = "embedding"): String =
    s"""WITH v AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS fv FROM $table),
       |e AS (SELECT id, generate_subscripts(fv, 1) AS j, unnest(fv) AS x FROM v),
       |mm AS (SELECT j, min(x) AS lo, max(x) AS hi FROM e GROUP BY j),
       |w AS (SELECT j, lo, (hi - lo) / 255.0 AS sc,
       |  CAST(round(((hi - lo) / 255.0) * ((hi - lo) / 255.0) * 1e12) AS BIGINT) AS wj
       |  FROM mm),
       |codes AS (SELECT id, e.j, CASE WHEN w.sc = 0 THEN 0
       |    ELSE CAST(round((e.x - w.lo) / w.sc) AS BIGINT) END AS c
       |  FROM e JOIN w USING (j)),
       |q AS (SELECT j, c AS qc FROM codes WHERE id = $queryId),
       |d AS (SELECT codes.id, sum((c - qc) * (c - qc) * wj) AS dist_q
       |  FROM codes JOIN q USING (j) JOIN w USING (j) GROUP BY codes.id)
       |SELECT id AS $idCol, CAST(dist_q AS BIGINT) AS dist_q
       |FROM d ORDER BY dist_q, id LIMIT $topK""".stripMargin

  /** DuckDB verification of the SQ recall contract (same structure as
    * [[pqCheckOracleSql]]: both sides replayed inside the oracle). */
  def sqCheckOracleSql(topK: Int, queryId: Long, minHits: Int,
                       table: String = "embeddings", idCol: String = "vec_id",
                       vecCol: String = "embedding"): String =
    s"""WITH v AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS fv FROM $table),
       |e AS (SELECT id, generate_subscripts(fv, 1) AS j, unnest(fv) AS x FROM v),
       |mm AS (SELECT j, min(x) AS lo, max(x) AS hi FROM e GROUP BY j),
       |w AS (SELECT j, lo, (hi - lo) / 255.0 AS sc,
       |  CAST(round(((hi - lo) / 255.0) * ((hi - lo) / 255.0) * 1e12) AS BIGINT) AS wj
       |  FROM mm),
       |codes AS (SELECT id, e.j, CASE WHEN w.sc = 0 THEN 0
       |    ELSE CAST(round((e.x - w.lo) / w.sc) AS BIGINT) END AS c
       |  FROM e JOIN w USING (j)),
       |q AS (SELECT j, c AS qc FROM codes WHERE id = $queryId),
       |sqtop AS (SELECT codes.id FROM codes JOIN q USING (j) JOIN w USING (j)
       |  GROUP BY codes.id
       |  ORDER BY sum((c - qc) * (c - qc) * wj), codes.id LIMIT $topK),
       |exact AS (SELECT id FROM (
       |  SELECT b.id, list_distance(b.fv, (SELECT fv FROM v WHERE id = $queryId)) AS ed
       |  FROM v b) ORDER BY ed, id LIMIT $topK)
       |SELECT $topK AS exact_n,
       |  (SELECT count(*) FROM sqtop JOIN exact USING (id)) >= $minHits AS sq_recall_ok
       |""".stripMargin

  // ------------------------------------------------------------------
  // DuckDB replication (gate oracles)
  // ------------------------------------------------------------------

  /** Per-subspace replayed-k-means CTEs (the [[Clustering.kmeansOracleCtes]]
    * pattern with an `s{i}_` prefix and a list_slice source), plus the
    * final-assignment subquery per subspace. Each subspace's c0 replays
    * its own integer k-means‖ seeding (matching [[pqTrain]]'s default). */
  private def subspaceCtes(m: Int, k: Int, iters: Int, sub: Int,
                           table: String, idCol: String,
                           vecCol: String): (String, Seq[String]) = {
    val base =
      s"base AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS fv FROM $table)"
    val perSub = (0 until m).map { s =>
      val p = s"s${s}_"
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      val (seedCtes, seedFin) = Clustering.kmeansParallelInitCtes(
        s"${p}kp_", s"SELECT id, fv[$lo:$hi] AS v FROM base", k)
      val init =
        s"""$seedCtes,
           |${p}c0 AS (SELECT CAST(step AS INT) AS cluster,
           |  list_transform(c, q -> CAST(q AS DOUBLE)/1000000.0) AS c FROM $seedFin)""".stripMargin
      def assign(i: Int) =
        s"""(SELECT id, cluster, d FROM (
           |    SELECT b.id, c.cluster, list_distance(b.fv[$lo:$hi], c.c) AS d,
           |      row_number() OVER (PARTITION BY b.id ORDER BY list_distance(b.fv[$lo:$hi], c.c), c.cluster) AS rn
           |    FROM base b CROSS JOIN ${p}c$i c) WHERE rn = 1)""".stripMargin
      val steps = (0 until iters).map { i =>
        s"""${p}a$i AS ${assign(i)},
           |${p}c${i + 1} AS (SELECT cluster, list(mn ORDER BY j) AS c FROM (
           |    SELECT cluster, j, round(avg(x), 6) AS mn FROM (
           |      SELECT a.cluster AS cluster, generate_subscripts(b.fv[$lo:$hi], 1) AS j, unnest(b.fv[$lo:$hi]) AS x
           |      FROM ${p}a$i a JOIN base b USING (id)) GROUP BY cluster, j) GROUP BY cluster)""".stripMargin
      }
      ((init +: steps).mkString(",\n"), assign(iters))
    }
    (( base +: perSub.map(_._1)).mkString(",\n"), perSub.map(_._2))
  }

  /** DuckDB replication of [[pqTrain]]+[[pqEncode]]: one row per vector,
    * columns (idCol, c0..c{m-1}). */
  def pqCodesOracleSql(m: Int, k: Int, iters: Int, dim: Int = 64,
                       table: String = "embeddings", idCol: String = "vec_id",
                       vecCol: String = "embedding"): String = {
    val sub = dim / m
    val (ctes, finals) = subspaceCtes(m, k, iters, sub, table, idCol, vecCol)
    val joins = finals.zipWithIndex.map { case (f, s) => s"f$s AS $f" }.mkString(",\n")
    val cols = (0 until m).map(s => s"f$s.cluster AS c$s").mkString(", ")
    val from = (1 until m).foldLeft("f0") { (acc, s) => s"$acc JOIN f$s USING (id)" }
    s"""WITH $ctes,
       |$joins
       |SELECT id AS $idCol, $cols
       |FROM $from
       |ORDER BY $idCol""".stripMargin
  }

  /** Shared ADC-replay scaffolding: (all CTEs through luts, the codes
    * FROM clause with LUT joins, the ADC sum expression). */
  private def adcScaffold(m: Int, k: Int, iters: Int, queryId: Long, dim: Int,
                          table: String, idCol: String,
                          vecCol: String): (String, String, String) = {
    val sub = dim / m
    val (ctes, finals) = subspaceCtes(m, k, iters, sub, table, idCol, vecCol)
    val codeCtes = finals.zipWithIndex.map { case (f, s) => s"f$s AS $f" }.mkString(",\n")
    val luts = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      s"""lut$s AS (SELECT t.cluster AS cid, t.sd * t.sd AS d FROM (
         |  SELECT cluster, list_distance(
         |    (SELECT fv[$lo:$hi] FROM base WHERE id = $queryId), c) AS sd
         |  FROM s${s}_c$iters) t)""".stripMargin
    }.mkString(",\n")
    val lutJoins = (0 until m)
      .map(s => s"JOIN lut$s l$s ON l$s.cid = f$s.cluster").mkString(" ")
    val from = (1 until m).foldLeft("f0") { (acc, s) => s"$acc JOIN f$s USING (id)" }
    val adc = (0 until m).map(s => s"l$s.d").mkString(" + ")
    (s"$ctes,\n$codeCtes,\n$luts", s"$from $lutJoins", adc)
  }

  /** DuckDB replication of the pure-ADC PQ ANN for the query vector of
    * `queryId`: replayed codebooks + codes, per-subspace LUT from the same
    * squared `list_distance`, ADC sum in subspace order, top-k. */
  def pqAnnOracleSql(m: Int, k: Int, iters: Int, topK: Int, queryId: Long,
                     dim: Int = 64, table: String = "embeddings",
                     idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val (ctes, from, adc) = adcScaffold(m, k, iters, queryId, dim, table, idCol, vecCol)
    s"""WITH $ctes
       |SELECT id AS $idCol, round($adc, 6) AS dist
       |FROM $from
       |ORDER BY $adc, id
       |LIMIT $topK""".stripMargin
  }

  /** DuckDB replication of [[adcRerankTopK]]: ADC shortlist, exact
    * `list_distance` re-rank of just those rows, top-k. */
  def pqRerankOracleSql(m: Int, k: Int, iters: Int, shortlist: Int, topK: Int,
                        queryId: Long, dim: Int = 64, table: String = "embeddings",
                        idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val (ctes, from, adc) = adcScaffold(m, k, iters, queryId, dim, table, idCol, vecCol)
    s"""WITH $ctes,
       |sl AS (SELECT id FROM $from ORDER BY $adc, id LIMIT $shortlist)
       |SELECT b.id AS $idCol,
       |  round(list_distance(b.fv, (SELECT fv FROM base WHERE id = $queryId)), 6) AS dist
       |FROM base b JOIN sl USING (id)
       |ORDER BY list_distance(b.fv, (SELECT fv FROM base WHERE id = $queryId)), b.id
       |LIMIT $topK""".stripMargin
  }

  /** DuckDB verification of the PQ recall contract: replays the
    * shortlist-and-re-rank top-k AND the exact full-vector L2 top-k, then
    * computes the overlap — the recall boolean is DuckDB-derived, not a
    * trusted Spark claim. */
  def pqCheckOracleSql(m: Int, k: Int, iters: Int, shortlist: Int, topK: Int,
                       queryId: Long, minHits: Int, dim: Int = 64,
                       table: String = "embeddings", idCol: String = "vec_id",
                       vecCol: String = "embedding"): String = {
    val (ctes, from, adc) = adcScaffold(m, k, iters, queryId, dim, table, idCol, vecCol)
    s"""WITH $ctes,
       |sl AS (SELECT id FROM $from ORDER BY $adc, id LIMIT $shortlist),
       |pqtop AS (SELECT id FROM (
       |  SELECT b.id, list_distance(b.fv, (SELECT fv FROM base WHERE id = $queryId)) AS ed
       |  FROM base b JOIN sl USING (id)) ORDER BY ed, id LIMIT $topK),
       |exact AS (SELECT id FROM (
       |  SELECT b.id, list_distance(b.fv, (SELECT fv FROM base WHERE id = $queryId)) AS ed
       |  FROM base b) ORDER BY ed, id LIMIT $topK)
       |SELECT $topK AS exact_n,
       |  (SELECT count(*) FROM pqtop JOIN exact USING (id)) >= $minHits AS pq_recall_ok
       |""".stripMargin
  }
}
