package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's) over an embedding column —
  * the learned-quantizer companion to [[Similarity]]'s fixed-cell IVF and
  * the clustering stage of SemDeDup-style curation (Abbas et al. 2023
  * cluster with k-means FIRST, then near-dedup within clusters; Tirumala
  * et al. 2023 "D4" likewise k-means-cluster before SemDeDup+SSL-prototype
  * pruning).
  *
  * Scale design — the canonical Spark k-means shape (same as MLlib's, but
  * declarative so Catalyst keeps the per-iteration pass in whole-stage
  * codegen):
  *   - each iteration is ONE scan of the (persisted) vectors: assignment
  *     is a per-row expression over k broadcast-literal centroids (no
  *     join, no shuffle of the fact table), and the recompute is a
  *     k-group aggregate whose partial sums combine map-side — k×dim
  *     doubles cross the wire per partition, independent of row count;
  *   - centroids live on the driver between iterations (k×dim doubles —
  *     bytes, not data), exactly what `broadcast` would ship anyway;
  *   - determinism: init is the k lowest-id vectors, ties in the argmin
  *     break to the lowest cluster id (struct ordering on (dist², id)),
  *     and each recomputed centroid coordinate is rounded to 6 decimals —
  *     a cross-engine fixed-point trick: per-dimension means differ across
  *     engines only in the last ulp from aggregation order, so rounding
  *     makes every subsequent iteration's inputs bit-identical, which is
  *     what lets DuckDB replay the whole run (`kmeans_clusters` gate)
  *     and makes re-runs on re-partitioned data reproducible at 100 TB.
  *
  * Distances fold left-to-right in double (`zip_with` + `aggregate`), the
  * same sequential accumulation DuckDB's `list_distance` uses, so the
  * argmin compares identical IEEE doubles on both engines.
  */
object Clustering {

  /** Squared L2 distance from the vector column to one literal centroid,
    * sequential double fold. */
  private def dist2(v: Column, c: Seq[Double]): Column =
    aggregate(zip_with(v, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Lloyd's k-means: `iters` assign/recompute rounds, then a final
    * assignment. Returns one row per input vector: (idCol, cluster, dist)
    * with dist = round(L2 to its centroid, 6). Empty clusters drop out of
    * later iterations (ids keep their original index — parity with a
    * GROUP BY recompute on any engine).
    *
    * Seeding (round 13 — VERDICT r12 task #4): deterministic k-means‖
    * ([[kmeansParallelInit]]) is the DEFAULT — spread-out, density-
    * weighted and, since the integer rework, fully DuckDB-replayable
    * ([[kmeansParallelInitCtes]]). `firstKSeed = true` keeps the legacy
    * k-lowest-ids init (the `kmeans_parallel_check` gate's baseline
    * side); an explicit `init` overrides both. */
  def kmeansAssign(vectors: DataFrame, k: Int, iters: Int, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   init: Option[Seq[Seq[Double]]] = None,
                   firstKSeed: Boolean = false): DataFrame = {
    val v = vectors.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))

    def assignExpr(cents: Seq[(Int, Seq[Double])]): Column =
      array_min(array(cents.map { case (cid, c) =>
        struct(dist2(col("v"), c).as("d"), lit(cid).as("cluster"))
      }: _*))

    graft.core.Caching.withCached(v) {
      var cents: Seq[(Int, Seq[Double])] = init
        .orElse(if (firstKSeed) None
          else Some(kmeansParallelInit(vectors, k, dim, idCol = idCol,
            vecCol = vecCol)))
        .map(_.zipWithIndex.map { case (c, i) => (i, c) })
        .getOrElse(v.orderBy("id").limit(k).collect()
          .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1)) }.toSeq)
      var it = 0
      while (it < iters) {
        val dimAvgs = (0 until dim).map(j =>
          round(avg(element_at(col("v"), j + 1)), 6).as(s"d$j"))
        cents = v.withColumn("cluster", assignExpr(cents).getField("cluster"))
          .groupBy("cluster").agg(dimAvgs.head, dimAvgs.tail: _*)
          .collect()
          .map(r => (r.getInt(0), (0 until dim).map(j => r.getDouble(j + 1))))
          .sortBy(_._1).toSeq
        it += 1
      }
      v.withColumn("best", assignExpr(cents))
        .select(col("id").as(idCol), col("best.cluster").as("cluster"),
          round(sqrt(col("best.d")), 6).as("dist"))
        .localCheckpoint() // pin: the cached `v` unpersists when this scope exits
    }
  }

  /** Deterministic k-means‖ seeding (Bahmani et al. 2012) — the
    * initialization that makes Lloyd's start from spread-out, density-
    * weighted centers instead of whatever the k lowest ids happen to be
    * (first-k is replayable but can seed all centers inside one dense
    * region and strand Lloyd in a poor local optimum).
    *
    * The classic algorithm, with every random draw replaced by the repo's
    * content-hash discipline so the result is reproducible across runs
    * and partitionings:
    *   1. C ← the minimum-id vector;
    *   2. `rounds` times: each point samples itself into C when
    *      u(id, round) < ℓ·d²(x,C)/φ — u is the md5-derived uniform
    *      ([[Sampling.uniformOf]]), d²(x,C) a per-row codegen fold over
    *      broadcast-literal centers, and φ the current total cost summed
    *      in INTEGER-scaled units (a raw double Σ would make the sample
    *      set depend on aggregation order);
    *   3. weight each candidate by its nearest-point count (one
    *      aggregate), then recluster the ≤ 1+ℓ·rounds-ish candidates to k
    *      on the DRIVER: greedy farthest-point seeding by w·d², then
    *      weighted Lloyd — all deterministic (ties break to lowest
    *      candidate index).
    * Every distributed step is one scan with map-side-combining
    * aggregates; candidate count — not row count — bounds driver state.
    * Output feeds [[kmeansAssign]]'s `init`; the `kmeans_parallel_check`
    * gate pins inertia(k-means‖) ≤ inertia(first-k) at both gate SFs. */
  def kmeansParallelInit(vectors: DataFrame, k: Int, dim: Int = 64,
                         ell: Double = 0.0, rounds: Int = 5,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         maxCandidates: Int = 4096,
                         phiDigitsCeil: Int = 23): Seq[Seq[Double]] =
    parallelInitFrame(vectors.select(col(idCol).as("id"),
        transform(slice(col(vecCol), 1, dim), _.cast("double")).as("v")),
      k, ell, rounds, maxCandidates, phiDigitsCeil)

  /** Micro-unit quantization scale for the seeding phase (coordinates →
    * exact integers). 10⁶ keeps full float32 precision for unit-ish
    * embedding coordinates while (4·10⁶)²·dim stays far inside a LONG. */
  private[operators] val Micro = 1e6

  /** 2⁴⁸ — the md5 draw's integer range ([[Sampling.uniformOf]] reads 12
    * hex chars); the sampling predicate compares in this scale. */
  private[operators] val U48 = 281474976710656.0

  /** [[kmeansParallelInit]] over a prepared `(id, v)` frame — shared with
    * [[Quantization.pqTrain]]'s per-subspace codebooks.
    *
    * EVERY arithmetic step runs in exact integer space (round 13; the
    * r12 version compared raw doubles in the sampling predicate, which
    * was deterministic per-engine but not REPLAYABLE across engines):
    * coordinates quantize once to micro-units (floor(x·10⁶ + 0.5) — one
    * multiply+add+floor, bit-identical in any engine), distances are
    * LONG sums of integer squares, φ is a Decimal(38) sum, and the
    * sampling predicate u·φ < ℓ·d²(x,C) is evaluated as
    * uq·φq < ℓ·2⁴⁸·dq on integers — uq being the RAW 48-bit md5 draw.
    * The result is a pure function of the id/value SETS: aggregation
    * order, partitioning, and engine all cancel out, which is what lets
    * DuckDB replay the whole seeding ([[kmeansParallelInitCtes]]) and
    * makes the seeded gates (`kmeans_clusters`, `semdedup_kmeans`,
    * `pq_*`) hash-comparable.
    *
    * Round 14 (VERDICT r13 task #1) — dmin is INCREMENTAL across rounds:
    * the per-row nearest-center distance frame carries over and each
    * round min-s it against distances to that round's NEW admissions
    * only (`dmin_r = min(dmin_{r−1}, d²(x, fresh))` — integer min is
    * exact and order-free, so the decomposition cannot change a bit vs
    * the full-pool recompute the oracle CTEs replay). Distances run in
    * [[graft.plans.NearestCandidateQ]] — one codegen primitive loop per
    * row against the pool as a single array literal — replacing r13's
    * broadcast-join + per-id re-aggregation: the sampling loop now
    * touches each row with ZERO shuffles and plan size stays O(1) in
    * pool size (the property the join form bought, without its
    * exchange). Per round that leaves two jobs over the cached frame:
    * the φ aggregate (which also materializes the round's dmin) and the
    * sample scan. */
  private[operators] def parallelInitFrame(frame: DataFrame, k: Int,
                                           ell: Double = 0.0, rounds: Int = 5,
                                           maxCandidates: Int = 4096,
                                           phiDigitsCeil: Int = 23): Seq[Seq[Double]] = {
    val (cand, w) = parallelCandidates(frame, k, ell, rounds, maxCandidates,
      phiDigitsCeil, depth = 0)
    reclusterWeightedQ(cand, w, k).map(_.map(_ / Micro))
  }

  /** The distributed phase of [[parallelInitFrame]]: the oversampled
    * candidate pool and its nearest-point weights. Split out so the
    * sharded route can union pools from several sub-populations before
    * the one driver-side recluster. */
  private def parallelCandidates(frame: DataFrame, k: Int, ell: Double,
                                 rounds: Int, maxCandidates: Int,
                                 phiDigitsCeil: Int,
                                 depth: Int): (Vector[Seq[Long]], Seq[Long]) = {
    require(k >= 1, s"kmeansParallelInit needs k >= 1, got $k")
    // integral oversampling keeps the predicate's RHS an exact integer
    val oversample = math.max(1L, math.round(if (ell > 0) ell else 2.0 * k))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    graft.plans.VectorExprs.install(frame.sparkSession)
    val v = frame.select(col("id"),
      transform(col("v"), x => floor(x * Micro + 0.5).cast("long")).as("vq"))
    graft.core.Caching.withCached(v) {
      val headRow = v.orderBy("id").limit(1).collect()
      if (headRow.isEmpty) (Vector.empty[Seq[Long]], Seq.empty[Long])
      else {
        var centers: Vector[Seq[Long]] = Vector(headRow(0).getSeq[Long](1))
        // (id, vq, dmin) — dmin vs the CURRENT pool, carried across rounds
        var cur = v.withColumn("dmin",
          graft.plans.VectorExprs.nearestDistQ(col("vq"), centers))
        cur.persist()
        var prevCache: Option[DataFrame] = None
        // φ that tripped the exact-integer ceiling, if any → sharded route
        var overflowPhi: java.math.BigDecimal = null
        try {
          var r = 1
          while (r <= rounds && overflowPhi == null) {
            // φ = Σ dmin in Decimal(38) — exact at any corpus size (a LONG
            // sum can overflow once n·d² passes 2⁶³). This job also
            // materializes the round's dmin cache.
            val phiQ = cur.agg(sum(col("dmin").cast(dec)).as("s"))
              .head().getDecimal(0)
            prevCache.foreach(_.unpersist(false)); prevCache = None
            // ceiling: uq (15 digits) · φ must stay inside Decimal(38)
            // or Spark's non-ANSI decimal multiply NULLs and samples
            // silently vanish. 10²³ ≈ 10⁸ rows of unit-norm 64-dim
            // vectors per seeding population — above that the seeding
            // ROUTES to per-shard pools (r13 it was a hard require).
            if (phiQ.precision - phiQ.scale > phiDigitsCeil) overflowPhi = phiQ
            else if (phiQ.signum > 0) {
              // uq·φ < ℓ·2⁴⁸·dmin — all Decimal(38): uq ≤ 2⁴⁸, φ ≤ 10²³,
              // products ≤ ~10³⁸
              val uq = conv(substring(md5(concat(col("id").cast("string"),
                lit(s"kmpar_$r"))), 1, 12), 16, 10).cast(dec)
              val sampled = cur
                .filter(uq * lit(phiQ) <
                  lit(oversample) * lit(U48).cast(dec) * col("dmin").cast(dec))
                // deterministic overflow guard: an adversarial φ spike could
                // sample far more than ℓ — keep the lowest-u winners
                .withColumn("_u", uq).orderBy(col("_u"), col("id"))
                .limit(maxCandidates)
                .select(col("vq")).collect().map(_.getSeq[Long](0))
              val before = centers.size
              centers = (centers ++ sampled).distinct.take(maxCandidates)
              val fresh = centers.drop(before)
              // fold ONLY the fresh admissions into dmin (nothing to fold
              // after the last sample — the weights pass re-argmins the
              // full pool anyway)
              if (fresh.nonEmpty && r < rounds) {
                prevCache = Some(cur)
                cur = cur.withColumn("dmin", least(col("dmin"),
                  graft.plans.VectorExprs.nearestDistQ(col("vq"), fresh)))
                cur.persist()
              }
            }
            r += 1
          }
        } finally {
          prevCache.foreach(_.unpersist(false))
          cur.unpersist(false)
        }
        if (overflowPhi != null)
          shardedCandidates(frame, k, ell, rounds, maxCandidates,
            phiDigitsCeil, overflowPhi, depth)
        else {
          // weights: nearest-candidate counts (codegen argmin over the
          // full pool, ties to the lowest index — same order as r13's
          // struct-min over (d, ci))
          val wMap = v.select(graft.plans.VectorExprs
              .nearestIdxQ(col("vq"), centers).as("i"))
            .groupBy(col("i")).agg(count(lit(1)).as("w"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          (centers, centers.indices.map(i => wMap.getOrElse(i, 0L)))
        }
      }
    }
  }

  /** Digit count (precision − scale) of the ROUND-1 seeding cost φ for a
    * population — the quantity [[parallelCandidates]]'s exact-integer
    * ceiling compares against. Exposed for capacity sizing (and the
    * sharded-route spec, which sets the ceiling just below a corpus's
    * actual φ to exercise the route at test scale): a population whose φ
    * digits exceed the ceiling takes the sharded route. */
  def seedingPhiDigits(vectors: DataFrame, dim: Int = 64,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): Int = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    graft.plans.VectorExprs.install(vectors.sparkSession)
    val vq = vectors.select(col(idCol).as("id"),
      transform(slice(col(vecCol), 1, dim),
        x => floor(x.cast("double") * Micro + 0.5).cast("long")).as("vq"))
    val c0 = vq.orderBy("id").limit(1).collect()(0).getSeq[Long](1)
    val phi = vq.agg(sum(graft.plans.VectorExprs
        .nearestDistQ(col("vq"), Vector(c0)).cast(dec)).as("s"))
      .head().getDecimal(0)
    phi.precision - phi.scale
  }

  /** Sharded seeding route (VERDICT r13 task #6): when φ exceeds the
    * exact-integer budget (~10⁸ unit-norm 64-dim vectors per population
    * at the default ceiling), split the population by id-hash into the
    * smallest shard count that brings per-shard φ back inside it (4×
    * margin), seed each shard independently, then union the candidate
    * pools — exact-duplicate candidates merge by summing their weights,
    * first occurrence keeps its position — for the caller's single
    * weighted recluster. Determinism: shard assignment is a pure hash of
    * the id, each per-shard seeding is the usual pure function of its id
    * /value set, and the union order is (shard, admission order). The
    * per-shard md5 draws reuse the same round salts — different
    * populations, so no draw is reused on the same id.
    *
    * One level only: a shard that still trips the ceiling (φ is not
    * exactly n/S-additive — per-shard round-1 costs are measured against
    * the shard's own first center) fails loudly rather than recursing
    * unboundedly. */
  private def shardedCandidates(frame: DataFrame, k: Int, ell: Double,
                                rounds: Int, maxCandidates: Int,
                                phiDigitsCeil: Int,
                                phi: java.math.BigDecimal,
                                depth: Int): (Vector[Seq[Long]], Seq[Long]) = {
    require(depth < 1,
      s"kmeansParallelInit: seeding cost $phi still exceeds the exact-integer " +
        s"range (ceiling 10^$phiDigitsCeil) after sharding — reduce the population")
    val budget = java.math.BigDecimal.TEN.pow(phiDigitsCeil)
    require(phi.abs.compareTo(budget.multiply(new java.math.BigDecimal(256))) <= 0,
      s"kmeansParallelInit: seeding cost $phi would need > 1024 shards (4× margin) — reduce the population")
    val shards = phi.abs.multiply(new java.math.BigDecimal(4))
      .divide(budget, 0, java.math.RoundingMode.CEILING).intValueExact()
    val pooled = scala.collection.mutable.LinkedHashMap.empty[Seq[Long], Long]
    for (s <- 0 until shards) {
      val (cs, ws) = parallelCandidates(
        frame.filter(pmod(hash(col("id")), lit(shards)) === s),
        k, ell, rounds, maxCandidates, phiDigitsCeil, depth + 1)
      for ((c, w) <- cs.zip(ws)) pooled(c) = pooled.getOrElse(c, 0L) + w
    }
    (pooled.keys.toVector, pooled.values.toSeq)
  }

  /** Driver-side deterministic weighted k-means over the candidate set,
    * ALL-INTEGER (micro-unit coordinates in, micro-unit coordinates out):
    * greedy farthest-point seeding (first = max weight, then argmax
    * w·d²(c, chosen) scored in BigInt, ties to lowest index), then 20
    * weighted Lloyd rounds whose centroids are floor-divided back to
    * micro-units each round — so the whole recluster is exact integer
    * arithmetic a SQL engine replays bit-for-bit (the r12 version summed
    * doubles in candidate order, deterministic here but dependent on
    * Scala's fold order). O(|candidates|²·dim) — candidates are
    * ℓ·rounds-ish, never row-count. */
  private[operators] def reclusterWeightedQ(cand: Seq[Seq[Long]],
                                            w: Seq[Long], k: Int): Seq[Seq[Long]] = {
    val n = cand.size
    if (n <= k) return cand
    def d2(a: Seq[Long], b: Seq[Long]): BigInt = {
      var s = BigInt(0); var i = 0
      while (i < a.length) { val d = BigInt(a(i) - b(i)); s += d * d; i += 1 }
      s
    }
    val first = w.indices.maxBy(i => (w(i), -i))
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    while (chosen.size < k) {
      val next = (0 until n).filterNot(chosen.contains).maxBy { i =>
        (BigInt(w(i)) * chosen.map(j => d2(cand(i), cand(j))).min, -i)
      }
      chosen += next
    }
    var cents = chosen.map(cand).toVector
    for (_ <- 1 to 20) {
      val assign = (0 until n).map(i =>
        cents.indices.minBy(j => (d2(cand(i), cents(j)), j)))
      cents = cents.indices.map { j =>
        val members = (0 until n).filter(i => assign(i) == j && w(i) > 0)
        if (members.isEmpty) cents(j)
        else {
          val tw = BigInt(members.map(w).sum)
          cand.head.indices.map { d =>
            // floor division of exact integers (BigInt division truncates
            // toward zero; sums here are non-negative only if coords are —
            // use floorDiv semantics explicitly for negative coordinates)
            val num = members.map(i => BigInt(w(i)) * BigInt(cand(i)(d))).sum
            val (q, r) = num /% tw
            (if (r.signum < 0) q - 1 else q).toLong
          }
        }
      }.toVector
    }
    cents.map(_.toSeq)
  }

  /** Total within-cluster cost of a [[kmeansAssign]] result, in exact
    * micro-units (LONG sum of floor(dist²·10⁶) — order-free, so the
    * inertia comparison gate is deterministic). */
  def inertiaMicros(assigned: DataFrame): Long =
    assigned.agg(sum(floor(col("dist") * col("dist") * 1e6)).as("s"))
      .head().getLong(0)

  /** The D4 pipeline composition (Tirumala et al. 2023): k-means-cluster
    * the embeddings, then semantic-dedup WITHIN each learned cluster —
    * exact cosine pairs per cell, connected components, one (id, keeper)
    * row per vector with keeper = the component's minimum id.
    *
    * This is the paper's actual scale argument re-expressed in Spark: the
    * O(n²) cosine self-join runs per k-means cell (n/k rows each), never
    * globally; [[kmeansAssign]] contributes one scan per iteration; and
    * the component loop is the shared constant-depth label propagation
    * ([[Dedup.connectedComponents]]). Every merge is exact-cosine-verified
    * at the gate's threshold, so — unlike the hyperplane-LSH variant
    * ([[Similarity.semanticClusters]]) — within-cell recall is exactly 1;
    * what the cell partition may miss is only cross-cluster near-dups,
    * the trade the D4 recipe explicitly makes. */
  def semdedupKmeans(vectors: DataFrame, k: Int, iters: Int, threshold: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     dim: Int = 64): DataFrame = {
    val cells = kmeansAssign(vectors, k, iters, dim, idCol, vecCol)
      .select(col(idCol), col("cluster"))
    val pairs = Similarity.cosinePairs(
      vectors.join(cells, idCol), threshold, blockCol = "cluster",
      idCol = idCol, vecCol = vecCol).select("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
    vectors.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("keeper"))
  }

  /** DuckDB replay of [[parallelInitFrame]] — the integer k-means‖
    * seeding unrolled as CTEs (same discipline as the classifier's
    * trajectory replay: every step exact integer arithmetic, so the SQL
    * result is bit-identical to the Scala run).
    *
    * @param prefix CTE name prefix (per-subspace uniqueness for PQ)
    * @param vSel   SQL producing `(id, v DOUBLE[])` rows
    * @return (CTE chain, name of the final CTE holding one row per
    *         seeded center: `(step INT 0..k-1, c BIGINT[] micro-units)`) */
  def kmeansParallelInitCtes(prefix: String, vSel: String, k: Int,
                             rounds: Int = 5, ell: Long = 0,
                             cap: Int = 4096): (String, String) = {
    val p = prefix
    val os = if (ell > 0) ell else 2L * k
    def d2q(a: String, b: String) =
      s"list_sum(list_transform(list_zip($a, $b), z -> (z[1]-z[2])*(z[1]-z[2])))"
    def uq(idExpr: String, r: Int) =
      s"('0x'||substr(md5(CAST($idExpr AS VARCHAR)||'kmpar_$r'),1,12))::UBIGINT"
    val head = Seq(
      s"""${p}vq AS MATERIALIZED (SELECT id,
         |  list_transform(v, x -> CAST(floor(x*1000000.0 + 0.5) AS BIGINT)) AS vq
         |  FROM ($vSel))""".stripMargin,
      s"${p}s0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS ord, vq AS c FROM ${p}vq ORDER BY id LIMIT 1)")
    val sampleRounds = (1 to rounds).flatMap { r =>
      Seq(
        // dmin to the CURRENT pool (exact integer); phi = its HUGEINT sum
        s"""${p}d$r AS MATERIALIZED (SELECT q.id, min(${d2q("q.vq", "s.c")}) AS dmin
           |  FROM ${p}vq q CROSS JOIN ${p}s${r - 1} s GROUP BY q.id)""".stripMargin,
        // the sample set: uq·φ < ℓ·2⁴⁸·dmin on integers; lowest-u winners
        // keep candidate order (ord = round·10⁹ + rank)
        s"""${p}g$r AS MATERIALIZED (SELECT q.vq AS c,
           |    ${r}000000000 + row_number() OVER (ORDER BY ${uq("d.id", r)}, d.id) AS ord
           |  FROM ${p}d$r d JOIN ${p}vq q USING (id),
           |       (SELECT sum(dmin) AS phi FROM ${p}d$r) f
           |  WHERE ${uq("d.id", r)}::HUGEINT * f.phi
           |        < $os * 281474976710656::HUGEINT * d.dmin
           |  ORDER BY ${uq("d.id", r)}, d.id LIMIT $cap)""".stripMargin,
        // pool ∪ sample, dedup keeping first occurrence, capped
        s"""${p}s$r AS MATERIALIZED (SELECT c, min(ord) AS ord FROM (
           |    SELECT ord, c FROM ${p}s${r - 1} UNION ALL SELECT ord, c FROM ${p}g$r)
           |  GROUP BY c ORDER BY ord LIMIT $cap)""".stripMargin)
    }
    val weights = Seq(
      s"""${p}cand AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY ord) - 1 AS INT) AS ci, c
         |  FROM ${p}s$rounds)""".stripMargin,
      s"""${p}asg AS MATERIALIZED (SELECT id, ci FROM (
         |    SELECT q.id, c.ci, row_number() OVER (PARTITION BY q.id
         |      ORDER BY ${d2q("q.vq", "c.c")}, c.ci) AS rn
         |    FROM ${p}vq q CROSS JOIN ${p}cand c) WHERE rn = 1)""".stripMargin,
      s"""${p}cw AS MATERIALIZED (SELECT c.ci, c.c, CAST(coalesce(w.w, 0) AS BIGINT) AS w
         |  FROM ${p}cand c LEFT JOIN (
         |    SELECT ci, count(*) AS w FROM ${p}asg GROUP BY ci) w USING (ci))""".stripMargin)
    // greedy farthest-point: k unrolled argmax steps (max w·min-d², ties
    // to the lowest candidate index)
    val greedy =
      s"${p}ch0 AS MATERIALIZED (SELECT 0 AS step, ci, c FROM ${p}cw ORDER BY w DESC, ci LIMIT 1)" +:
      (1 until k).map { j =>
        s"""${p}ch$j AS MATERIALIZED (SELECT * FROM ${p}ch${j - 1} UNION ALL
           |  (SELECT $j AS step, x.ci, x.c FROM ${p}cw x
           |   WHERE x.ci NOT IN (SELECT ci FROM ${p}ch${j - 1})
           |   ORDER BY x.w::HUGEINT * (SELECT min(${d2q("x.c", "y.c")})
           |                            FROM ${p}ch${j - 1} y) DESC, x.ci
           |   LIMIT 1))""".stripMargin
      }
    // 20 weighted Lloyd rounds over the candidates, centroids floor-
    // divided back to micro-units each round (DuckDB // truncates toward
    // zero, so floor = // minus one when the remainder is negative)
    val lloyd = s"${p}lc0 AS MATERIALIZED (SELECT step, c FROM ${p}ch${k - 1})" +:
      (1 to 20).flatMap { t =>
        Seq(
          s"""${p}la$t AS MATERIALIZED (SELECT ci, step FROM (
             |    SELECT x.ci, y.step, row_number() OVER (PARTITION BY x.ci
             |      ORDER BY ${d2q("x.c", "y.c")}, y.step) AS rn
             |    FROM ${p}cw x CROSS JOIN ${p}lc${t - 1} y) WHERE rn = 1)""".stripMargin,
          s"""${p}lm$t AS MATERIALIZED (SELECT step, j, sum(w::HUGEINT * q) AS s, sum(w)::HUGEINT AS tw
             |  FROM (SELECT a.step, x.w, generate_subscripts(x.c, 1) AS j, unnest(x.c) AS q
             |        FROM ${p}la$t a JOIN ${p}cw x USING (ci) WHERE x.w > 0)
             |  GROUP BY step, j)""".stripMargin,
          s"""${p}lc$t AS MATERIALIZED (SELECT y.step, coalesce(m.c, y.c) AS c
             |  FROM ${p}lc${t - 1} y LEFT JOIN (
             |    SELECT step, list(CAST(s // tw - (CASE WHEN s % tw < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |                      ORDER BY j) AS c
             |    FROM ${p}lm$t GROUP BY step) m USING (step))""".stripMargin)
      }
    ((head ++ sampleRounds ++ weights ++ greedy ++ lloyd).mkString(",\n"),
      s"${p}lc20")
  }

  /** The unrolled-run CTE list and the final-assignment subquery of the
    * DuckDB replication — exposed separately so composition gates
    * (`semdedup_kmeans`) can build on the same replayed clustering.
    *
    * `parallelSeed = true` (the round-13 default, matching
    * [[kmeansAssign]]) replays the k-means‖ seeding
    * ([[kmeansParallelInitCtes]]) as c0; false replays the legacy
    * first-k-by-id init. */
  def kmeansOracleCtes(k: Int, iters: Int, table: String = "embeddings",
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       parallelSeed: Boolean = true): (String, String) = {
    val (seedCtes, seedFin) =
      if (parallelSeed) kmeansParallelInitCtes("kp_", "SELECT id, v FROM v", k)
      else ("", "")
    val init =
      if (parallelSeed)
        s"""$seedCtes,
           |c0 AS (SELECT CAST(step AS INT) AS cluster,
           |  list_transform(c, q -> CAST(q AS DOUBLE)/1000000.0) AS c FROM $seedFin)""".stripMargin
      else
        s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS cluster, v AS c
           |  FROM (SELECT id, v FROM v ORDER BY id LIMIT $k))""".stripMargin
    def assign(i: Int) =
      s"""(SELECT id, cluster, d FROM (
         |    SELECT v.id, c.cluster, list_distance(v.v, c.c) AS d,
         |      row_number() OVER (PARTITION BY v.id ORDER BY list_distance(v.v, c.c), c.cluster) AS rn
         |    FROM v CROSS JOIN c$i c) WHERE rn = 1)""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""a$i AS ${assign(i)},
         |c${i + 1} AS (SELECT cluster, list(m ORDER BY j) AS c FROM (
         |    SELECT cluster, j, round(avg(x), 6) AS m FROM (
         |      SELECT a$i.cluster AS cluster, generate_subscripts(v.v, 1) AS j, unnest(v.v) AS x
         |      FROM a$i JOIN v USING (id)) GROUP BY cluster, j) GROUP BY cluster)""".stripMargin
    }
    val ctes =
      s"""v AS (SELECT $idCol AS id, CAST($vecCol AS DOUBLE[]) AS v FROM $table),
         |${(init +: steps).mkString(",\n")}""".stripMargin
    (ctes, assign(iters))
  }

  /** DuckDB replication of [[semdedupKmeans]]: the replayed k-means run,
    * within-cluster exact-cosine pairs, and a recursive-CTE component
    * closure (the `dedup_clusters_lsh` oracle pattern). */
  def semdedupOracleSql(k: Int, iters: Int, threshold: Double,
                        table: String = "embeddings", idCol: String = "vec_id",
                        vecCol: String = "embedding"): String = {
    val (ctes, fin) = kmeansOracleCtes(k, iters, table, idCol, vecCol)
    s"""WITH RECURSIVE $ctes,
       |asgn AS (SELECT id, cluster FROM $fin),
       |p AS (
       |  SELECT ax.id AS id_a, ay.id AS id_b
       |  FROM asgn ax JOIN asgn ay ON ax.cluster = ay.cluster AND ax.id < ay.id
       |  JOIN v x ON x.id = ax.id JOIN v y ON y.id = ay.id
       |  WHERE round(list_cosine_similarity(x.v, y.v), 6) >= $threshold),
       |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (
       |  SELECT r.a AS id, least(r.a, min(r.b)) AS keeper FROM reach r GROUP BY r.a)
       |SELECT v.id AS $idCol, coalesce(c.keeper, v.id) AS keeper
       |FROM v LEFT JOIN comp c ON c.id = v.id
       |ORDER BY $idCol""".stripMargin
  }

  /** DuckDB replication of [[kmeansAssign]] — the same unrolled run as one
    * statement (generated here so gate and operator share k/iters). */
  def kmeansOracleSql(k: Int, iters: Int, table: String = "embeddings",
                      idCol: String = "vec_id", vecCol: String = "embedding"): String = {
    val (ctes, fin) = kmeansOracleCtes(k, iters, table, idCol, vecCol)
    s"""WITH $ctes
       |SELECT id AS $idCol, cluster, round(d, 6) AS dist
       |FROM $fin
       |ORDER BY $idCol""".stripMargin
  }
}
