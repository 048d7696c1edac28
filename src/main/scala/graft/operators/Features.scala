package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encoders for training-data pipelines: count /
  * frequency encoding, smoothed target encoding, LEAKAGE-SAFE out-of-fold
  * target encoding, weight-of-evidence, and the signed hashing trick.
  *
  * Scale shape — every encoder is the same two-tier plan:
  *   1. ONE aggregate over the fact table builds the dictionary
  *      (per-category sums/counts — map-side partials; the dictionary is
  *      |categories| rows, never row-count);
  *   2. consumers join the dictionary back with an explicit
  *      `broadcast()` — the fact table never shuffles for an encoder.
  * The hashing trick skips even that: buckets and signs are md5-derived
  * per row inside whole-stage codegen — no shuffle, no dictionary — the
  * standard answer when |categories| itself is too big to broadcast
  * (Weinberger et al. 2009).
  *
  * Determinism — the same content-hash discipline as the split/sampling
  * family ([[graft.queries.SamplingOps]]): folds and hash buckets derive
  * from md5 hex nibbles of row content (DuckDB mirror:
  * `strpos('0123456789abcdef', substr(md5(x), n, 1)) - 1`), and label
  * sums are taken over INTEGER-scaled labels (exact under any aggregation
  * order), so every encoder is exactly engine-replayable — the gates
  * oracle the full encoding tables.
  *
  * Leakage: naive target encoding feeds the row's own label into its own
  * feature. [[targetEncodeOOF]] uses the k-fold exclusion estimator —
  * fold f's encoding comes only from the OTHER folds' sufficient
  * statistics — built from ONE (category, fold) aggregate plus
  * dictionary-sized rollups, not k re-aggregations of the facts.
  */
object Features {

  /** 0..15 value of the n-th hex char of md5(c): ascii arithmetic over
    * the lowercase hex alphabet ('0'..'9' → 0..9, 'a'..'f' → 10..15). */
  def md5Nibble(c: Column, n: Int): Column = {
    val ch = substring(md5(c.cast("string")), n, 1)
    when(ch <= "9", ascii(ch) - 48).otherwise(ascii(ch) - 87)
  }

  /** md5-derived fold id in [0, k): the first 32 hash bits mod k —
    * deterministic, engine-replayable, stable under repartitioning and
    * backfills, and unbiased to ~2⁻³² for any practical k (a single-
    * nibble mod would skew folds whenever k ∤ 16 and break k > 16).
    * DuckDB mirror: `('0x' || substr(md5(x), 1, 8))::UBIGINT % k`. */
  def foldOf(id: Column, k: Int): Column = {
    require(k >= 1 && k <= (1 << 20), s"foldOf needs 1 <= k <= 2^20, got $k")
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % k)
      .cast("int")
  }

  /** Count + frequency encoding: one dictionary row per category. ONE
    * scan of the facts — the total for the frequency comes from summing
    * the dictionary itself (|categories| rows), not a second count job. */
  def countEncode(df: DataFrame, cat: Column, outCat: String = "cat"): DataFrame = {
    val dict = df.groupBy(cat.as(outCat)).agg(count(lit(1)).as("n"))
    graft.core.Caching.withCached(dict) {
      val total = dict.agg(sum(col("n"))).head().getLong(0).toDouble
      dict.withColumn("freq", round(col("n") / total, 6)).localCheckpoint()
    }
  }

  /** Smoothed target-encoding dictionary: enc(c) = (Σ label_c + m·prior)
    * / (n_c + m), prior = global label mean. Pass an INTEGER-scaled
    * label (e.g. cents) — exact sums make the table engine-exact. */
  def targetEncode(df: DataFrame, cat: Column, label: Column, m: Double,
                   outCat: String = "cat"): DataFrame = {
    val g = df.agg(sum(label).as("s"), count(lit(1)).as("n")).head()
    val prior = g.getLong(0).toDouble / g.getLong(1)
    df.groupBy(cat.as(outCat))
      .agg(sum(label).as("s"), count(lit(1)).as("n"))
      .select(col(outCat), col("n"),
        round((col("s") + lit(m * prior)) / (col("n") + lit(m)), 6).as("enc"))
  }

  /** Out-of-fold smoothed target encoding: one row per (category, fold);
    * fold f's encoding uses only the OTHER folds —
    * enc(c, f) = (S_c − S_cf + m·prior_{−f}) / (n_c − n_cf + m),
    * prior_{−f} = (S − S_f) / (n − n_f). The dense (cat × fold) grid
    * keeps categories absent from a fold encodable (they fall back to
    * the out-of-fold statistics alone). */
  def targetEncodeOOF(df: DataFrame, cat: Column, label: Column, id: Column,
                      k: Int, m: Double, outCat: String = "cat"): DataFrame = {
    require(k >= 2, s"out-of-fold encoding needs k >= 2 folds, got $k")
    // m > 0 keeps the encoding denominator n_c − n_cf + m strictly positive
    // even when a category lives entirely in one fold (n_c == n_cf) —
    // m == 0 there would divide by zero, which Spark's non-ANSI mode turns
    // into a SILENT null encoding rather than an error
    require(m > 0, s"out-of-fold encoding needs smoothing m > 0, got $m")
    val cf = df.select(cat.as(outCat), label.as("_y"), foldOf(id, k).as("fold"))
      .groupBy(col(outCat), col("fold"))
      .agg(sum(col("_y")).as("s_cf"), count(lit(1)).as("n_cf"))
    graft.core.Caching.withCached(cf) {
      // dictionary-sized rollups of the (cat, fold) partials — the facts
      // are aggregated exactly once, above
      val byCat = cf.groupBy(col(outCat))
        .agg(sum(col("s_cf")).as("s_c"), sum(col("n_cf")).as("n_c"))
      val byFold = cf.groupBy(col("fold"))
        .agg(sum(col("s_cf")).as("s_f"), sum(col("n_cf")).as("n_f"))
      val g = cf.agg(sum(col("s_cf")).as("s"), sum(col("n_cf")).as("n")).head()
      val (s, n) = (g.getLong(0), g.getLong(1))
      val grid = byCat.crossJoin(
        df.sparkSession.range(k).select(col("id").cast("int").as("fold")))
      grid
        .join(cf, Seq(outCat, "fold"), "left")
        // left: a fold NO row hashed to still encodes (prior_{−f} = the
        // global mean) — it serves future rows that land in that fold
        .join(broadcast(byFold), Seq("fold"), "left")
        .na.fill(0L, Seq("s_cf", "n_cf", "s_f", "n_f"))
        .select(col(outCat), col("fold"), col("n_c"), col("n_cf"),
          // degenerate fold guard: if EVERY row hashed into fold f (tiny
          // inputs), prior_{−f} = (s−s_f)/(n−n_f) is 0/0 → silent null;
          // fall back to the global mean — the only estimate that exists
          round(
            (col("s_c") - col("s_cf") +
              lit(m) * when(col("n_f") === n, lit(s.toDouble / n))
                .otherwise((lit(s) - col("s_f")) / (lit(n) - col("n_f")))) /
              (col("n_c") - col("n_cf") + lit(m)), 6).as("enc"))
        .localCheckpoint() // materialize before the cf cache unpersists
    }
  }

  /** Smoothed target-encoding dictionary read from MAINTAINED aggregate
    * state ([[IncrementalAgg]]'s (bucket × dims) count/sum table): the
    * state rows collapse to per-category sufficient statistics, so the
    * encoder refreshes at O(changed rows) — and retention deletes make
    * it FORGET dropped months, which a from-scratch encoder over the
    * retained facts must reproduce exactly (gate
    * `incremental_target_encode`). */
  def encodeFromAgg(agg: DataFrame, catCol: String, m: Double): DataFrame = {
    val byCat = agg.groupBy(col(catCol).as("cat"))
      .agg(sum(col("sum_value")).as("s"), sum(col("count")).as("n"))
    graft.core.Caching.withCached(byCat) {
      val g = byCat.agg(sum(col("s")).as("s"), sum(col("n")).as("n")).head()
      val prior = g.getLong(0).toDouble / g.getLong(1)
      byCat.select(col("cat"), col("n"),
          round((col("s") + lit(m * prior)) / (col("n") + lit(m)), 6).as("enc"))
        .localCheckpoint()
    }
  }

  /** Weight-of-evidence dictionary for a boolean target with Laplace
    * smoothing α: woe(c) = ln((pos_c+α)/(neg_c+α)) − ln((pos+α)/(neg+α)). */
  def woeEncode(df: DataFrame, cat: Column, positive: Column, alpha: Double,
                outCat: String = "cat"): DataFrame = {
    val g = df.agg(
      sum(when(positive, 1L).otherwise(0L)).as("p"),
      sum(when(positive, 0L).otherwise(1L)).as("q")).head()
    val globalLogOdds = math.log((g.getLong(0) + alpha) / (g.getLong(1) + alpha))
    df.groupBy(cat.as(outCat))
      .agg(sum(when(positive, 1L).otherwise(0L)).as("pos"),
        sum(when(positive, 0L).otherwise(1L)).as("neg"))
      .select(col(outCat), col("pos"), col("neg"),
        round(log((col("pos") + lit(alpha)) / (col("neg") + lit(alpha)))
          - lit(globalLogOdds), 6).as("woe"))
  }

  /** Signed hashing trick over string columns: k=16 buckets, bucket from
    * the 1st md5 nibble, sign from the 2nd (< 8 → +1 else −1). The hash
    * input is `"<position>:<value>"` — hashing the VALUE alone would send
    * two features that share a value (lang="en", src_lang="en") to the
    * same bucket with the same sign on every row, a systematic confound;
    * Weinberger et al. 2009 hash the feature id precisely to avoid it.
    * Appends array<double> `outCol` of width 16 — pure per-row codegen. */
  def featureHash16(df: DataFrame, cols: Seq[Column], outCol: String = "fh"): DataFrame = {
    require(cols.nonEmpty, "featureHash16 needs at least one input column")
    val parts = cols.zipWithIndex.map { case (c, i) =>
      val tagged = concat(lit(s"${i + 1}:"), c.cast("string"))
      (md5Nibble(tagged, 1), when(md5Nibble(tagged, 2) < 8, 1.0).otherwise(-1.0))
    }
    val vec = array((0 until 16).map { b =>
      parts.map { case (bucket, sign) =>
        when(bucket === b, sign).otherwise(0.0)
      }.reduce(_ + _)
    }: _*)
    df.withColumn(outCol, vec)
  }
}
