package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines: leakage-safe
  * train/val/test splits and domain-mixture sampling to a token budget.
  *
  * Both are deterministic functions of (id, salt) via the same md5
  * uniforms as [[Sampling]] — reproducible across runs and engines, so
  * a 100 TB split can be recomputed (or audited in a second engine)
  * without storing an assignment table.
  */
object Splits {

  /** `split` column from a uniform and cumulative fractions: the first
    * name whose cumulative upper bound exceeds `u`. Fractions need not
    * sum to 1 — the last name absorbs the remainder. */
  private def assignSplit(u: Column, fractions: Seq[(String, Double)]): Column = {
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.init.zip(cum.init).foldRight(lit(fractions.last._1): Column) {
      case (((name, _), hi), rest) => when(u < lit(hi), lit(name)).otherwise(rest)
    }
  }

  /** LEAKAGE-SAFE train/val/test split: the split is assigned to the
    * near-duplicate CLUSTER, not the document, so two near-dup documents
    * can never straddle train and test (the contamination mode a
    * doc-level hash split cannot prevent — a benchmark answer paraphrased
    * into the training split survives doc-level splitting with
    * probability 1 - sum(f^2)).
    *
    * Composition, all existing machinery: near-dup pairs (exact blocked
    * Jaccard by default; [[Dedup.clusters]]' LSH form is the 100 TB path
    * and keeps identical downstream semantics) → connected components →
    * every document joins its component (singletons: their own id) →
    * `split = f(md5(component, salt))`. The only work this operator adds
    * on top of clustering is one doc_id-keyed join against the component
    * labels and a codegen'd hash — no new shuffle shape, no skew (the
    * hash is on the component VALUE, not a partition key).
    *
    * @param fractions cumulative split spec, e.g.
    *                  `Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)`
    * @param useLsh    true → cluster via MinHash-LSH representatives
    *                  (the scale path; no member-level pair list) */
  def splitByCluster(docs: DataFrame, threshold: Double,
                     fractions: Seq[(String, Double)],
                     salt: String = "",
                     useLsh: Boolean = false,
                     blockCol: String = "source",
                     idCol: String = "doc_id",
                     textCol: String = "text",
                     numHashes: Int = 120, bands: Int = 30,
                     portableBanding: Boolean = false): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).forall(_ >= 0))
    val comp =
      if (useLsh)
        // r=4, b=30 default: P(miss | J=0.8) ≈ 1.4e-7, the completeness
        // margin the dedup_clusters_lsh gate measured (a missed bridge
        // pair here would not just split a cluster — it could put two
        // near-dups in different SPLITS, the exact leak this op prevents)
        Dedup.clusters(docs, threshold, numHashes, bands,
            idCol = idCol, textCol = textCol,
            portableBanding = portableBanding)
          .select(col("id"), col("keeper").as("component"))
      else
        Dedup.connectedComponents(
          Dedup.jaccardPairs(docs, threshold, blockCol, idCol, textCol))
    docs.select(col(idCol))
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        assignSplit(Sampling.uniformOf(col("component"), salt), fractions))
  }

  /** DOMAIN-MIXTURE SAMPLE to a size budget: from each domain (language,
    * source, …) keep a deterministic uniform random subset whose total
    * `sizeCol` (tokens, chars, bytes) just reaches that domain's budget —
    * the static-mixture step of a pretraining data recipe (fixed
    * per-domain token targets à la the Pile / DoReMi reference weights).
    *
    * SEMANTICS (exact, engine-replayable): within a domain, order docs by
    * (u, id) where `u = md5-uniform(id, salt)`; keep a doc iff the total
    * size of docs BEFORE it is `< budget`. So the sample overshoots by at
    * most one document, every non-empty domain with a positive budget
    * contributes, and membership depends only on (id, salt, budget) plus
    * the in-domain competitor set.
    *
    * SCALE: the naive form is one running-sum window per domain — with a
    * handful of domains that is a handful of hot partitions holding the
    * entire corpus. Instead the cutoff is found in three skew-free steps:
    *   1. map-side: bucket each doc's u into `buckets` ranges; aggregate
    *      per-(domain, bucket) size sums — ≤ domains×buckets rows.
    *   2. driver: prefix-sum each domain's bucket histogram → the
    *      boundary bucket (first whose prefix crosses the budget) and the
    *      size already consumed before it. Broadcast as literals.
    *   3. full buckets below the boundary pass with NO window at all;
    *      only the boundary bucket (~1/buckets of the domain) runs the
    *      exact running-sum window, seeded with the consumed offset.
    * The per-doc decision is identical to the naive window — the
    * bucketing only localizes where the expensive order matters.
    *
    * @param budgets per-domain size budgets; domains absent from the map
    *                are dropped entirely.
    * @return input rows that made the sample, plus `sample_u` (rounded
    *         selection uniform, for resuming/auditing) */
  def mixtureSample(df: DataFrame, budgets: Map[String, Long],
                    sizeCol: Column,
                    domainCol: String = "lang",
                    idCol: String = "doc_id",
                    salt: String = "",
                    buckets: Int = 1024): DataFrame = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val spark = df.sparkSession
    val u = Sampling.uniformOf(col(idCol), salt)
    val sz = greatest(sizeCol.cast("long"), lit(1L)) // zero-size can't stall
    val base = df
      .filter(col(domainCol).isin(budgets.keys.toSeq: _*))
      .withColumn("_u", u).withColumn("_sz", sz)
      .withColumn("_bkt", least(floor(col("_u") * buckets), lit(buckets - 1L)))

    // 1+2: tiny per-(domain,bucket) histogram -> driver prefix sums.
    // domains×buckets rows, map-side combined: safe to collect at any SF.
    val hist = base.groupBy(domainCol, "_bkt").agg(sum("_sz").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // per domain: (boundary bucket, size consumed before it). Buckets
    // strictly below the boundary are fully kept; above, fully dropped.
    val cuts: Map[String, (Long, Long)] = hist.groupBy(_._1).map {
      case (dom, rows) =>
        val budget = budgets(dom)
        var acc = 0L; var boundary = buckets.toLong; var before = 0L
        rows.sortBy(_._2).foreach { case (_, bkt, s) =>
          if (acc < budget && acc + s >= budget) { boundary = bkt; before = acc }
          acc += s
        }
        if (acc < budget) { boundary = buckets.toLong; before = acc } // all fit
        if (budget <= 0L) boundary = -1L // nothing below, no boundary bucket
        dom -> (boundary, before)
    }
    val boundaryOf = cuts.map { case (d, (b, _)) => (d, b) }
    val beforeOf = cuts.map { case (d, (_, c)) => (d, c) }
    def lookup(m: Map[String, Long], default: Long): Column =
      m.foldLeft(lit(default)) { case (acc, (d, v)) =>
        when(col(domainCol) === d, lit(v)).otherwise(acc)
      }
    val bnd = lookup(boundaryOf, -1L)

    val below = base.filter(col("_bkt") < bnd)
    // 3: exact window ONLY inside each domain's boundary bucket.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col("_u"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val atBoundary = base.filter(col("_bkt") === bnd)
      .withColumn("_pre",
        lookup(beforeOf, 0L) + coalesce(sum(col("_sz")).over(w), lit(0L)))
      .filter(col("_pre") < lookup(budgets, 0L))
      .drop("_pre")
    below.unionByName(atBoundary)
      .withColumn("sample_u", round(col("_u"), 9))
      .drop("_u", "_sz", "_bkt")
  }

  /** TEMPERATURE-smoothed domain mixture: per-domain budgets are DERIVED
    * from the corpus itself as `budget_d = ⌊T · w_d / Σw⌋` with
    * `w_d = ⌊1000 · n_d^α⌋`, then selection runs through [[mixtureSample]]
    * unchanged. α < 1 upsamples small domains relative to their natural
    * share — the α-sampling recipe of multilingual pretraining (XLM-R
    * α=0.3, mT5 α=0.3; α=1 reproduces natural proportions, α=0 uniform
    * across domains).
    *
    * Budget arithmetic is engineered for cross-engine replay: weights are
    * QUANTIZED (`⌊1000·n^α⌋`) so Σw and the budget splits are exact
    * integer arithmetic with no float-summation order anywhere, and for
    * α = 0.5 the weight itself is reproducible bit-for-bit in any IEEE
    * engine (sqrt is correctly rounded; pow is not — other α values stay
    * JVM-deterministic but are not oracle-portable, and `math.sqrt` is
    * used explicitly on the α=0.5 path for that reason). The per-domain
    * size aggregate is domains-sized — safe to collect at any SF — and
    * budget products go through BigInt so a petabyte-scale `T · w` cannot
    * overflow.
    *
    * @return sampled rows + `sample_u`, exactly as [[mixtureSample]] */
  def temperatureMixtureSample(df: DataFrame, totalBudget: Long,
                               alpha: Double, sizeCol: Column,
                               domainCol: String = "lang",
                               idCol: String = "doc_id",
                               salt: String = "",
                               buckets: Int = 1024): DataFrame = {
    require(totalBudget >= 0 && alpha >= 0, "need totalBudget, alpha >= 0")
    val sizes = df.groupBy(domainCol)
      .agg(sum(greatest(sizeCol.cast("long"), lit(1L))).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val w = sizes.map { case (d, n) =>
      val p = if (alpha == 0.5) math.sqrt(n.toDouble)
              else math.pow(n.toDouble, alpha)
      d -> math.floor(1000.0 * p).toLong
    }
    val z = w.map(_._2).sum
    val budgets = w.map { case (d, wi) =>
      d -> (if (z == 0L) 0L else (BigInt(totalBudget) * wi / z).toLong)
    }.toMap
    mixtureSample(df, budgets, sizeCol, domainCol, idCol, salt, buckets)
  }
}
