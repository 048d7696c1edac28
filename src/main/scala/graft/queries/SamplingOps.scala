package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling is not reproducible across engines/partitionings;
  * content-hash sampling is: a row's split follows md5 of its id, so any
  * engine computes the same assignment, membership is stable under
  * re-partitioning/backfills, and downstream joins of "the train split"
  * always agree. Both ops are exact → DuckDB-oracled.
  */
object SamplingOps {

  /** Lexicographic threshold over the first 8 md5 hex chars ≈ fraction.
    * 0xcccccccc / 0xffffffff ≈ 0.8. */
  private val TrainThreshold = "cccccccc"

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ~80/20 hash split: deterministic, engine-independent, id-stable.
    "train_test_split" -> ((s, dir) => {
      Tables.events(s, dir)
        .withColumn("split",
          when(substring(md5(col("event_id").cast("string")), 1, 8) < TrainThreshold,
            "train").otherwise("test"))
        .groupBy(col("split"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("split"), col("event_type"))
    }),

    // Efraimidis–Spirakis weighted sample without replacement, weight =
    // n_chars (budget-proportional selection). Deterministic md5-derived
    // uniforms make the draw reproducible and DuckDB-recomputable; the
    // plan is TakeOrderedAndProject (no global sort, no row shuffle).
    "weighted_sample_topn" -> ((s, dir) => {
      graft.operators.Sampling
        .weightedSample(Tables.documents(s, dir), "doc_id",
          greatest(col("n_chars"), lit(1)).cast("double"), n = 50, salt = "r6")
        .select(col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("es_key"))
    }),

    // stratified weighted sample: an independent A-ES draw of 5 docs per
    // language, weight = n_chars — the per-group curation-quota primitive.
    "weighted_sample_per_lang" -> ((s, dir) => {
      graft.operators.Sampling
        .weightedSamplePerGroup(Tables.documents(s, dir), "doc_id", "lang",
          greatest(col("n_chars"), lit(1)).cast("double"), nPerGroup = 5,
          salt = "r6g")
        .select(col("lang"), col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("es_key"))
    }),

    // LEAKAGE-SAFE split: train/val/test assigned at the near-dup-CLUSTER
    // level (exact blocked Jaccard >= 0.8 -> connected components), so
    // paraphrase pairs never straddle train and test. Oracled end-to-end:
    // DuckDB replays the closure AND the md5 split assignment.
    "split_by_cluster" -> ((s, dir) =>
      graft.operators.Splits.splitByCluster(
        Tables.documents(s, dir), threshold = 0.8,
        fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "r7s")),

    // the split's 100 TB path: components from MinHash-LSH clusters
    // (no member-level pair list) at the high-completeness banding
    // (r=4, b=30 — a missed bridge pair could put near-dups in different
    // splits). Oracled against the UNBLOCKED exact closure + the same
    // md5 assignment.
    "split_by_cluster_lsh" -> ((s, dir) =>
      graft.operators.Splits.splitByCluster(
        Tables.documents(s, dir), threshold = 0.8,
        fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "r7s", useLsh = true, portableBanding = true)),

    // domain-mixture sample to per-language char budgets (the static-
    // mixture step of a pretraining recipe). Exact cutoff semantics via
    // the skew-free bucket-histogram plan; 'de' absent from the budget
    // map -> dropped entirely, and budgets exceed no domain's corpus at
    // sf0.01 except fr/es/zh which cut mid-domain.
    "mixture_sample_budget" -> ((s, dir) =>
      graft.operators.Splits.mixtureSample(Tables.documents(s, dir),
        budgets = Map("en" -> 30000L, "zh" -> 10000L, "es" -> 8000L,
          "fr" -> 5000L),
        sizeCol = col("n_chars"), salt = "r7m")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("sample_u"))),

    // temperature (α=0.5) mixture: budgets DERIVED from per-lang corpus
    // sizes as floor(T·√n_d·1000)/Σ — quantized-integer budget arithmetic
    // so DuckDB rebuilds the exact budgets, then replays the exact cutoff
    // window. Upsamples small langs vs natural share (the XLM-R α-sampling
    // recipe); every lang participates (no hand-written budget map).
    "mixture_temperature" -> ((s, dir) =>
      graft.operators.Splits.temperatureMixtureSample(
        Tables.documents(s, dir), totalBudget = 40000L, alpha = 0.5,
        sizeCol = col("n_chars"), salt = "r7t")
        .select(col("doc_id"), col("lang"), col("n_chars"), col("sample_u"))),

    // per-group cap: at most 10 docs per source, chosen by hash order (a
    // deterministic "random" subset, stable across engines and runs).
    "capped_per_source" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy(col("source"), col("rk"))
    })
  )

  def oracles: Map[String, String] = Map(
    "train_test_split" ->
      s"""SELECT CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 8) < '$TrainThreshold'
        |  THEN 'train' ELSE 'test' END AS split,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY split, event_type""".stripMargin,
    "weighted_sample_topn" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r6'), 1, 12))::UBIGINT + 0.5)
        |       / 281474976710656.0) / CAST(greatest(n_chars, 1) AS DOUBLE) AS raw_key
        |  FROM documents)
        |SELECT doc_id, n_chars, round(raw_key, 9) AS es_key FROM k
        |ORDER BY raw_key DESC, doc_id LIMIT 50""".stripMargin,
    "weighted_sample_per_lang" ->
      """WITH k AS (
        |  SELECT lang, doc_id, n_chars,
        |    ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r6g'), 1, 12))::UBIGINT + 0.5)
        |       / 281474976710656.0) / CAST(greatest(n_chars, 1) AS DOUBLE) AS raw_key
        |  FROM documents),
        |r AS (SELECT lang, doc_id, n_chars, raw_key,
        |  row_number() OVER (PARTITION BY lang ORDER BY raw_key DESC, doc_id) AS rk
        |  FROM k)
        |SELECT lang, doc_id, n_chars, round(raw_key, 9) AS es_key
        |FROM r WHERE rk <= 5""".stripMargin,
    "split_by_cluster" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM tok a JOIN tok b ON a.source = b.source AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
        |asg AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        |uu AS (SELECT doc_id, component,
        |  (('0x' || substr(md5(CAST(component AS VARCHAR) || 'r7s'), 1, 12))::UBIGINT + 0.5)
        |    / 281474976710656.0 AS u FROM asg)
        |SELECT doc_id, component,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM uu""".stripMargin,
    "split_by_cluster_lsh" ->
      """WITH RECURSIVE tok AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM tok a JOIN tok b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |      / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8),
        |edges AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |comp AS (SELECT a AS id, least(a, min(b)) AS component FROM reach GROUP BY a),
        |asg AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
        |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        |uu AS (SELECT doc_id, component,
        |  (('0x' || substr(md5(CAST(component AS VARCHAR) || 'r7s'), 1, 12))::UBIGINT + 0.5)
        |    / 281474976710656.0 AS u FROM asg)
        |SELECT doc_id, component,
        |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
        |FROM uu""".stripMargin,
    "mixture_sample_budget" ->
      """WITH u AS (
        |  SELECT doc_id, lang, n_chars,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r7m'), 1, 12))::UBIGINT + 0.5)
        |      / 281474976710656.0 AS uu,
        |    CASE lang WHEN 'en' THEN 30000 WHEN 'zh' THEN 10000
        |              WHEN 'es' THEN 8000 WHEN 'fr' THEN 5000 END AS budget
        |  FROM documents),
        |k AS (
        |  SELECT *, coalesce(sum(greatest(n_chars, 1)) OVER (
        |    PARTITION BY lang ORDER BY uu, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM u WHERE budget IS NOT NULL)
        |SELECT doc_id, lang, n_chars, round(uu, 9) AS sample_u
        |FROM k WHERE pre < budget""".stripMargin,
    "mixture_temperature" ->
      """WITH sz AS (
        |  SELECT lang, CAST(sum(greatest(n_chars, 1)) AS BIGINT) AS n
        |  FROM documents GROUP BY lang),
        |w AS (SELECT lang,
        |    CAST(floor(1000 * sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS w
        |  FROM sz),
        |z AS (SELECT CAST(sum(w) AS BIGINT) AS z FROM w),
        |b AS (SELECT lang, CAST((40000 * w) // z AS BIGINT) AS budget
        |  FROM w, z),
        |u AS (
        |  SELECT doc_id, lang, n_chars,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'r7t'), 1, 12))::UBIGINT + 0.5)
        |      / 281474976710656.0 AS uu
        |  FROM documents),
        |k AS (
        |  SELECT u.*, b.budget, coalesce(sum(greatest(n_chars, 1)) OVER (
        |    PARTITION BY u.lang ORDER BY uu, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
        |  FROM u JOIN b USING (lang))
        |SELECT doc_id, lang, n_chars, round(uu, 9) AS sample_u
        |FROM k WHERE pre < budget""".stripMargin,
    "capped_per_source" ->
      """SELECT source, rk, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents) WHERE rk <= 10 ORDER BY source, rk""".stripMargin
  )
}
