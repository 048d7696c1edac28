package graft.queries

import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-selection operators for pretraining corpora: hashed-feature
  * importance weighting (the DSIR recipe — Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") and
  * temperature-flattened source mixing (the multilingual/multi-source
  * sampling scheme from the mT5/data-mixing literature).
  *
  * Both are exact and engine-independent by construction — every
  * "random" choice is a pure function of md5 over row content, and every
  * floating aggregation is integerized before summing (see the
  * determinism note in [[Relational]]) — so both gate queries hash-match
  * a DuckDB oracle.
  *
  * Scale shape (100 TB): DSIR is two token-bucket aggregations (a 256-row
  * distribution each), a broadcast of those 256 log-ratios onto the token
  * stream, and one per-doc integer sum — no shuffle carries anything
  * wider than (doc_id, bucket). Mixture sampling is one per-group count,
  * a broadcast of per-group rates, and a per-row hash compare.
  */
object CurationOps {

  /** 256 hashed feature buckets: the first two md5 hex chars of the
    * token. Cheap, engine-portable, and collision-uniform — the hashed
    * n-gram trick from the DSIR paper at its smallest useful size. */
  private def bucketOf(tok: org.apache.spark.sql.Column) =
    substring(md5(tok), 1, 2)

  /** Importance score per document: sum over tokens of
    * ln(p_target(bucket)) − ln(p_corpus(bucket)), add-1 smoothed over the
    * 256-bucket domain, integerized to micro-nats per token BEFORE the
    * per-doc sum (double-summation order is nondeterministic under
    * shuffle; integer summation is exact). Target distribution = the
    * English subcorpus; the score therefore ranks documents by how
    * English-unigram-like their token mass is. */
  def dsirImportance(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
      .withColumn("bucket", bucketOf(col("tok")))

    val targetCounts = toks.filter(col("lang") === "en")
      .groupBy("bucket").agg(count(lit(1)).as("c_t"))
    val corpusCounts = toks.groupBy("bucket").agg(count(lit(1)).as("c_s"))

    // full 256-bucket domain so add-1 smoothing covers unseen buckets
    val domain = spark.range(256)
      .select(format_string("%02x", col("id")).as("bucket"))
    val dist = domain
      .join(targetCounts, Seq("bucket"), "left")
      .join(corpusCounts, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("c_t"), lit(0L)).as("c_t"),
        coalesce(col("c_s"), lit(0L)).as("c_s"))
    val totals = dist.agg(sum("c_t").as("tt"), sum("c_s").as("ts"))
    val lr = dist.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("c_t") + 1).cast("double") / (col("tt") + 256).cast("double")) -
          log((col("c_s") + 1).cast("double") / (col("ts") + 256).cast("double")))
          .as("lr"))
      .select(col("bucket"), round(col("lr") * 1e6).cast("long").as("micro"))

    toks.join(broadcast(lr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("micro").as("score_micro"))
      .orderBy("doc_id")
  }

  /** Temperature-flattened mixture sampling (τ = 0.5): each group g is
    * down-sampled at rate min(1, K/√n_g), i.e. an expected budget of
    * K·√n_g docs per group — the τ-power flattening of the natural
    * distribution, without any cross-group normalizing sum (a double
    * reduction whose order would differ between engines). The keep
    * decision is a pure hash threshold: md5(doc_id) as a 32-bit hex
    * fraction under floor(rate·2³²), so membership is deterministic,
    * id-stable, and identical in any engine. */
  def mixtureSample(docs: DataFrame, groupCol: String, k: Double): DataFrame =
    mixtureKept(docs, groupCol, k)
      .groupBy(col(groupCol), col("n_docs"), round(col("rate"), 6).as("rate"))
      .agg(sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col(groupCol))

  /** Row-level form of [[mixtureSample]]: the input plus `n_docs`, `rate`,
    * and the deterministic `kept` decision — the shape a pipeline composes
    * (filter on `kept`) while the aggregate gate reports the census. */
  def mixtureKept(docs: DataFrame, groupCol: String, k: Double): DataFrame = {
    val rates = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rate", least(lit(1.0), lit(k) / sqrt(col("n_docs"))))
      .withColumn("cut",
        format_string("%08x", floor(col("rate") * lit(4294967296.0)).cast("long")))
    docs.join(broadcast(rates), Seq(groupCol))
      .withColumn("kept",
        col("rate") >= 1.0 ||
          substring(md5(col("doc_id").cast("string")), 1, 8) < col("cut"))
      .drop("cut")
  }

  /** Contiguous sequence packing: assign each document to a training
    * context-window bin of `binTokens` tokens, filled in doc_id order
    * within each stream (source). A document's bin is where its FIRST
    * token lands in the concatenated stream — the standard
    * concat-and-chop packing used to build fixed-length pretraining
    * batches. One shuffle (by stream) + an in-partition running sum —
    * the canonical distributed cumsum. Per-stream sequentiality is
    * inherent to contiguous packing (a hot stream serializes); the 100 TB
    * form shards each source into independent streams upstream. */
  def sequencePacking(docs: DataFrame, binTokens: Int,
                      streamCol: String = "source"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(streamCol)).orderBy(col("doc_id"))
    docs.select(col(streamCol), col("doc_id"),
        size(split(col("text"), " ")).as("n_tok"))
      .withColumn("start", sum(col("n_tok")).over(w) - col("n_tok"))
      .withColumn("bin_id", floor(col("start") / binTokens))
      .groupBy(col(streamCol), col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
      .orderBy(col(streamCol), col("bin_id"))
  }

  /** CCNet-style unigram-LM perplexity signal (Wenzek et al. 2020 filter
    * corpora by LM perplexity; the unigram LM is the degenerate exact
    * form): per-document mean negative log-likelihood under the corpus's
    * own unigram distribution, integerized to micro-nats per token before
    * the per-doc sum (same determinism rule as DSIR). Exact-vocab form —
    * the synthetic vocabulary is small; at 100 TB the vocab table is
    * either still broadcast-able after min-count pruning (Zipf: the tail
    * is hapaxes a min-count drops) or hashed into bounded buckets exactly
    * like [[dsirImportance]]. */
  def unigramPerplexity(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("n"))
    val nll = counts.crossJoin(broadcast(total))
      .select(col("tok"),
        round(-log(col("c").cast("double") / col("n").cast("double")) * 1e6)
          .cast("long").as("nll_micro"))
    toks.join(broadcast(nll), Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("nll_micro").as("nll_micro_sum"))
      .withColumn("mean_nll",
        round(col("nll_micro_sum").cast("double") / col("n_tokens") / 1e6, 6))
      .orderBy("doc_id")
  }

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "unigram_perplexity" -> ((s, dir) =>
      unigramPerplexity(Tables.documents(s, dir))),
    "dsir_importance" -> ((s, dir) => dsirImportance(Tables.documents(s, dir))),
    "mixture_sample" -> ((s, dir) =>
      mixtureSample(Tables.documents(s, dir), "lang", k = 5.0)),
    "sequence_packing" -> ((s, dir) =>
      sequencePacking(Tables.documents(s, dir), binTokens = 2048)),

    // THE composed curation pass — the realistic 100 TB shape: quality
    // gate → exact dedup (min-id survivor per content digest) →
    // temperature-mixture sampling, reported as a per-language funnel
    // census. Every stage is deterministic, so the whole composition
    // hash-matches DuckDB end-to-end. Plan shape: one window by content
    // digest (dedup), one broadcast of per-lang rates, three lang
    // aggregates joined — no stage shuffles document text more than once.
    // THE FULL PRETRAINING PASS (round 5) — every curation stage a modern
    // pipeline runs, composed as one lazy DataFrame program and
    // hash-matched against DuckDB END TO END: exact-substring span removal
    // (Lee et al.) → quality gate on the CLEANED text → 5-gram benchmark
    // decontamination of the cleaned text vs the eval split → exact dedup
    // (min-id survivor per cleaned-content digest) → temperature-mixture
    // sampling, reported as a per-language funnel census. Each stage's
    // scale shape is its operator's (census shuffles grams, scrub is the
    // native expression, dedup is one window, rates broadcast).
    "pretrain_pipeline" -> ((s, dir) => {
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, dir)
      val clean = graft.operators.Dedup.removeDuplicateSpans(docs, n = 10)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("n_clean", (col("n_words") - col("n_removed")).cast("long"))
      val quality = clean.filter(col("n_clean") >= 50)
      val train = quality.filter(col("doc_id") % 50 =!= 0)
      val evalGrams = quality.filter(col("doc_id") % 50 === 0)
        .select(explode(TextFunctions.shingles(col("text_clean"), 5)).as("g"))
        .distinct()
      val contaminated = train
        .select(col("doc_id"),
          explode(TextFunctions.shingles(col("text_clean"), 5)).as("g"))
        .join(evalGrams, Seq("g"), "left_semi")
        .select("doc_id").distinct()
      val decon = train.join(contaminated, Seq("doc_id"), "left_anti")
      val uniq = graft.operators.Dedup.dropExactDups(decon,
        idCol = "doc_id", textCol = "text_clean")
      val kept = mixtureKept(uniq, "lang", k = 5.0).filter(col("kept"))
      val i = docs.groupBy("lang").agg(count(lit(1)).as("n_input"))
      val q = train.groupBy("lang").agg(count(lit(1)).as("n_train_quality"))
      val dd = decon.groupBy("lang").agg(count(lit(1)).as("n_decontaminated"))
      val uu = uniq.groupBy("lang").agg(count(lit(1)).as("n_unique"))
      val kk = kept.groupBy("lang").agg(count(lit(1)).as("n_kept"),
        sum(col("n_clean")).as("tokens_kept"), min("doc_id").as("min_kept_id"))
      i.join(q, Seq("lang"), "left").join(dd, Seq("lang"), "left")
        .join(uu, Seq("lang"), "left").join(kk, Seq("lang"), "left")
        .orderBy("lang")
    }),

    // the TRAINED classifier scoring in the pipeline (VERDICT r12 task
    // #6): train on folds ≠ 0 (same run the coeffs/auc gates replay),
    // then drive three micro-batches + one replayed batch through the
    // streaming scorer's batch function; the verdict TABLE is the gate
    // output — per-doc quantized score, keep verdict, teacher parity —
    // and DuckDB replays training + scoring + teacher end to end.
    "curation_scored_batch" -> ((s, dir) => {
      import graft.operators.{CommitLog, Features, QualityModel}
      val docs = Tables.documents(s, dir)
      val feats = QualityModel.documentFeatures
      val w = QualityModel.trainLogistic(
        docs.filter(Features.foldOf(col("doc_id"), 5) =!= 0), feats,
        QualityModel.documentQualityLabel, lr = 0.5, epochs = 6)
      val table = java.nio.file.Files
        .createTempDirectory("graft_scored").toString + "/verdicts"
      // the three scoring commits carry DISTINCT tokens and score with
      // the same frozen weights — independent appends whose order the
      // verdict table cannot observe (the commit log's optimistic claim
      // serializes racing versions), so they overlap on driver threads
      // (guide §2.6) instead of each paying its commit line serially
      graft.core.Concurrent.all((0 until 3).map(b => () =>
        graft.streaming.CurationStream.scoredIntakeBatch(
          docs.filter(pmod(col("doc_id"), lit(3)) === b), b, w, table)): _*)
      // replayed epoch: the token must no-op or doc rows double — runs
      // AFTER the joins above so batch 1's first commit is visible
      graft.streaming.CurationStream.scoredIntakeBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === 1), 1, w, table)
      CommitLog.scan(s, table)
        .select(col("doc_id"), col("epoch"), col("zq"), col("kept"),
          col("teacher"))
        .orderBy(col("doc_id"))
    }),

    "curation_pipeline" -> ((s, dir) => {
      val base = Tables.documents(s, dir)
        .withColumn("n_tok", size(split(col("text"), " ")))
        .filter(col("n_tok") >= 50)
      val uniq = graft.operators.Dedup.dropExactDups(base)
      val kept = mixtureKept(uniq, "lang", k = 5.0).filter(col("kept"))
      val cand = base.groupBy("lang").agg(count(lit(1)).as("n_candidates"))
      val un = uniq.groupBy("lang").agg(count(lit(1)).as("n_unique"))
      val kk = kept.groupBy("lang").agg(
        count(lit(1)).as("n_kept"), sum("n_tok").as("tokens_kept"),
        min("doc_id").as("min_kept_id"), max("doc_id").as("max_kept_id"))
      cand.join(un, Seq("lang")).join(kk, Seq("lang"), "left")
        .orderBy("lang")
    })
  )

  def oracles: Map[String, String] = Map(
    "curation_scored_batch" -> graft.operators.QualityModel
      .scoredBatchOracleSql(lr = 0.5, epochs = 6, folds = 5, testFold = 0,
        batches = 3),
    "unigram_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM counts),
        |nll AS (
        |  SELECT tok,
        |    CAST(round(-ln(c / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS nll_micro
        |  FROM counts, tot)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(nll.nll_micro) AS BIGINT) AS nll_micro_sum,
        |  round(CAST(sum(nll.nll_micro) AS DOUBLE) / count(*) / 1e6, 6)
        |    AS mean_nll
        |FROM toks t JOIN nll USING (tok)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "dsir_importance" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, substr(md5(tok), 1, 2) AS bucket
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |domain AS (SELECT printf('%02x', i) AS bucket FROM range(256) t(i)),
        |tc AS (SELECT bucket, count(*) AS c_t FROM toks WHERE lang = 'en' GROUP BY 1),
        |sc AS (SELECT bucket, count(*) AS c_s FROM toks GROUP BY 1),
        |dist AS (
        |  SELECT d.bucket, coalesce(tc.c_t, 0) AS c_t, coalesce(sc.c_s, 0) AS c_s
        |  FROM domain d LEFT JOIN tc USING (bucket) LEFT JOIN sc USING (bucket)),
        |tot AS (SELECT sum(c_t) AS tt, sum(c_s) AS ts FROM dist),
        |lr AS (
        |  SELECT bucket,
        |    CAST(round((ln((c_t + 1) / CAST(tt + 256 AS DOUBLE))
        |              - ln((c_s + 1) / CAST(ts + 256 AS DOUBLE))) * 1e6) AS BIGINT)
        |      AS micro
        |  FROM dist, tot)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(lr.micro) AS BIGINT) AS score_micro
        |FROM toks t JOIN lr USING (bucket)
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "mixture_sample" ->
      """WITH rates AS (
        |  SELECT lang, count(*) AS n_docs,
        |    least(1.0, 5.0 / sqrt(count(*))) AS rate
        |  FROM documents GROUP BY 1),
        |cuts AS (
        |  SELECT lang, n_docs, rate,
        |    printf('%08x', CAST(floor(rate * 4294967296.0) AS BIGINT)) AS cut
        |  FROM rates)
        |SELECT d.lang, c.n_docs, round(c.rate, 6) AS rate,
        |  CAST(sum(CASE WHEN c.rate >= 1.0
        |        OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < c.cut
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN cuts c USING (lang)
        |GROUP BY d.lang, c.n_docs, c.rate ORDER BY d.lang""".stripMargin,
    "sequence_packing" ->
      """WITH t AS (
        |  SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS start
        |  FROM t)
        |SELECT source, CAST(floor(start / 2048.0) AS BIGINT) AS bin_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM c GROUP BY source, bin_id ORDER BY source, bin_id""".stripMargin,
    "pretrain_pipeline" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
        |gr AS (SELECT doc_id,
        |    unnest(CASE WHEN len(w) < 10 THEN [0]
        |      ELSE list_transform(range(1, len(w) - 8), i -> i - 1) END) AS gpos,
        |    unnest(CASE WHEN len(w) < 10 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 8),
        |        i -> array_to_string(w[i:i+9], ' ')) END) AS g
        |  FROM t),
        |dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
        |    FROM gr GROUP BY g) WHERE nd >= 2),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(gpos, gpos + 10)) AS widx
        |  FROM gr WHERE g IN (SELECT g FROM dup)),
        |words AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) + 1), i -> i - 1)) AS widx,
        |    unnest(w) AS word
        |  FROM t),
        |keptw AS (SELECT * FROM words ANTI JOIN cov USING (doc_id, widx)),
        |reb AS (SELECT doc_id, string_agg(word, ' ' ORDER BY widx) AS text_clean,
        |    count(*) AS n_clean
        |  FROM keptw GROUP BY doc_id),
        |clean AS (SELECT t.doc_id, t.lang,
        |    coalesce(r.text_clean, '') AS text_clean,
        |    CAST(coalesce(r.n_clean, 0) AS BIGINT) AS n_clean
        |  FROM t LEFT JOIN reb r USING (doc_id)),
        |quality AS (SELECT * FROM clean WHERE n_clean >= 50),
        |train AS (SELECT * FROM quality WHERE doc_id % 50 <> 0),
        |cgrams AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) - 3),
        |      i -> array_to_string(w[i:i+4], ' '))) AS g
        |  FROM (SELECT doc_id, string_split(text_clean, ' ') AS w FROM quality)),
        |eg AS (SELECT DISTINCT g FROM cgrams WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT doc_id FROM cgrams
        |  WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM eg)),
        |decon AS (SELECT * FROM train
        |  WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
        |uniq AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text_clean)
        |      ORDER BY doc_id) AS rn FROM decon) WHERE rn = 1),
        |rates AS (SELECT lang, least(1.0, 5.0 / sqrt(count(*))) AS rate
        |  FROM uniq GROUP BY 1),
        |keptd AS (SELECT u.* FROM uniq u JOIN rates r USING (lang)
        |  WHERE r.rate >= 1.0
        |     OR substr(md5(CAST(u.doc_id AS VARCHAR)), 1, 8)
        |        < printf('%08x', CAST(floor(r.rate * 4294967296.0) AS BIGINT))),
        |i AS (SELECT lang, count(*) AS n_input FROM t GROUP BY 1),
        |q AS (SELECT lang, count(*) AS n_train_quality FROM train GROUP BY 1),
        |dd AS (SELECT lang, count(*) AS n_decontaminated FROM decon GROUP BY 1),
        |uu AS (SELECT lang, count(*) AS n_unique FROM uniq GROUP BY 1),
        |kk AS (SELECT lang, count(*) AS n_kept,
        |    CAST(sum(n_clean) AS BIGINT) AS tokens_kept,
        |    min(doc_id) AS min_kept_id
        |  FROM keptd GROUP BY 1)
        |SELECT i.lang, i.n_input, q.n_train_quality, dd.n_decontaminated,
        |  uu.n_unique, kk.n_kept, kk.tokens_kept, kk.min_kept_id
        |FROM i LEFT JOIN q USING (lang) LEFT JOIN dd USING (lang)
        |  LEFT JOIN uu USING (lang) LEFT JOIN kk USING (lang)
        |ORDER BY i.lang""".stripMargin,
    "curation_pipeline" ->
      """WITH base AS (
        |  SELECT doc_id, lang, text, len(string_split(text, ' ')) AS n_tok
        |  FROM documents WHERE len(string_split(text, ' ')) >= 50),
        |uniq AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY doc_id) AS rn FROM base) WHERE rn = 1),
        |rates AS (
        |  SELECT lang, least(1.0, 5.0 / sqrt(count(*))) AS rate
        |  FROM uniq GROUP BY 1),
        |kept AS (
        |  SELECT u.* FROM uniq u JOIN rates r USING (lang)
        |  WHERE r.rate >= 1.0
        |     OR substr(md5(CAST(u.doc_id AS VARCHAR)), 1, 8)
        |        < printf('%08x', CAST(floor(r.rate * 4294967296.0) AS BIGINT))),
        |cand AS (SELECT lang, count(*) AS n_candidates FROM base GROUP BY 1),
        |un AS (SELECT lang, count(*) AS n_unique FROM uniq GROUP BY 1),
        |k AS (
        |  SELECT lang, count(*) AS n_kept,
        |    CAST(sum(n_tok) AS BIGINT) AS tokens_kept,
        |    min(doc_id) AS min_kept_id, max(doc_id) AS max_kept_id
        |  FROM kept GROUP BY 1)
        |SELECT c.lang, c.n_candidates, un.n_unique,
        |  k.n_kept, k.tokens_kept, k.min_kept_id, k.max_kept_id
        |FROM cand c JOIN un USING (lang) LEFT JOIN k USING (lang)
        |ORDER BY c.lang""".stripMargin
  )
}
