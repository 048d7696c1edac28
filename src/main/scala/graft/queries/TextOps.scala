package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis gate queries over the `documents` table
  * (doc_id, text, lang, source, n_chars). */
object TextOps {

  /** Fixed query batch for the bm25 gate (terms from the synthetic corpus
    * vocabulary), shared verbatim by the Spark query and the oracle. */
  private val Bm25Queries = Seq(
    "q1" -> "hash join merge",
    "q2" -> "vector scan batch window",
    "q3" -> "customer order line")
  private def Bm25QueriesSql: String =
    Bm25Queries.map { case (q, t) => s"('$q', '$t')" }.mkString(", ")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting: whitespace + BPE-ish estimate + content fingerprint,
    // fused into ONE native two-pass expression (graft_token_stats) — the
    // three-regex declarative form re-scanned the text three times and ran
    // 12× DuckDB at sf0.1 (VERDICT r5 #3).
    "text_token_stats" -> ((s, dir) => {
      graft.plans.TextExprs.install(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.plans.TextExprs.tokenStats(col("text")).as("ts"))
        .select(col("doc_id"), col("ts.n_tokens").as("n_tokens"),
          col("ts.bpe_estimate").as("bpe_estimate"), col("ts.fp").as("fp"))
        // repartition(1)+sort, not orderBy: the global sort's range
        // sampling would execute the stats scan twice; output is one row
        // per doc (tiny), the scan is the cost
        .repartition(1).sortWithinPartitions("doc_id")
    }),

    // Gopher-style repetition filters (Rae et al. 2021 §A1.1: the
    // quality signals for machine-generated / boilerplate text that
    // length and stopword mixes miss): per doc, the fraction of
    // characters covered by the single most frequent 2-gram
    // (count·len/chars, ties → lexicographically smallest gram) and the
    // fraction covered by DUPLICATED 10-grams (Σ count·len over grams
    // with count ≥ 2, capped at 1 — overlap-counted, the standard
    // approximation). Short docs fall into shingles' whole-text branch
    // (one gram ≈ the doc) — degenerate content flags itself.
    // Scale shape: explode + per-(doc, gram) count — the shuffle carries
    // (doc_id, gram) pairs, the same grain every dedup op here shuffles;
    // the top-gram pick is a per-doc window, never global.
    "repetition_stats" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"), length(col("text")).as("nc"))
      def gramCounts(n: Int) = docs
        .select(col("doc_id"), col("nc"),
          explode(shingles(col("text"), n)).as("g"))
        .groupBy(col("doc_id"), col("nc"), col("g"))
        .agg(count(lit(1)).as("c"))
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("c").desc, col("g").asc)
      val top2 = gramCounts(2)
        .withColumn("rn", row_number().over(w2)).filter(col("rn") === 1)
        .select(col("doc_id"),
          round(col("c") * length(col("g")) / col("nc"), 6).as("top2_frac"))
      val dup10 = gramCounts(10)
        .filter(col("c") >= 2)
        .groupBy(col("doc_id"), col("nc"))
        .agg(sum(col("c") * length(col("g"))).as("dupchars"))
        .select(col("doc_id"),
          round(least(lit(1.0), col("dupchars") / col("nc")), 6).as("dup10_frac"))
      docs.select(col("doc_id"))
        .join(top2, Seq("doc_id"), "left")
        .join(dup10, Seq("doc_id"), "left")
        .na.fill(0.0, Seq("top2_frac", "dup10_frac"))
        .withColumn("gopher_flag",
          col("top2_frac") > 0.2 || col("dup10_frac") > 0.3)
        .orderBy(col("doc_id"))
    }),

    // quality scoring (length/shape/stopword mix).
    "text_quality" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        round(stopwordRatio(col("text")), 6).as("stop_ratio"),
        qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    }),

    // percentile-style quality-threshold selection: keep the global top
    // 70% by quality, report the cutoff and per-language retention (how a
    // curation pass picks a score threshold for a target keep-rate, and
    // sees which languages it biases against). The cutoff is RANK-based —
    // min of the top-k via TakeOrderedAndProject, an exact data value —
    // not an interpolated percentile, so no float arithmetic exists for
    // engines to disagree on at the >= boundary.
    "quality_cutoff_retention" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        qualityScore(col("text")).as("quality"))
      val k = (7L * docs.count() / 10L).toInt
      val cut = docs.orderBy(col("quality").desc, col("doc_id")).limit(k)
        .agg(min(col("quality")).as("cut"))
      docs.crossJoin(broadcast(cut))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("quality") >= col("cut"), 1)).as("kept"),
          first(col("cut")).as("cutoff"))
        .withColumn("retention",
          round(col("kept").cast("double") / col("n_docs").cast("double"), 6))
        .orderBy(col("lang"))
    }),

    // one BPE vocabulary-induction round at corpus scale: adjacent
    // character-pair frequencies over all words, deterministic greedy
    // order (count desc, pair asc). The iterative trainer
    // (Vocab.bpeTrain) is spec-pinned against a naive in-JVM BPE; this
    // gate pins the distributed counting shape it repeats each round.
    "bpe_pair_counts" -> ((s, dir) =>
      graft.operators.Vocab.pairCounts(Tables.documents(s, dir), topK = 50)),

    // the encode side as checked invariants: train 10 merges on the
    // corpus, tokenize every document with the rank loop, and pin (1)
    // losslessness — tokens concatenate back to the exact spaceless text,
    // char for char (DuckDB recomputes the expected total) — and (2)
    // strict compression — the merge table actually shortened the corpus.
    "bpe_encode_check" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val merges = graft.operators.Vocab.bpeTrain(docs, merges = 10)
      graft.operators.Vocab.encode(docs, merges)
        .select(col("tokens"), col("n_tokens"),
          regexp_replace(col("text"), " ", "").as("flat"))
        .agg(
          sum(length(concat_ws("", col("tokens")))).cast("long")
            .as("total_token_chars"),
          min(concat_ws("", col("tokens")) === col("flat")).as("lossless"),
          (sum(col("n_tokens")) < sum(length(col("flat"))))
            .as("tokens_strictly_fewer"))
    }),

    // language ID (marker heuristic) vs the labeled lang column.
    "text_langid" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), langId(col("text")).as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    }),

    // cleaning/normalization pipeline: lowercase → non-printables to
    // spaces → collapse runs → trim (the pre-tokenization normal form).
    "text_normalize" -> ((s, dir) => {
      val cleaned = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^ -~]", " "), " +", " "))
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(cleaned).as("n_clean"),
        substring(md5(cleaned), 1, 16).as("fp_clean"))
        .orderBy(col("doc_id"))
    }),

    // A9 explode: corpus token frequencies.
    "explode_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    }),

    // Gopher-style repetition signals (Rae et al. 2021 §A1.1: duplicate
    // word / top-n-gram / duplicate-n-gram fractions — the standard
    // "remove repetitious documents" filters of large-scale text curation).
    // Per-row ratios of integer counts → deterministic under any
    // partitioning. The n-gram mode is computed distributively
    // (explode → per-(doc,gram) count → per-doc max), not with a per-row
    // O(k²) expression, so the same plan holds on a 100 TB corpus.
    "text_repetition" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"),
        size(tokens(col("text"))).as("n_words"),
        size(array_distinct(tokens(col("text")))).as("n_distinct_words"))
      def gramStats(n: Int, top: Boolean): DataFrame = {
        val g = docs.select(col("doc_id"),
          explode(shingles(col("text"), n)).as("g"))
          .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id"))
        if (top) g.agg(max(col("c")).as(s"top_${n}gram"),
          sum(col("c")).as(s"total_${n}gram"))
        else g.agg(count(lit(1)).as(s"distinct_${n}gram"),
          sum(col("c")).as(s"total_${n}gram_d"))
      }
      base
        .join(gramStats(2, top = true), "doc_id")
        .join(gramStats(5, top = false), "doc_id")
        .select(col("doc_id"),
          round(lit(1.0) - col("n_distinct_words").cast("double") / col("n_words"), 6)
            .as("dup_word_frac"),
          round(col("top_2gram").cast("double") / col("total_2gram"), 6)
            .as("top_2gram_frac"),
          round(lit(1.0) - col("distinct_5gram").cast("double") / col("total_5gram_d"), 6)
            .as("dup_5gram_frac"))
        .orderBy(col("doc_id"))
    }),

    // TF-IDF top-3 terms per document: term frequency and document
    // frequency are two aggregates over the exploded term list; the corpus
    // size joins in as a broadcast 1-row aggregate (no driver-side count in
    // the plan); ranking is a per-doc window over the scored terms.
    // Scores are rounded to 6 dp BEFORE ranking so cross-engine ulp noise
    // in ln() can't flip a rank — ties break deterministically by term.
    "tfidf_top_terms" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf", round(col("tf") *
          log(col("n_docs").cast("double") / col("df")), 6))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
        .orderBy(col("doc_id"), col("rank"))
    }),

    // BM25 top-10 retrieval for a fixed query batch — the inverted-index
    // probe (operators/Retrieval.scala): postings pruned to query terms
    // before any shuffle, broadcast stats, per-query window top-k.
    "bm25_topk" -> ((s, dir) =>
      // no final sort: 30 output rows, the driver compares multisets —
      // a cosmetic global order would add a whole extra stage
      graft.operators.Retrieval.bm25TopK(s, Tables.documents(s, dir),
        "doc_id", "text", Bm25Queries, k = 10)),

    // Benchmark decontamination (the GPT-3 appendix-C / PaLM style n-gram
    // overlap check): flag every training document sharing at least one
    // 5-gram with the held-out eval set (here: every 50th doc). Both sides
    // explode to (gram, id) rows; the flag is one distinct semi-join —
    // grams hash-shuffle, documents never do, so the same plan
    // decontaminates a 100 TB corpus against a fixed benchmark suite.
    "decontaminate_overlap" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(col("doc_id") % 50 === 0)
      val trainSet = docs.filter(col("doc_id") % 50 =!= 0)
      val evalGrams = evalSet
        .select(explode(shingles(col("text"), 5)).as("g")).distinct()
      val trainGrams = trainSet
        .select(col("doc_id"), explode(shingles(col("text"), 5)).as("g"))
      val contaminated = trainGrams.join(evalGrams, Seq("g"), "left_semi")
        .select("doc_id").distinct()
      trainSet.join(contaminated.withColumn("contaminated", lit(true)),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"))
        .orderBy(col("doc_id"))
    }),

    // Bloom-filter decontamination contract: the broadcast-sketch variant
    // ([[graft.operators.Dedup.bloomContaminated]] — zero train-side gram
    // shuffle) must flag a certified SUPERSET of the exact semi-join's
    // docs (Bloom error is one-sided: no false negatives) with a bounded
    // doc-level false-positive rate. DuckDB pins the exact flagged count;
    // the booleans pin the two Bloom guarantees.
    "decontaminate_bloom_check" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(col("doc_id") % 50 === 0)
      val trainSet = docs.filter(col("doc_id") % 50 =!= 0)
      val evalGrams = evalSet
        .select(explode(shingles(col("text"), 5)).as("g")).distinct()
      val exact = trainSet
        .select(col("doc_id"), explode(shingles(col("text"), 5)).as("g"))
        .join(evalGrams, Seq("g"), "left_semi")
        .select("doc_id").distinct()
      val bloom = graft.operators.Dedup
        .bloomContaminated(trainSet, evalSet, n = 5)
        .filter(col("contaminated")).select("doc_id")
      val (nExact, nBloom, nHit, nTrain) =
        graft.core.Caching.withCached(exact, bloom) {
          (exact.count(), bloom.count(),
            exact.join(bloom, Seq("doc_id"), "left_semi").count(),
            trainSet.count())
        }
      Seq((nExact, nHit == nExact, (nBloom - nHit) * 100L <= nTrain))
        .toDF("exact_flagged", "no_false_negatives", "fp_rate_le_1pct")
    }),

    // PII detection + redaction census (the standard pre-training scrub
    // pass). The synthetic corpus is digit-free word soup, so the gate
    // splices deterministic contact lines — a pure function of doc_id —
    // into each document before detecting; both engines build the
    // identical input, so the nonzero per-class counts and the scrubbed
    // fingerprint exercise real cross-engine regex parity. Per-row only:
    // no shuffle, the same plan scrubs a 100 TB corpus.
    "text_pii_scrub" -> ((s, dir) => {
      val salted = concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit("."),
        ((col("doc_id") * 7) % 256).cast("string"),
        lit(" call 555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-"), lpad(((col("doc_id") * 13) % 10000).cast("string"), 4, "0"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        piiCount(salted, "email").as("n_email"),
        piiCount(salted, "ipv4").as("n_ipv4"),
        piiCount(salted, "phone").as("n_phone"),
        substring(md5(piiScrub(salted)), 1, 16).as("fp_scrubbed"))
        .orderBy(col("doc_id"))
    }),

    // C4/Gopher-style keep/drop verdicts over the repetition + length
    // signals, aggregated to a per-reason census (the form a curation run
    // reports). Thresholds adapted to this corpus's synthetic word-soup
    // distribution (Gopher's published 0.3 dup-word cut would drop
    // everything here) so all three verdict classes are populated.
    "quality_filter" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = tokens(col("text"))
      val nWords = size(toks)
      val dupFrac = lit(1.0) - size(array_distinct(toks)).cast("double") / nWords
      val tooShort = nWords < 50
      val tooRepetitive = dupFrac > 0.6
      docs.select(
        when(tooShort, "too_short")
          .when(tooRepetitive, "too_repetitive")
          .otherwise("keep").as("verdict"))
        .groupBy(col("verdict")).agg(count(lit(1)).as("n"))
        .orderBy(col("verdict"))
    })
  )

  private val stopList = EnglishStopwords.map(w => s"'$w'").mkString(", ")
  private def markerList(lang: String) =
    LangMarkers.find(_._1 == lang).get._2.map(w => s"'$w'").mkString(", ")

  def oracles: Map[String, String] = Map(
    "repetition_stats" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws,
        |                  length(text) AS nc FROM documents),
        |g2 AS (
        |  SELECT doc_id, nc, array_to_string(ws[i:i+1], ' ') AS g
        |  FROM t, generate_series(1, 8192) s(i) WHERE i <= len(ws) - 1
        |  UNION ALL
        |  SELECT doc_id, nc, array_to_string(ws, ' ') AS g
        |  FROM t WHERE len(ws) < 2
        |  UNION ALL
        |  SELECT doc_id, CAST('repetition oracle: doc exceeds 8192 tokens: '
        |                      || len(ws) AS INT), '' FROM t WHERE len(ws) > 8192),
        |g10 AS (
        |  SELECT doc_id, nc, array_to_string(ws[i:i+9], ' ') AS g
        |  FROM t, generate_series(1, 8192) s(i) WHERE i <= len(ws) - 9
        |  UNION ALL
        |  SELECT doc_id, nc, array_to_string(ws, ' ') AS g
        |  FROM t WHERE len(ws) < 10),
        |top2 AS (
        |  SELECT doc_id, round(c * length(g) * 1.0 / nc, 6) AS top2_frac
        |  FROM (SELECT doc_id, nc, g, count(*) AS c FROM g2 GROUP BY 1, 2, 3)
        |  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
        |dup10 AS (
        |  SELECT doc_id, round(least(1.0, sum(c * length(g)) * 1.0 / nc), 6) AS dup10_frac
        |  FROM (SELECT doc_id, nc, g, count(*) AS c FROM g10 GROUP BY 1, 2, 3)
        |  WHERE c >= 2 GROUP BY doc_id, nc)
        |SELECT t.doc_id, coalesce(top2.top2_frac, 0.0) AS top2_frac,
        |       coalesce(dup10.dup10_frac, 0.0) AS dup10_frac,
        |       coalesce(top2.top2_frac, 0.0) > 0.2
        |         OR coalesce(dup10.dup10_frac, 0.0) > 0.3 AS gopher_flag
        |FROM t LEFT JOIN top2 USING (doc_id) LEFT JOIN dup10 USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "text_token_stats" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+'),
        |    r -> CAST(ceil(length(r) / 4.0) AS BIGINT)))
        |    + len(regexp_extract_all(text, '[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_estimate,
        |  substr(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text,' ')) AS DOUBLE) AS ntok,
        |    CAST(len(list_filter(string_split(text,' '), w -> w IN ($stopList))) AS DOUBLE) AS stops
        |  FROM documents)
        |SELECT doc_id,
        |  round(stops / ntok, 6) AS stop_ratio,
        |  round(least(ntok/200.0, 1.0)*0.4
        |    + greatest(0.0, 1.0 - abs(CAST(length(text) AS DOUBLE)/ntok - 5.0)/5.0)*0.4
        |    + least(stops/ntok*5.0, 1.0)*0.2, 6) AS quality
        |FROM t ORDER BY doc_id""".stripMargin,
    "quality_cutoff_retention" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    round(least(CAST(len(string_split(text,' ')) AS DOUBLE)/200.0, 1.0)*0.4
        |      + greatest(0.0, 1.0 - abs(CAST(length(text) AS DOUBLE)
        |          / CAST(len(string_split(text,' ')) AS DOUBLE) - 5.0)/5.0)*0.4
        |      + least(CAST(len(list_filter(string_split(text,' '), w -> w IN ($stopList))) AS DOUBLE)
        |          / CAST(len(string_split(text,' ')) AS DOUBLE)*5.0, 1.0)*0.2, 6) AS quality
        |  FROM documents),
        |r AS (SELECT lang, quality,
        |  row_number() OVER (ORDER BY quality DESC, doc_id) AS rn,
        |  count(*) OVER () AS cnt FROM t),
        |c AS (SELECT min(quality) AS cut FROM r WHERE rn <= (7*cnt)//10)
        |SELECT lang, count(*) AS n_docs,
        |  count(*) FILTER (quality >= c.cut) AS kept,
        |  c.cut AS cutoff,
        |  round(CAST(count(*) FILTER (quality >= c.cut) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE), 6) AS retention
        |FROM t, c GROUP BY lang, c.cut ORDER BY lang""".stripMargin,
    "bpe_pair_counts" ->
      """WITH words AS (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |pr AS (
        |  SELECT substr(w, i, 2) AS pair, count(*) AS n
        |  FROM words, unnest(generate_series(1, len(w) - 1)) AS s(i)
        |  WHERE len(w) >= 2
        |  GROUP BY 1)
        |SELECT pair, n FROM pr ORDER BY n DESC, pair LIMIT 50""".stripMargin,
    "bpe_encode_check" ->
      """SELECT CAST(sum(len(replace(text, ' ', ''))) AS BIGINT) AS total_token_chars,
        |  true AS lossless, true AS tokens_strictly_fewer
        |FROM documents""".stripMargin,
    "text_langid" ->
      s"""WITH h AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("en")}))) AS h_en,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("fr")}))) AS h_fr,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("es")}))) AS h_es,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("de")}))) AS h_de,
        |    len(list_filter(string_split(text,' '), w -> w IN (${markerList("zh")}))) AS h_zh
        |  FROM documents),
        |p AS (
        |  SELECT lang, CASE
        |    WHEN greatest(h_en,h_fr,h_es,h_de,h_zh) = 0 THEN 'und'
        |    WHEN h_en = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'en'
        |    WHEN h_fr = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'fr'
        |    WHEN h_es = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'es'
        |    WHEN h_de = greatest(h_en,h_fr,h_es,h_de,h_zh) THEN 'de'
        |    ELSE 'zh' END AS predicted
        |  FROM h)
        |SELECT lang, predicted, count(*) AS n FROM p
        |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  length(trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', ' ', 'g'), ' +', ' ', 'g'))) AS n_clean,
        |  substr(md5(trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', ' ', 'g'), ' +', ' ', 'g'))), 1, 16) AS fp_clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin,
    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |g2 AS (SELECT doc_id, unnest(CASE WHEN len(w) < 2
        |    THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) END) AS g
        |  FROM t),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g),
        |s2 AS (SELECT doc_id, max(c) AS topc, sum(c) AS tot FROM c2 GROUP BY doc_id),
        |g5 AS (SELECT doc_id, unnest(CASE WHEN len(w) < 5
        |    THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w) - 3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END) AS g
        |  FROM t),
        |c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g),
        |s5 AS (SELECT doc_id, count(*) AS d5, sum(c) AS t5 FROM c5 GROUP BY doc_id),
        |base AS (SELECT doc_id, len(w) AS nw, len(list_distinct(w)) AS ndw FROM t)
        |SELECT b.doc_id,
        |  round(1.0 - CAST(ndw AS DOUBLE) / nw, 6) AS dup_word_frac,
        |  round(CAST(topc AS DOUBLE) / tot, 6) AS top_2gram_frac,
        |  round(1.0 - CAST(d5 AS DOUBLE) / t5, 6) AS dup_5gram_frac
        |FROM base b JOIN s2 USING (doc_id) JOIN s5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "tfidf_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |  FROM scored)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tfidf FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "bm25_topk" ->
      s"""WITH q(qid, qtext) AS (VALUES $Bm25QueriesSql),
        |qt AS (SELECT DISTINCT qid, unnest(string_split(qtext, ' ')) AS term FROM q),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
        |stats AS (SELECT count(*) AS n_docs,
        |  avg(len(string_split(text, ' '))) AS avgdl FROM documents),
        |dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tf
        |  WHERE term IN (SELECT term FROM qt) GROUP BY term),
        |scored AS (
        |  SELECT qt.qid, tf.doc_id,
        |    round(sum(
        |      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) *
        |      (tf.tf * 2.2) /
        |      (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 6) AS score
        |  FROM tf JOIN qt USING (term) JOIN dfreq d USING (term)
        |    JOIN dl USING (doc_id) CROSS JOIN stats s
        |  GROUP BY qt.qid, tf.doc_id),
        |ranked AS (
        |  SELECT qid, doc_id, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS INT) AS rank, doc_id, score FROM ranked
        |WHERE rank <= 10 ORDER BY qid, rank""".stripMargin,
    "decontaminate_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (SELECT doc_id, unnest(CASE WHEN len(w) < 5
        |    THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w) - 3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END) AS g
        |  FROM t),
        |eg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
        |hit AS (SELECT DISTINCT doc_id FROM grams
        |  WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM eg))
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
        |FROM documents d LEFT JOIN hit h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 50 <> 0
        |ORDER BY d.doc_id""".stripMargin,
    "decontaminate_bloom_check" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (SELECT doc_id, unnest(CASE WHEN len(w) < 5
        |    THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w) - 3),
        |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) END) AS g
        |  FROM t),
        |eg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
        |SELECT count(DISTINCT doc_id) AS exact_flagged,
        |  true AS no_false_negatives, true AS fp_rate_le_1pct
        |FROM grams WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM eg)""".stripMargin,
    "text_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |      || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
        |      || ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
        |      || '-' || lpad(CAST((doc_id * 13) % 10000 AS VARCHAR), 4, '0') AS s
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |  len(regexp_extract_all(s, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
        |  len(regexp_extract_all(s, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
        |  substr(md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(s,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
        |    '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
        |    '\b\d{4} \d{4} \d{4} \d{4}\b', '<CARD>', 'g')), 1, 16) AS fp_scrubbed
        |FROM t ORDER BY doc_id""".stripMargin,
    "quality_filter" ->
      """WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |v AS (SELECT CASE WHEN len(w) < 50 THEN 'too_short'
        |    WHEN 1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / len(w) > 0.6
        |      THEN 'too_repetitive'
        |    ELSE 'keep' END AS verdict FROM t)
        |SELECT verdict, count(*) AS n FROM v GROUP BY verdict
        |ORDER BY verdict""".stripMargin
  )
}
