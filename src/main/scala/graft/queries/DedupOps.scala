package graft.queries

import graft.core.Tables
import graft.operators.{Dedup, EntityResolution}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication gate queries over `documents`.
  *
  * `dedup_exact_stats` and `dedup_jaccard_pairs` are exact → DuckDB-oracled.
  * MinHash-LSH and SimHash are hash-family-specific (xxhash64) so they get
  * rows-only driver checks; their correctness is pinned by ScalaTest
  * (LSH recall vs the exact-Jaccard ground truth on the same data).
  */
object DedupOps {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ENTITY RESOLUTION candidate stage: blocked Levenshtein pairs over
    // the distinct part-name dictionary (block = last token). Exact edit
    // distance, so DuckDB replays it verbatim.
    "entity_match_pairs" -> ((s, dir) =>
      EntityResolution.matchPairs(Tables.part(s, dir), "p_name",
          n => element_at(split(n, " "), -1), maxDist = 3)
        .orderBy(col("name_a"), col("name_b"))),

    // Full resolution: records labeled with the component-min entity, then
    // rolled up — distinct-name count and record count per entity.
    "entity_resolution" -> ((s, dir) =>
      EntityResolution.resolve(Tables.part(s, dir), "p_name",
          n => element_at(split(n, " "), -1), maxDist = 3)
        .groupBy(col("entity"))
        .agg(countDistinct(col("p_name")).as("n_names"),
          count(lit(1)).as("n_parts"))
        .orderBy(col("entity"))),

    // exact dedup: corpus-level duplication stats + survivor count.
    "dedup_exact_stats" -> ((s, dir) => {
      Tables.documents(s, dir).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct_text"),
        countDistinct(graft.functions.TextFunctions.fingerprint(col("text"))).as("n_distinct_fp"))
    }),

    // Incremental ingest dedup: the corpus arrives as 4 batches (source
    // number mod 4, replayed in order) and each batch dedups against the
    // digest LEDGER of everything accepted so far
    // ([[Dedup.incrementalDedupBatch]] — commit-log ledger, batch-side
    // broadcast anti-join, effectively-once appends). DuckDB replays the
    // same arrival order as one window: first occurrence per md5(text)
    // ordered by (batch, doc_id) — so the gate checks the cross-batch
    // keeper semantics end to end, including the ledger round-trip.
    "incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ledger = java.nio.file.Files
        .createTempDirectory("graft_inc_dedup").toString + "/ledger"
      val batchOf = expr("CAST(substring(source, 4) AS INT) % 4")
      val t0 = 1704067200000L // 2024-01-01T00:00Z
      (0 until 4).map { b =>
        Dedup.incrementalDedupBatch(
          docs.filter(batchOf === b), ledger,
          new java.sql.Timestamp(t0 + b * 3600000L),
          token = Some(s"batch-$b"))
          .select(col("doc_id"), col("source"))
      }.reduce(_.unionByName(_)).orderBy("doc_id")
    }),

    // incremental FUZZY dedup: four batches through the MinHash band
    // ledger (portable md5 banding → DuckDB replicates the whole run in
    // one statement). Each call commits the batch's band rows with an
    // idempotency token; history reads are candidate-pruned semi joins.
    "incremental_minhash_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ledger = java.nio.file.Files
        .createTempDirectory("graft_inc_lsh").toString + "/ledger"
      val batchOf = expr("CAST(substring(source, 4) AS INT) % 4")
      val t0 = 1704067200000L // 2024-01-01T00:00Z
      // the replay driver: one eager append per batch, all four
      // verification DAGs materialized concurrently in one AQE-off action
      // (vs four serial per-batch materializations — measured ~2-4 s of
      // serial tail per batch)
      Dedup.incrementalMinhashReplay(
        (0 until 4).map(b => docs.filter(batchOf === b)), ledger,
        new java.sql.Timestamp(t0), threshold = 0.8,
        tokenPrefix = Some("batch"), portableBanding = true)
    }),

    // NOTE on row order: the driver gate compares row MULTISETS (columns
    // sorted by name, rows sorted by the harness — scripts/check.py is its
    // replica), so gate queries do not orderBy. On expensive pipelines a
    // trailing orderBy DOUBLES execution (range-partitioner sampling runs
    // the child once before the real pass — DESIGN.md round 6); on the
    // 2.9M-row sf0.1 pair dumps that was ~4 s of pure waste per query.

    // exact token-set Jaccard near-dup pairs, blocked by source.
    "dedup_jaccard_pairs" -> ((s, dir) =>
      Dedup.jaccardPairs(Tables.documents(s, dir), threshold = 0.8)),

    // MinHash+LSH near-dup pairs in the portable md5 banding: the full
    // pair list hash-matches DuckDB's replication of the candidate set.
    // The operator DEFAULT is the faster xxhash64 banding, pinned by its
    // own contract gate (`dedup_lsh_check`) and benched as
    // `dedup_minhash_lsh_fast`.
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), threshold = 0.8,
        portableBanding = true)),

    // the operator-default XXH64 banding at the SAME parameters, for the
    // bench pair (md5 portability cost measured, not guessed). No SQL
    // oracle BY DESIGN: xxhash64 has no cross-engine replication, so the
    // candidate set is engine-specific; the companion `dedup_lsh_check`
    // (which runs this same default path) pins its contracts instead —
    // every emitted pair is exact-verified >= threshold, pair set is a
    // subset of the exact pairs, recall >= 0.9.
    "dedup_minhash_lsh_fast" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), threshold = 0.8)),

    // SimHash near-dup pairs (rows-only).
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(Tables.documents(s, dir), maxHamming = 3)),

    // SimHash with the 4x16-bit-window full-recall guarantee (rows-only;
    // exactness vs brute force pinned in DedupSimilaritySpec).
    "dedup_simhash_complete" -> ((s, dir) =>
      Dedup.simhashPairsComplete(Tables.documents(s, dir), maxHamming = 3)),

    // 3-gram shingle Jaccard (order-sensitive near-dup — word-set dups with
    // different word order score low here).
    "dedup_shingle_jaccard" -> ((s, dir) => {
      val sh = Tables.documents(s, dir).select(col("doc_id").as("id"),
          col("source").as("block"),
          array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3)).as("toks"))
        .withColumn("sz", size(col("toks")))
      val inv = sh.select(col("id"), col("block"), col("sz"), explode(col("toks")).as("tok"))
      val a = inv.select(col("block"), col("tok"), col("id").as("id_a"), col("sz").as("sz_a"))
      val b = inv.select(col("block"), col("tok"), col("id").as("id_b"), col("sz").as("sz_b"))
      a.join(b, Seq("block", "tok")).filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"))
        .agg(count(lit(1)).as("common"))
        .withColumn("jaccard", col("common").cast("double") /
          (col("sz_a") + col("sz_b") - col("common")).cast("double"))
        .filter(col("jaccard") >= 0.2)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // near-dup pairs → dedup clusters: connected components by iterative
    // min-label propagation (oracle: DuckDB recursive CTE closure).
    "dedup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
          Dedup.jaccardPairs(Tables.documents(s, dir), threshold = 0.8))),

    // ADVERSARIAL-DEPTH components: 50 chains of 100 nodes (diameter 99 —
    // min-label propagation would need ~99 rounds; the alternating
    // large-star/small-star operator converges in O(log² n)). The oracle
    // is ANALYTIC: chain graphs have component = id − id % 100, so DuckDB
    // pins the complete label table without a recursive CTE.
    "cc_twostar_chains" -> ((s, dir) => {
      val ids = Tables.documents(s, dir).select(col("doc_id"))
      val pairs = ids.filter(col("doc_id") % 100 =!= 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") - 1).as("id_b"))
      Dedup.connectedComponentsTwoStar(pairs)
    }),

    // canonical selection: keep the LONGEST doc of each near-dup cluster
    // (score = n_chars), not the min-id one — one hash aggregate over a
    // (score, -id) struct, skew-proof via map-side partials.
    "dedup_keep_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val comp = Dedup.connectedComponents(
        Dedup.jaccardPairs(docs, threshold = 0.8))
      val labeled = docs.select(col("doc_id").as("id"), col("n_chars").as("score"))
        .join(comp, Seq("id"), "left")
        .withColumn("component", coalesce(col("component"), col("id")))
      Dedup.keepBest(labeled)
        .select(col("id").as("doc_id"), col("component"), col("keeper"), col("kept"))
    }),

    // THE 100 TB cluster contract: (id, keeper) per document via LSH over
    // representatives + connected components — never materializes
    // member-level pairs (Dedup.clusters scaladoc). Oracled: verified LSH
    // pairs are exact Jaccard >= t, so the closure matches DuckDB's
    // exact-pair recursive closure as long as no bridge pair is missed.
    // Banding here is r=4, b=30: P(miss | J=0.8) = (1-0.8^4)^30 ≈ 1.4e-7 —
    // the default 60/10 (r=6) misses borderline pairs ~5% of the time,
    // measured as a real singleton split at sf0.01.
    "dedup_clusters_lsh" -> ((s, dir) =>
      Dedup.clusters(Tables.documents(s, dir), threshold = 0.8,
          numHashes = 120, bands = 30, portableBanding = true)),

    // Exact substring-level dedup census at word granularity (the Lee et
    // al. 2022 "Deduplicating Training Data" signal): a gram position is
    // duplicated if its 10-gram occurs in >= 2 DISTINCT documents; the
    // per-doc duplicated fraction drives span-removal decisions. One
    // shuffle keyed by the gram; documents themselves never shuffle. At
    // 100 TB the gram key becomes xxhash64(gram) — an 8-byte shuffle key
    // with identical grouping semantics modulo 2^-64 collisions; the gate
    // keeps the string key so the DuckDB comparison is exact.
    "dedup_ngram_spans" -> ((s, dir) =>
      Dedup.ngramSpanStats(Tables.documents(s, dir), n = 10)),

    // the span-removal ACTION for the census above: documents rewritten
    // with every cross-doc-duplicated 10-gram span cut out.
    "dedup_span_removal" -> ((s, dir) =>
      Dedup.removeDuplicateSpans(Tables.documents(s, dir), n = 10)),

    // EXACT duplicated-position set by distributed suffix ranking
    // (prefix doubling — ⌈log₂ n⌉ range exchanges, fixed-width long keys,
    // zero hash collisions). DuckDB replays the span set with literal
    // n-gram strings; the spec pins set-equality with the gram census.
    "suffix_rank_spans" -> ((s, dir) =>
      Dedup.suffixRankDupPositions(Tables.documents(s, dir), n = 10)
        .orderBy(col("id"), col("gpos"))),

    // sketch stats (HLL distinct + KLL-style percentile) — approximate by
    // design, rows-only driver check; exactness bounds pinned in ScalaTest.
    // table profile: the trust-anchor scan before using a new data drop —
    // one wide aggregate row: counts, per-column nulls + EXACT ndv,
    // numeric ranges (operators/Profile.scala; approx form for routine
    // 100 TB monitoring documented there).
    "profile_table" -> ((s, dir) =>
      graft.operators.Profile.profile(
        Tables.events(s, dir), Seq("user_id", "event_type", "value"),
        minMaxCols = Seq("value"))),

    "approx_stats" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("approx_p95"))
        .orderBy(col("event_type"))),

    // ---- subset/recall oracles for the hash-family ops (round 3) ----
    // The pair SETS are hash-implementation-specific (DuckDB cannot compute
    // minhash/simhash), but their CONTRACTS are checkable: each *_check
    // query emits one summary row whose count columns DuckDB verifies
    // independently and whose boolean columns are Spark-computed claims
    // (subset-of-exact, recall bound, blocking completeness) pinned through
    // the driver's hash compare — a regression in any contract flips a
    // boolean and fails the gate.
    "dedup_lsh_check" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id").as("id"),
          graft.functions.TextFunctions.distinctTokens(col("text")).as("toks"))
        .withColumn("sz", size(col("toks")))
      val a = toks.select(col("id").as("id_a"), col("toks").as("toks_a"), col("sz").as("sz_a"))
      val b = toks.select(col("id").as("id_b"), col("toks").as("toks_b"), col("sz").as("sz_b"))
      val common = size(array_intersect(col("toks_a"), col("toks_b")))
      val exact = a.join(b, col("id_a") < col("id_b"))
        .withColumn("j",
          common.cast("double") / (col("sz_a") + col("sz_b") - common).cast("double"))
        .filter(col("j") >= 0.8)
        .select("id_a", "id_b")
      val lsh = Dedup.minhashLshPairs(docs, 0.8).select("id_a", "id_b")
      val (nExact, nLsh, nHit) = graft.core.Caching.withCached(toks, exact, lsh) {
        (exact.count(), lsh.count(),
          lsh.join(exact, Seq("id_a", "id_b"), "left_semi").count())
      }
      Seq((nExact, nLsh == nHit, nHit * 10L >= nExact * 9L))
        .toDF("exact_pairs", "lsh_subset_ok", "lsh_recall_ge_90")
    }),

    "dedup_simhash_check" -> ((s, dir) => {
      import s.implicits._
      graft.plans.HashExprs.install(s)
      val docs = Tables.documents(s, dir)
      val sh = docs.select(col("doc_id").as("id"),
        Dedup.simhash64(graft.functions.TextFunctions.tokens(col("text"))).as("sh"))
      val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
      val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
      val brute = a.join(b, col("id_a") < col("id_b"))
        .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
        .select("id_a", "id_b")
      // cache both candidate sets too: each feeds a count AND a join
      // against brute, and re-deriving them re-tokenizes the whole corpus
      val complete = Dedup.simhashPairsComplete(docs).select("id_a", "id_b")
      val prefix = Dedup.simhashPairs(docs).select("id_a", "id_b")
      val (nBrute, nComplete, nCompleteHit, prefixMisses, nDocs) =
        graft.core.Caching.withCached(sh, brute, complete, prefix) {
          (brute.count(), complete.count(),
            complete.join(brute, Seq("id_a", "id_b"), "left_semi").count(),
            prefix.join(brute, Seq("id_a", "id_b"), "left_anti").count(),
            sh.count())
        }
      Seq((nDocs,
        nComplete == nBrute && nCompleteHit == nBrute, // pigeonhole: ==, not ⊆
        prefixMisses == 0L))
        .toDF("n_docs", "complete_equals_brute", "prefix_subset_of_brute")
    }),

    // sketch error bounds as a checked row: exact_users is DuckDB-verified
    // per group; the booleans assert the sketches stayed inside their
    // documented error envelopes (HLL rsd 0.01 → 5% slack; KLL accuracy
    // 10000 → approx p95 within the exact p94..p96 band).
    "approx_stats_check" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.01).as("au"),
          percentile_approx(col("value"), lit(0.95), lit(10000)).as("ap95"),
          expr("percentile(value, 0.94)").as("p94"),
          expr("percentile(value, 0.96)").as("p96"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("au") - col("exact_users")) <=
            greatest(lit(1L), (col("exact_users") * 0.05).cast("long")))
            .as("hll_within_5pct"),
          (col("ap95") >= col("p94") && col("ap95") <= col("p96"))
            .as("p95_within_band"))
        .orderBy(col("event_type"))),

    // Heavy hitters: exact global top-10 tokens (DuckDB-verified rows)
    // plus Spark's native count-min sketch pinned inside its guarantees —
    // est ≥ true (always, by construction) and est ≤ true + ε·N (holds
    // w.p. 1-δ; deterministic for fixed data + seed). The CMS is THE
    // 100 TB form of "what are the hot tokens": a mergeable fixed-size
    // aggregate, no full vocabulary aggregation needed.
    "heavy_hitters_check" -> ((s, dir) => {
      import s.implicits._
      val toks = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("tok"))
      val total = toks.count()
      val eps = 0.001
      val cms = toks.stat.countMinSketch(
        "tok", eps, 0.99, 42)
      val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_count"))
        .orderBy(col("exact_count").desc, col("tok"))
        .limit(10).collect()
        .zipWithIndex.map { case (r, i) =>
          val est = cms.estimateCount(r.getString(0))
          (i + 1, r.getString(0), r.getLong(1),
            est >= r.getLong(1),
            est <= r.getLong(1) + (eps * total).toLong)
        }
      top.toSeq.toDF("rank", "tok", "exact_count",
        "cms_never_undercounts", "cms_within_eps")
    })
  )

  def oracles: Map[String, String] = Map(
    "entity_match_pairs" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM n)
        |SELECT a.p_name AS name_a, b2.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b2.p_name) AS BIGINT) AS dist
        |FROM b a JOIN b b2 ON a.blk = b2.blk AND a.p_name < b2.p_name
        |WHERE levenshtein(a.p_name, b2.p_name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    "entity_resolution" ->
      """WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, string_split(p_name, ' ')[-1] AS blk FROM n),
        |p AS (
        |  SELECT a.p_name AS na, b2.p_name AS nb
        |  FROM b a JOIN b b2 ON a.blk = b2.blk AND a.p_name < b2.p_name
        |  WHERE levenshtein(a.p_name, b2.p_name) <= 3),
        |edges AS (SELECT na AS a, nb AS b FROM p UNION SELECT nb, na FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        |lab AS (SELECT a AS name, least(a, min(b)) AS entity
        |        FROM reach GROUP BY a)
        |SELECT coalesce(l.entity, t.p_name) AS entity,
        |  count(DISTINCT t.p_name) AS n_names, count(*) AS n_parts
        |FROM part t LEFT JOIN lab l ON t.p_name = l.name
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_exact_stats" ->
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_distinct_text,
        |  count(DISTINCT substr(md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')), 1, 16)) AS n_distinct_fp
        |FROM documents""".stripMargin,
    "incremental_dedup" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY md5(text)
        |      ORDER BY CAST(substr(source, 4) AS INT) % 4, doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // replicates the four-batch MinHash-ledger run: a doc is dropped iff it
    // is exact-Jaccard >= 0.8 similar to ANY earlier-seen doc (earlier
    // batch, or same batch with smaller id) that shares a band key — the
    // same md5+Kirsch-Mitzenmacher banding as dedup_minhash_lsh. Band keys
    // are a pure function of the token SET, so the replication runs at
    // distinct-set granularity (as the operator does): kept iff the doc is
    // the (batch, id)-earliest across its similar-or-same-set
    // neighbourhood — the pairwise "exists earlier similar doc" predicate
    // restated without the doc-level band self-join that is quadratic in
    // mega-duplicate groups.
    "incremental_minhash_dedup" ->
      """WITH t0 AS (
        |  SELECT doc_id AS id, CAST(substr(source, 4) AS INT) % 4 AS batch,
        |         list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents),
        |t AS (SELECT id, batch, toks,
        |        md5(list_aggr(list_sort(toks), 'string_agg', ' ')) AS setkey FROM t0),
        |sets AS (SELECT setkey, arg_min(toks, id) AS toks FROM t GROUP BY setkey),
        |h AS (
        |  SELECT setkey, ('0x'||substr(md5(tok),1,16))::UBIGINT::HUGEINT AS h1,
        |         ('0x'||substr(md5(tok),17,16))::UBIGINT::HUGEINT AS h2
        |  FROM (SELECT setkey, unnest(toks) AS tok FROM sets)),
        |lanes AS (
        |  SELECT setkey, i, min((h1 + i*h2) % 18446744073709551616::HUGEINT) AS lane
        |  FROM h, generate_series(0, 59) s(i) GROUP BY setkey, i),
        |bands AS (
        |  SELECT setkey, i // 6 AS band, string_agg(lane::VARCHAR, ',' ORDER BY i) AS bandkey
        |  FROM lanes GROUP BY setkey, i // 6),
        |cand AS (
        |  SELECT DISTINCT a.setkey AS sa, b.setkey AS sb
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.bandkey = b.bandkey
        |   AND a.setkey < b.setkey),
        |sim AS (
        |  SELECT c.sa, c.sb FROM cand c
        |  JOIN sets x ON x.setkey = c.sa JOIN sets y ON y.setkey = c.sb
        |  WHERE len(list_intersect(x.toks, y.toks))::DOUBLE
        |      / (len(x.toks) + len(y.toks) - len(list_intersect(x.toks, y.toks)))::DOUBLE >= 0.8),
        |nbr AS (
        |  SELECT sa AS setkey, sb AS other FROM sim
        |  UNION SELECT sb, sa FROM sim
        |  UNION SELECT setkey, setkey FROM sets),
        |ord AS (SELECT id, batch, setkey, batch * 10000000 + id AS k FROM t),
        |effmin AS (
        |  SELECT n.setkey, min(o.k) AS mink
        |  FROM nbr n JOIN ord o ON o.setkey = n.other GROUP BY n.setkey)
        |SELECT o.id AS doc_id, o.batch, (o.k = e.mink) AS kept
        |FROM ord o JOIN effmin e ON e.setkey = o.setkey
        |ORDER BY doc_id""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH tok AS (
        |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
        |FROM tok a JOIN tok b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_shingle_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id, source,
        |    list_distinct(CASE WHEN len(string_split(text,' ')) < 3
        |      THEN [text]
        |      ELSE list_transform(range(1, len(string_split(text,' ')) - 1),
        |        i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])
        |      END) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,
    "cc_twostar_chains" ->
      """SELECT doc_id AS id, doc_id - doc_id % 100 AS component
        |FROM documents""".stripMargin,

    "suffix_rank_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  -- constant-bound series (this DuckDB accepts only CONSTANT
        |  -- generate_series params) + a length filter; 8192 comfortably
        |  -- bounds the corpus's max token count
        |  SELECT doc_id, CAST(i - 1 AS INT) AS gpos,
        |         array_to_string(ws[i:i+9], ' ') AS gram
        |  FROM t, generate_series(1, 8192) s(i)
        |  WHERE i <= len(ws) - 9
        |  UNION ALL
        |  SELECT doc_id, 0 AS gpos, array_to_string(ws, ' ') AS gram
        |  FROM t WHERE len(ws) < 10
        |  UNION ALL
        |  -- loud guard: if any doc outgrows the constant series bound the
        |  -- data-dependent cast below errors instead of silently dropping
        |  -- that doc's tail grams on the oracle side only
        |  SELECT doc_id,
        |         CAST('suffix_rank_spans oracle: doc exceeds 8192 tokens: '
        |              || len(ws) AS INT) AS gpos,
        |         '' AS gram
        |  FROM t WHERE len(ws) > 8192),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
        |SELECT g.doc_id AS id, g.gpos AS gpos
        |FROM g JOIN d USING (gram)
        |ORDER BY 1, 2""".stripMargin,

    "dedup_clusters" ->
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
        |nodes AS (SELECT DISTINCT a AS id FROM edges)
        |SELECT n.id, least(n.id, min(r.b)) AS component
        |FROM nodes n JOIN reach r ON r.a = n.id
        |GROUP BY n.id ORDER BY n.id""".stripMargin,
    // canonical selection: keeper = longest doc (ties to smaller id),
    // replicated as max-score-then-min-id two-level aggregation
    "dedup_keep_best" ->
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
        |a AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component,
        |    d.n_chars AS score
        |  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id),
        |mx AS (SELECT component, max(score) AS ms FROM a GROUP BY component),
        |k AS (SELECT a.component, min(a.doc_id) AS keeper
        |  FROM a JOIN mx USING (component) WHERE a.score = mx.ms
        |  GROUP BY a.component)
        |SELECT a.doc_id, a.component, k.keeper, (a.doc_id = k.keeper) AS kept
        |FROM a JOIN k USING (component)""".stripMargin,
    // cluster-form contract: closure over UNBLOCKED exact pairs at J>=0.8,
    // every document present, singletons keep their own id as keeper
    "dedup_clusters_lsh" ->
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
        |comp AS (
        |  SELECT r.a AS id, least(r.a, min(r.b)) AS keeper
        |  FROM reach r GROUP BY r.a)
        |SELECT d.doc_id AS id, coalesce(c.keeper, d.doc_id) AS keeper
        |FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        |ORDER BY id""".stripMargin,
    "dedup_ngram_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |gr AS (SELECT doc_id, unnest(CASE WHEN len(w) < 10
        |    THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(range(1, len(w) - 8),
        |      i -> array_to_string(w[i:i+9], ' ')) END) AS g
        |  FROM t),
        |d AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
        |    FROM gr GROUP BY g) WHERE nd >= 2),
        |per AS (SELECT doc_id, count(*) AS n_grams FROM gr GROUP BY doc_id),
        |dup AS (SELECT doc_id, count(*) AS n_dup_grams FROM gr
        |  WHERE g IN (SELECT g FROM d) GROUP BY doc_id)
        |SELECT p.doc_id, p.n_grams,
        |  coalesce(u.n_dup_grams, 0) AS n_dup_grams,
        |  round(CAST(coalesce(u.n_dup_grams, 0) AS DOUBLE) / p.n_grams, 6) AS dup_frac
        |FROM per p LEFT JOIN dup u USING (doc_id) ORDER BY doc_id""".stripMargin,
    "dedup_span_removal" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |gr AS (SELECT doc_id,
        |    unnest(CASE WHEN len(w) < 10 THEN [0]
        |      ELSE list_transform(range(1, len(w) - 8), i -> i - 1) END) AS gpos,
        |    unnest(CASE WHEN len(w) < 10 THEN [array_to_string(w, ' ')]
        |      ELSE list_transform(range(1, len(w) - 8),
        |        i -> array_to_string(w[i:i+9], ' ')) END) AS g
        |  FROM t),
        |d AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
        |    FROM gr GROUP BY g) WHERE nd >= 2),
        |cov AS (SELECT DISTINCT doc_id, unnest(range(gpos, gpos + 10)) AS widx
        |  FROM gr WHERE g IN (SELECT g FROM d)),
        |words AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(w) + 1), i -> i - 1)) AS widx,
        |    unnest(w) AS word
        |  FROM t),
        |kept AS (SELECT * FROM words ANTI JOIN cov USING (doc_id, widx)),
        |reb AS (SELECT doc_id, string_agg(word, ' ' ORDER BY widx) AS text_clean,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(r.text_clean, '') AS text_clean,
        |  CAST(len(t.w) AS BIGINT) AS n_words,
        |  CAST(len(t.w) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed
        |FROM t LEFT JOIN reb r USING (doc_id) ORDER BY t.doc_id""".stripMargin,
    // subset/recall summary oracles: the count column is genuinely
    // DuckDB-computed; the booleans are Spark-side contract claims the
    // hash compare pins to true
    "dedup_lsh_check" ->
      """WITH tok AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
        |  FROM documents)
        |SELECT count(*) AS exact_pairs,
        |  true AS lsh_subset_ok, true AS lsh_recall_ge_90
        |FROM tok a JOIN tok b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
        |    / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8""".stripMargin,
    "dedup_simhash_check" ->
      """SELECT count(*) AS n_docs, true AS complete_equals_brute,
        |  true AS prefix_subset_of_brute FROM documents""".stripMargin,
    "profile_table" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS user_id_ndv,
        |  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS event_type_ndv,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
        |  CAST(count(DISTINCT value) AS BIGINT) AS value_ndv,
        |  min(value) AS value_min, max(value) AS value_max
        |FROM events""".stripMargin,
    "approx_stats_check" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  true AS hll_within_5pct, true AS p95_within_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "heavy_hitters_check" ->
      """SELECT CAST(row_number() OVER (ORDER BY c DESC, tok) AS INT) AS rank,
        |  tok, c AS exact_count,
        |  true AS cms_never_undercounts, true AS cms_within_eps
        |FROM (
        |  SELECT tok, count(*) AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok)
        |ORDER BY c DESC, tok LIMIT 10""".stripMargin,
    // Full-output oracles for the hash-family ops (r6): the operators use
    // portable hashes — md5 halves + Kirsch–Mitzenmacher lanes for MinHash
    // banding, md5-low-64 sign votes for SimHash — so DuckDB recomputes
    // signatures, candidate sets, and pair lists bit-for-bit. The LSH
    // pair list hash-matching means realized recall is a PINNED fact, not
    // a sampled contract. approx_stats stays rows-only (sketch-specific;
    // approx_stats_check pins its error envelope).
    "dedup_minhash_lsh" ->
      """WITH t AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text,' ')) AS toks FROM documents),
        |g AS (
        |  SELECT min(id) AS rep, list(id) AS members, arg_min(toks, id) AS toks
        |  FROM t GROUP BY md5(list_aggr(list_sort(toks), 'string_agg', ' '))),
        |h AS (
        |  SELECT rep, ('0x'||substr(md5(tok),1,16))::UBIGINT::HUGEINT AS h1,
        |         ('0x'||substr(md5(tok),17,16))::UBIGINT::HUGEINT AS h2
        |  FROM (SELECT rep, unnest(toks) AS tok FROM g)),
        |lanes AS (
        |  SELECT rep, i, min((h1 + i*h2) % 18446744073709551616::HUGEINT) AS lane
        |  FROM h, generate_series(0, 59) s(i) GROUP BY rep, i),
        |bands AS (
        |  SELECT rep, i // 6 AS band, string_agg(lane::VARCHAR, ',' ORDER BY i) AS bandkey
        |  FROM lanes GROUP BY rep, i // 6),
        |cands AS (
        |  SELECT DISTINCT a.rep AS id_a, b.rep AS id_b
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bandkey = b.bandkey AND a.rep < b.rep),
        |reppairs AS (
        |  SELECT id_a, id_b, round(j, 6) AS jaccard FROM (
        |    SELECT c.id_a, c.id_b,
        |      len(list_intersect(x.toks, y.toks))::DOUBLE /
        |        (len(x.toks) + len(y.toks) - len(list_intersect(x.toks, y.toks)))::DOUBLE AS j
        |    FROM cands c JOIN g x ON c.id_a = x.rep JOIN g y ON c.id_b = y.rep)
        |  WHERE j >= 0.8),
        |mem AS (SELECT rep, unnest(members) AS m FROM g),
        |inter AS (
        |  SELECT least(x.m, y.m) AS id_a, greatest(x.m, y.m) AS id_b, p.jaccard
        |  FROM reppairs p JOIN mem x ON p.id_a = x.rep JOIN mem y ON p.id_b = y.rep),
        |intra AS (
        |  SELECT a.m AS id_a, b.m AS id_b, 1.0::DOUBLE AS jaccard
        |  FROM mem a JOIN mem b ON a.rep = b.rep AND a.m < b.m)
        |SELECT * FROM (SELECT * FROM inter UNION ALL SELECT * FROM intra)
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        |bits AS (
        |  SELECT doc_id, j,
        |    CASE WHEN sum(CASE WHEN (('0x'||substr(md5(t),1,16))::UBIGINT >> j) & 1 = 1
        |      THEN 1 ELSE -1 END) > 0
        |    THEN (1::UBIGINT << j)::HUGEINT ELSE 0::HUGEINT END AS bit
        |  FROM tok, generate_series(0, 63) s(j) GROUP BY doc_id, j),
        |sh AS (SELECT doc_id, sum(bit)::UBIGINT AS sh FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        |FROM sh a JOIN sh b
        |  ON (a.sh >> 48) = (b.sh >> 48) AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "dedup_simhash_complete" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
        |bits AS (
        |  SELECT doc_id, j,
        |    CASE WHEN sum(CASE WHEN (('0x'||substr(md5(t),1,16))::UBIGINT >> j) & 1 = 1
        |      THEN 1 ELSE -1 END) > 0
        |    THEN (1::UBIGINT << j)::HUGEINT ELSE 0::HUGEINT END AS bit
        |  FROM tok, generate_series(0, 63) s(j) GROUP BY doc_id, j),
        |sh AS (SELECT doc_id, sum(bit)::UBIGINT AS sh FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin
  )
}
