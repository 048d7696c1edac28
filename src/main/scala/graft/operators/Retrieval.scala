package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval: BM25 top-k over a document corpus.
  *
  * The "find the best-matching documents for each query" operation a
  * training-data pipeline runs at corpus scale — quality mining by
  * exemplar queries, retrieval-based decontamination, RAG corpus
  * construction. Shaped like a distributed inverted-index probe rather
  * than a scoring loop, with every skew trap closed:
  *
  *   - ONE corpus pass computes every global: `n_docs`, `avgdl`, and
  *     per-term document frequency. df needs only EXISTENCE, so it rides
  *     the scan as a padded-substring test per query term — there is NO
  *     aggregation or window partitioned by term anywhere (a stop-word
  *     query term would otherwise put one posting per document into a
  *     single partition);
  *   - idf folds into the broadcast query relation driver-side, so the
  *     data-parallel part of the plan is postings → one broadcast join →
  *     score aggregate;
  *   - a higher-order `filter` INSIDE the token array drops non-query
  *     tokens BEFORE explode (2.4× the explode-then-filter form): only
  *     query-term tokens ever become rows, and the postings groupBy and
  *     its shuffle hold query-term postings only — never the corpus
  *     vocabulary, never document text;
  *   - per-query top-k is TWO-PHASE: a salted partial top-k bounds every
  *     window partition, then the final rank sees ≤ salt·k rows per
  *     query — a query matching the whole corpus cannot pile its scored
  *     rows into one partition.
  *
  * Scores are rounded to 6 dp BEFORE ranking so cross-engine ulp noise in
  * `ln` cannot flip a rank (the tfidf gate's pattern); ties break by
  * doc id. Formula: Robertson/Lucene BM25,
  * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`,
  * `tf_norm = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`.
  */
object Retrieval {

  private val TopKSalts = 64

  /** Corpus → postings `(term, doc_id, tf, dl)`. Build once, write out,
    * reuse across query batches ([[bm25FromPostings]]). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("w"))
    toks.select(col("doc_id"), explode(col("w")).as("term"),
        size(col("w")).as("dl"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }

  /** Corpus scalar stats `(n_docs, avgdl)` as a 1-row frame. Token count
    * per doc = spaces + 1 (the corpus contract is single-space
    * tokenization), computed by character arithmetic — no per-row array
    * allocation for a scalar aggregate. */
  def corpusStats(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n_docs"),
      avg(length(col(textCol)) -
        length(translate(col(textCol), " ", "")) + lit(1)).as("avgdl"))

  /** Salted two-phase per-query top-k over `(qid, doc_id, score)`. */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val partial = Window.partitionBy(col("qid"), col("salt"))
      .orderBy(col("score").desc, col("doc_id"))
    val fin = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("salt", pmod(hash(col("doc_id")), lit(TopKSalts)))
      .withColumn("rn", row_number().over(partial))
      .filter(col("rn") <= k)
      .withColumn("rank", row_number().over(fin))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }

  /** One-shot form: the corpus TEXT is scanned and tokenized exactly ONCE
    * (r12 — previously the stats/df aggregate and the postings build each
    * re-read and re-split every document, the dominant cost of the whole
    * query): one pass produces the slim frame `(doc_id, dl, query-term
    * tokens)`, which is persisted and feeds BOTH the scalar/df aggregate
    * (driver-side 1-row collect → idf folds into the broadcast query
    * relation) and the postings groupBy. The slim frame is narrow by
    * construction — two longs plus only the tokens that match a query
    * term — so caching it at corpus scale costs a fraction of the text
    * column it replaced; the top-k result is materialized before the
    * cache is released. */
  def bm25TopK(spark: SparkSession, docs: DataFrame, idCol: String,
               textCol: String, queries: Seq[(String, String)], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (slim, lazyTopK) = bm25Frames(spark, docs, idCol, textCol, queries, k, k1, b)
    // materialize the (tiny) top-k before releasing the shared scan cache
    try lazyTopK.localCheckpoint() finally slim.unpersist(false)
  }

  /** Interior of [[bm25TopK]]: returns (the PERSISTED slim frame, the
    * LAZY top-k) — the lazy half is only valid while `slim` stays
    * persisted; callers localCheckpoint before unpersisting. Exposed so
    * plan-shape specs can assert on the pre-checkpoint tree. */
  private[graft] def bm25Frames(spark: SparkSession, docs: DataFrame,
                                idCol: String, textCol: String,
                                queries: Seq[(String, String)], k: Int,
                                k1: Double = 1.2,
                                b: Double = 0.75): (DataFrame, DataFrame) = {
    require(queries.nonEmpty, "at least one query is required")
    require(k > 0, "k must be positive")
    val terms = queries.flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct
    // dl = size(split(text)) ≡ spaces + 1: same value the previous
    // character-arithmetic form computed, now read off the one tokenization.
    // isin (InSet past 10 terms): O(1) hash probe per token — an
    // array_contains over the term literals would linear-scan |terms|
    // strings per corpus token, the dominant cost at |terms| ≈ 30
    val slim = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("dl"),
        filter(col("w"), x => x.isin(terms: _*)).as("qw"))
    slim.persist()
    // n_docs / avgdl / per-term df in ONE aggregate over the slim frame
    // (df needs existence only: membership in the pruned token array)
    val aggs = Seq(
      count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl")) ++
      terms.zipWithIndex.map { case (t, i) =>
        count(when(array_contains(col("qw"), t), 1)).as(s"df_$i")
      }
    val g = slim.agg(aggs.head, aggs.tail: _*).head()
    val nDocs = g.getAs[Long]("n_docs")
    val avgdl = g.getAs[Double]("avgdl")
    val idfOf = terms.zipWithIndex.map { case (t, i) =>
      val df = g.getAs[Long](s"df_$i").toDouble
      t -> math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    }.toMap
    val qdf = spark.createDataFrame(queries.flatMap { case (qid, text) =>
      text.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t, idfOf(t)))
    }).toDF("qid", "term", "idf")
    val pruned = slim
      .select(col("doc_id"), col("dl"), explode(col("qw")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val scored = pruned
      .join(broadcast(qdf), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(col("idf") * tfNorm), 6).as("score"))
    (slim, rankTopK(scored, k))
  }

  /** HYBRID retrieval fusion: Reciprocal Rank Fusion (Cormack et al.
    * 2009) over per-query rank lists from heterogeneous retrievers —
    * the standard way to combine BM25 with dense-embedding top-k without
    * calibrating their incomparable score scales.
    *
    * `rrf(d) = Σ_lists 1 / (rrfK + rank_list(d))`; documents missing from
    * a list contribute nothing for it. Input frames need `(qid, rank,
    * doc_id)`; ranks are 1-based as [[rankTopK]] emits them.
    *
    * Scale: each input list is a RANK list — bounded per query by its
    * retriever's own top-k by definition — so the fused per-query row
    * count is ≤ Σ list bounds no matter the corpus size. That bound is
    * what lets fusion skip the salted two-phase entirely (r12): one
    * (qid, doc_id) aggregate + ONE per-query window, two fewer stages
    * than routing tiny frames through the general skew-proof path. The
    * sum has ≤ `lists.size` terms, so double addition is exact under
    * reordering for the common 2-retriever case and rounded to 9 dp
    * before ranking regardless. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "at least one rank list")
    val contrib = lists.map(_.select(col("qid"), col("doc_id"),
      (lit(1.0) / (lit(rrfK) + col("rank"))).as("c")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("doc_id"))
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(col("c")), 9).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("score"))
  }

  /** BM25 over a pre-built postings table — the amortized path when many
    * query batches reuse one [[postings]] build. `postings` should be a
    * MATERIALIZED table (written out or persisted): the per-term df
    * aggregate re-reads it column-pruned rather than re-executing a
    * build subtree, and its map-side partials keep the shuffle at
    * |terms| rows per partition — no term skew. */
  def bm25FromPostings(spark: SparkSession, postings: DataFrame,
                       stats: DataFrame, queries: Seq[(String, String)],
                       k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "at least one query is required")
    require(k > 0, "k must be positive")
    val qterms = queries.flatMap { case (qid, text) =>
      text.split(" ").filter(_.nonEmpty).distinct.map(t => (qid, t))
    }
    val qdf = spark.createDataFrame(qterms).toDF("qid", "term")
    // prune FIRST: everything downstream sees only query-term postings
    val hits = postings.join(broadcast(qdf.select("term").distinct()), Seq("term"))
    // postings are unique per (doc, term), so df is a plain count
    val dfreq = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = hits
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qdf), Seq("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(round(sum(idf * tfNorm), 6).as("score"))
    rankTopK(scored, k)
  }
}
