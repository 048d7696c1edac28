package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subword-vocabulary induction over the corpus — the training-data-side
  * prerequisite to tokenization (byte-pair encoding, Sennrich et al. 2016,
  * arXiv:1508.07909; the greedy merge loop every GPT/Llama tokenizer
  * family descends from).
  *
  * Scale shape: segmentation state lives IN the data (an `array<string>`
  * of symbols per word), so a merge application is a pure `transform`
  * pass — no shuffle, no driver round-trip of the corpus. The ONLY thing
  * that shuffles per round is the (pair_a, pair_b, count) aggregate:
  * bytes ∝ distinct pairs (vocabulary-sized), never ∝ corpus. The driver
  * sees one top-1 row per round. Vocab induction classically runs on a
  * corpus SAMPLE (pair statistics converge long before the full pass pays
  * off); `sampleFraction` taps the deterministic id-hash sample for that.
  */
object Vocab {

  /** One round's merge candidates on the initial character segmentation:
    * adjacent character-pair frequencies across all words, top `topK` by
    * (count desc, pair asc) — the deterministic greedy order. */
  def pairCounts(docs: DataFrame, textCol: String = "text",
                 topK: Int = 50): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, char_length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)

  /** Left-to-right greedy application of one merge (a, b) → a+b to a
    * symbol array — the fold never re-merges the symbol it just created
    * (BPE's standard scan semantics: "aaa" + (a,a) → ["aa","a"]). */
  private[operators] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
          element_at(acc, lit(-1)) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Greedy BPE training: `merges` rounds of count-adjacent-pairs →
    * pick-most-frequent (count desc, then (a, b) asc — fully
    * deterministic) → apply. Returns the ordered merge table, the
    * artifact a tokenizer consumes.
    *
    * Each round's plan is re-anchored with `localCheckpoint` so the
    * transform chain stays constant-depth (the connectedComponents
    * pattern) — without it round r carries r nested `aggregate` lambdas
    * through analysis and codegen.
    */
  /** ENCODE — apply a trained merge table to the corpus: per word, start
    * from characters and repeatedly merge the lowest-RANK adjacent pair
    * present (one left-to-right scan per selection) until none remains.
    * This per-word rank loop is provably identical to replaying the whole
    * merge table in training order (a merge never creates a pair of lower
    * rank than anything already processed — ranks are assigned in
    * creation order), which the spec pins empirically.
    *
    * Why a UDF and not a Column fold: replaying k merges as k nested
    * `aggregate` lambdas builds an O(k)-deep expression tree — fine for
    * the spec's 8 merges, catastrophic for a real 32k-merge vocabulary
    * (Columns are trees; see the MetricsBench floor-div cautionary note).
    * The rank loop is a tight per-row string loop with a per-executor
    * immutable rank map riding the closure — embarrassingly parallel,
    * ZERO shuffle, and the one projection it de-fuses from codegen is
    * inherently loop-heavy anyway.
    */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text"): DataFrame = {
    val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    val enc = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else text.split(" ").filter(_.nonEmpty).flatMap { w =>
        val syms = scala.collection.mutable.ArrayBuffer.empty[String]
        w.foreach(c => syms += c.toString)
        var done = syms.length < 2
        while (!done) {
          var best = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < best) best = r
            i += 1
          }
          if (best == Int.MaxValue) done = true
          else {
            val (a, b) = merges(best)
            val merged = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { s =>
              if (merged.nonEmpty && merged.last == a && s == b)
                merged(merged.length - 1) = a + b
              else merged += s
            }
            syms.clear(); syms ++= merged
            done = syms.length < 2
          }
        }
        syms
      }
    }
    docs.withColumn("tokens", enc(col(textCol)))
      .withColumn("n_tokens", size(col("tokens")))
  }

  def bpeTrain(docs: DataFrame, merges: Int = 10, textCol: String = "text",
               sampleFraction: Double = 1.0): Seq[(String, String)] = {
    val base = (if (sampleFraction < 1.0)
        docs.filter(pmod(xxhash64(col(textCol)), lit(10000)) <
          lit((sampleFraction * 10000).toLong))
      else docs)
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .select(expr(
        "transform(sequence(1, char_length(w)), i -> substring(w, i, 1))")
        .as("syms"))
    var seg = base.localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < merges && !exhausted) {
      // (size >= 2: Spark's sequence(1, 0) DESCENDS instead of being
      // empty, so 1-symbol words must not reach the pair transform)
      val top = seg.filter(size(col("syms")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        out += ((a, b))
        val next = seg.select(applyMerge(col("syms"), a, b).as("syms"))
          .localCheckpoint()
        seg.unpersist()
        seg = next
        round += 1
      }
    }
    seg.unpersist()
    out.toSeq
  }
}
