package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines.
  *
  * All of these are pure `Column` compositions over `functions._` — codegen'd,
  * no UDFs, so they vectorize inside whole-stage codegen and never break
  * predicate pushdown. Designed for the 100 TB document-corpus case: every
  * op is per-row (embarrassingly parallel), no shuffle.
  */
object TextFunctions {

  /** Whitespace tokens (single-space tokenizer — the corpus normal form). */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: alpha runs count ~1 token per 4 chars
    * (ceil), digits and punctuation 1 each. A cheap, deterministic proxy for
    * tokenizer budgeting without shipping a vocab. */
  def bpeTokenEstimate(text: Column): Column = {
    val alphaRuns = regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))
    val alphaToks = aggregate(alphaRuns, lit(0L),
      (acc, run) => acc + ceil(length(run).cast("double") / 4.0).cast("long"))
    val nonAlpha = size(regexp_extract_all(text, lit("[0-9]|[^A-Za-z0-9\\s]"), lit(0)))
    alphaToks + nonAlpha.cast("long")
  }

  /** Small fixed stopword list used by quality scoring and language ID. */
  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isin(EnglishStopwords: _*)))
    hits.cast("double") / nullif(size(toks).cast("double"), lit(0.0))
  }

  /** Heuristic document quality in [0,1]: length score (saturates at 200
    * tokens) + mean-token-length score (peaks at 5 chars) + stopword signal.
    * Deterministic per-row arithmetic — identical in any engine. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / 200.0, lit(1.0))
    val avgLen = length(text).cast("double") / nullif(nTok, lit(0.0))
    val shapeScore = greatest(lit(0.0), lit(1.0) - abs(avgLen - 5.0) / 5.0)
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    round(lenScore * 0.4 + shapeScore * 0.4 + stopScore * 0.2, 6)
  }

  /** Per-language marker lexicons for n-gram/stopword language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "una", "es"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Language ID: argmax of marker-word hits, ties broken by catalog order,
    * zero hits → "und". */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    def hits(ws: Seq[String]): Column = size(filter(toks, t => t.isin(ws: _*)))
    val best = LangMarkers.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestHits), (lang, ws)) =>
        val h = hits(ws)
        (when(h > bestHits, lit(lang)).otherwise(bestLang),
          when(h > bestHits, h).otherwise(bestHits))
    }
    best._1
  }

  /** Content fingerprint: md5 over the normalization (lowercase, strip
    * non-alphanumerics, keep single spaces), first 16 hex chars. Groups
    * case/punctuation variants of the same content. */
  def fingerprint(text: Column): Column =
    substring(md5(regexp_replace(lower(text), "[^a-z0-9 ]", "")), 1, 16)

  /** Word n-gram shingles (n consecutive tokens joined by space). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** PII patterns for detection/redaction, ordered by scrub precedence
    * (email first — its placeholder removes the chars the dotted-quad and
    * phone patterns could otherwise rematch). Kept inside the common
    * regex subset (ASCII classes, `\b`, `\d`, bounded repeats — no
    * backrefs/lookaround) so Java regex (Spark) and RE2 (DuckDB et al.)
    * find identical matches. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ipv4" -> "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b",
    "phone" -> "\\b\\d{3}-\\d{3}-\\d{4}\\b",
    "card" -> "\\b\\d{4} \\d{4} \\d{4} \\d{4}\\b")

  /** Count of matches of one PII class. Per-row, codegen'd, no shuffle. */
  def piiCount(text: Column, kind: String): Column = {
    val pat = PiiPatterns.toMap.apply(kind)
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  /** Redact all PII classes to `<KIND>` placeholders, in catalog order.
    * The standard pre-training scrub pass: deterministic, leftmost-first
    * per class, class order fixed so engines agree on overlapping hits. */
  def piiScrub(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (kind, pat)) =>
      regexp_replace(acc, pat, s"<${kind.toUpperCase}>")
    }
}
