package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native span scrub: `graft_span_scrub(text, gps): struct<text_clean,
  * n_words, n_removed>` — rewrite a document with every word position
  * covered by a duplicated n-gram starting at one of the (sorted) `gps`
  * positions removed.
  *
  * Why an expression and not higher-order functions: the HOF form
  * (interval-merge `aggregate` + indexed `filter` + `exists`) evaluates
  * its lambdas interpreted PER ELEMENT and copies the accumulator array
  * per fold step — measured 2.3× SLOWER than even the exploded
  * anti-join form on the sf0.1 gate. This expression does one O(words +
  * positions) two-pointer pass per row inside whole-stage codegen (a
  * static call, like [[graft.plans.MinHashSig]]), with zero per-element
  * dispatch.
  */
case class SpanScrub(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  require(n > 0, "gram length must be positive")
  require(left.dataType == StringType, s"text must be string, got ${left.dataType}")
  require(right.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }, s"gps must be array<int>, got ${right.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_removed", IntegerType, nullable = false)))
  override def prettyName: String = "graft_span_scrub"

  override def nullSafeEval(t: Any, g: Any): Any =
    TextExprs.spanScrub(t.asInstanceOf[UTF8String], g.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, g) =>
      s"${ev.value} = graft.plans.TextExprs.spanScrub($t, $g, $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native word n-gram hash array: `graft_gram_hashes(text, n): array<long>`
  * — element i is `xxhash64` (Spark seed 42) of the i-th word n-gram of
  * `text`, bit-identical to
  * `transform(shingles(text, n), g => xxhash64(g))`.
  *
  * Why: the declarative shingle pipeline materializes one n-word STRING
  * per word position (≈n× the corpus text volume in allocations) through
  * higher-order-function lambdas that evaluate per element outside
  * whole-stage codegen, only for the census to immediately hash each
  * string. Because [[graft.functions.TextFunctions.tokens]] splits on a
  * single space and shingles re-join with a single space, every gram IS a
  * byte range of the original text — so this expression hashes the ranges
  * in place: one O(bytes) boundary scan plus one buffer-hash per window,
  * zero string allocation. This is the form the 100 TB span census runs
  * on ([[graft.operators.Dedup.ngramSpanStats]] `hashGrams`).
  */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "gram length must be positive")
  require(child.dataType == StringType,
    s"text must be string, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(t: Any): Any =
    TextExprs.gramHashes(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.TextExprs.gramHashes($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused per-document token statistics:
  * `graft_token_stats(text): struct<n_tokens int, bpe_estimate bigint,
  * fp string>` — semantically identical to the three-expression form
  *
  *   - `size(split(text, " "))`
  *   - alpha-run ⌈len/4⌉ sum + count of `[0-9]|[^A-Za-z0-9\s]` matches
  *   - `substring(md5(regexp_replace(lower(text), "[^a-z0-9 ]", "")), 1, 16)`
  *
  * but in two passes with zero regex machinery: the three declarative
  * pipelines each re-scan the text (two of them through
  * `regexp_extract_all`, which materializes every match as a string and
  * runs its fold lambda interpreted per element). Fusing them is the
  * [[SpanScrub]]/[[GramHashes]] pattern: classify UTF-8 code points in
  * place for the token/BPE counts, byte-filter the lowercased text
  * straight into the MD5 digest. */
case class TokenStats(child: Expression) extends UnaryExpression {

  require(child.dataType == StringType,
    s"text must be string, got ${child.dataType}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("bpe_estimate", LongType, nullable = false),
    StructField("fp", StringType, nullable = false)))
  override def prettyName: String = "graft_token_stats"

  override def nullSafeEval(t: Any): Any =
    TextExprs.tokenStats(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.plans.TextExprs.tokenStats($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexDigits = "0123456789abcdef".toCharArray

  /** See [[TokenStats]] for the contract this must match bit-for-bit. */
  def tokenStats(text: UTF8String): GenericInternalRow = {
    val len = text.numBytes
    // pass 1: token count + BPE estimate, classifying code points in
    // place. Continuation bytes (0b10xxxxxx) are skipped so multi-byte
    // chars count once, matching what java.util.regex matches per
    // character class hit; any non-ASCII code point falls into
    // [^A-Za-z0-9\s] exactly as in the regex form (Java's \s is the six
    // ASCII whitespace chars only).
    var spaces = 0
    var bpe = 0L
    var alphaRun = 0
    var i = 0
    while (i < len) {
      val b = text.getByte(i)
      val ub = b & 0xFF
      if ((ub & 0xC0) != 0x80) { // a code point starts here
        val isAlpha = (ub >= 'A' && ub <= 'Z') || (ub >= 'a' && ub <= 'z')
        if (isAlpha) alphaRun += 1
        else {
          if (alphaRun > 0) { bpe += (alphaRun + 3) / 4; alphaRun = 0 }
          if (ub == 0x20) spaces += 1
          else if (ub == '\t' || ub == '\n' || ub == 0x0B || ub == '\f' || ub == '\r') ()
          else bpe += 1 // digits and all other non-ws code points: 1 each
        }
      }
      i += 1
    }
    if (alphaRun > 0) bpe += (alphaRun + 3) / 4
    // pass 2: fingerprint — lowercase (same collation-default path as the
    // `lower()` expression), keep only [a-z0-9 ] bytes (UTF-8 multi-byte
    // chars never produce bytes < 0x80, so the byte filter IS the char
    // filter), MD5, first 16 hex chars.
    val lower = text.toLowerCase
    val llen = lower.numBytes
    val kept = new Array[Byte](llen)
    var k = 0
    i = 0
    while (i < llen) {
      val b = lower.getByte(i)
      val ub = b & 0xFF
      if (ub == 0x20 || (ub >= '0' && ub <= '9') || (ub >= 'a' && ub <= 'z')) {
        kept(k) = b; k += 1
      }
      i += 1
    }
    val md = md5Local.get()
    md.reset()
    md.update(kept, 0, k)
    val digest = md.digest()
    val hex = new Array[Char](16) // first 8 bytes render the 16 hex chars
    var d = 0
    while (d < 8) {
      hex(2 * d) = hexDigits((digest(d) >> 4) & 0xF)
      hex(2 * d + 1) = hexDigits(digest(d) & 0xF)
      d += 1
    }
    new GenericInternalRow(Array[Any](
      spaces + 1, bpe, UTF8String.fromString(new String(hex))))
  }

  /** Hash every word n-gram of `text` as the byte range it occupies.
    * Word boundaries are single 0x20 bytes (UTF-8 guarantees a space byte
    * never occurs inside a multibyte character), matching
    * `split(text, " ")` with trailing empties kept; texts with fewer than
    * n words produce one gram covering the whole text, matching the
    * shingle fallback `array(concat_ws(" ", toks))`. */
  def gramHashes(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var spaces = 0
    var i = 0
    while (i < len) { if (text.getByte(i) == 0x20) spaces += 1; i += 1 }
    val words = spaces + 1
    if (words < n)
      return new GenericArrayData(
        Array(XXH64.hashUnsafeBytes(base, off, len, 42L)))
    val starts = new Array[Int](words)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < len) {
      if (text.getByte(i) == 0x20) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    val m = words - n + 1
    val out = new Array[Long](m)
    var g = 0
    while (g < m) {
      val s = starts(g)
      val e = if (g + n - 1 == words - 1) len else starts(g + n) - 1
      out(g) = XXH64.hashUnsafeBytes(base, off + s, e - s, 42L)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** One pass over the words with a pointer into the SORTED duplicated
    * gram starts: a word at index i is covered iff some start p ≤ i has
    * p + n > i; tracking the max covered end while advancing makes the
    * whole scrub O(words + starts) regardless of overlap structure.
    * Word splitting matches Spark's `split(text, " ")` (trailing empties
    * kept), so `n_words` agrees with `size(split(...))`. */
  def spanScrub(text: UTF8String, gps: ArrayData, n: Int): GenericInternalRow = {
    val words = text.toString.split(" ", -1)
    val k = gps.numElements()
    if (k == 0)
      return new GenericInternalRow(Array[Any](text, words.length, 0))
    var gi = 0
    var coveredEnd = -1
    var keptCount = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < words.length) {
      while (gi < k && gps.getInt(gi) <= i) {
        val e = gps.getInt(gi) + n - 1
        if (e > coveredEnd) coveredEnd = e
        gi += 1
      }
      if (i > coveredEnd) {
        if (keptCount > 0) sb.append(' ')
        sb.append(words(i))
        keptCount += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), words.length, words.length - keptCount))
  }

  /** Register graft text expressions on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_span_scrub",
      exprs => {
        val n = exprs(2) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_span_scrub n must be an int literal, got $other")
        }
        SpanScrub(exprs(0), exprs(1), n)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_gram_hashes",
      exprs => {
        val n = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_gram_hashes n must be an int literal, got $other")
        }
        GramHashes(exprs(0), n)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_stats",
      exprs => TokenStats(exprs(0)),
      "built-in")
  }

  /** Column form; requires [[install]] on the executing session. */
  def spanScrub(text: Column, gps: Column, n: Int): Column =
    call_function("graft_span_scrub", text, gps,
      org.apache.spark.sql.functions.lit(n))

  /** Column form; requires [[install]] on the executing session. */
  def gramHashes(text: Column, n: Int): Column =
    call_function("graft_gram_hashes", text,
      org.apache.spark.sql.functions.lit(n))

  /** Column form; requires [[install]] on the executing session. */
  def tokenStats(text: Column): Column =
    call_function("graft_token_stats", text)
}
