package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native MinHash signature: `graft_minhash_sig(tokens, k): array<long>`.
  *
  * Semantically identical to the declarative form
  * `array((0 until k).map(i => array_min(transform(transform(toks, xxhash64),
  * h => xxhash64(h ^ seed_i)))))` — same XXH64 (seed 42) base hash per
  * token, same golden-ratio seed remix per hash function, bit-identical
  * output (nulls included) — but computed in ONE tight primitive loop per
  * row instead of k separate higher-order-function traversals, each of
  * which evaluates its lambda per element outside whole-stage codegen.
  * At the gate's k=120 that is the difference between 120 interpreted
  * array walks per document and a single fused loop (measured ~4× on the
  * sf0.1 LSH headline query).
  *
  * Null parity with the declarative form: a null/empty token array
  * produces null signature slots (the outer array itself is never null);
  * a null ELEMENT participates with base hash = the xxhash64 seed, because
  * Spark's hash functions are null-tolerant, not null-propagating.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")
  require(child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }, s"graft_minhash_sig expects array<string>, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  override def eval(input: InternalRow): Any =
    HashExprs.minhashCompute(child.eval(input).asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.plans.HashExprs.minhashCompute(
            ${c.isNull} ? null : ${c.value}, $numHashes);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native intersection size over two SORTED string arrays:
  * `graft_sorted_intersect_size(a, b): int`.
  *
  * Exact-Jaccard verification intersects two ~10³-element token arrays
  * for every surviving candidate pair (millions of pairs). Spark's
  * `array_intersect` builds a per-row hash set — one allocation-heavy
  * O(n) pass per PAIR. When both arrays are sorted (a per-REP
  * `array_sort`, paid once before the pair join, not per pair), the
  * intersection size is a zero-allocation two-pointer merge. Inputs must
  * be sorted ascending and duplicate-free (graft token sets are distinct
  * by construction); result equals `size(array_intersect(a, b))` exactly.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(Seq(left, right).forall(_.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }), s"graft_sorted_intersect_size expects array<string> inputs, " +
    s"got ${left.dataType} / ${right.dataType}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any =
    HashExprs.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HashExprs.sortedIntersectCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Portable MinHash LSH band keys:
  * `graft_minhash_bands(tokens, k, bands): array<string>` — element b is
  * the comma-joined unsigned-decimal lane minima of band b, where lane
  * i ∈ [0,k) is the UNSIGNED min over tokens of
  * `h1(t) + i·h2(t) (mod 2⁶⁴)` and (h1, h2) are the big-endian first and
  * second 8 bytes of `md5(token)` (Kirsch–Mitzenmacher double hashing,
  * "Less Hashing, Same Performance", ESA 2006).
  *
  * Two reasons this is the banding form:
  *   - portable: every piece (md5, hex slices, mod-2⁶⁴ arithmetic,
  *     unsigned min, decimal rendering) is exactly reproducible in
  *     standard SQL, so the DuckDB gate replicates the CANDIDATE SET
  *     bit-for-bit and the full LSH pair output hash-matches — recall
  *     becomes a pinned fact instead of a sampled contract;
  *   - cheap: one md5 per token then k multiply-adds beats k xxhash64
  *     remixes per token; the md5 cost amortizes over all k lanes.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {

  require(numHashes > 0 && bands > 0 && numHashes % bands == 0,
    "bands must divide numHashes")
  require(child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }, s"graft_minhash_bands expects array<string>, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_bands"

  override def eval(input: InternalRow): Any =
    HashExprs.minhashBands(
      child.eval(input).asInstanceOf[ArrayData], numHashes, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.plans.HashExprs.minhashBands(
            ${c.isNull} ? null : ${c.value}, $numHashes, $bands);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Portable SimHash fingerprint: `graft_simhash(tokens): long` — bit j is
  * set iff the sum over ALL token occurrences of ±1 (sign of bit j of the
  * token hash) is strictly positive, with token hash = big-endian first
  * 8 bytes of `md5(token)` (Charikar 2002 sign-vote construction).
  *
  * md5 rather than xxhash64 for the same portability reason as
  * [[MinHashBands]] (the DuckDB gate recomputes fingerprints and pair
  * lists exactly), and native rather than the HOF fold both for speed
  * (the declarative form ran a 64-wide interpreted zip_with per token)
  * and because the vote loop is branch-free here. */
case class SimHash(child: Expression) extends UnaryExpression {

  require(child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }, s"graft_simhash expects array<string>, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_simhash"

  override def eval(input: InternalRow): Any =
    HashExprs.simhashCompute(child.eval(input).asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        long ${ev.value} = graft.plans.HashExprs.simhashCompute(
          ${c.isNull} ? null : ${c.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExprs {
  private final val GoldenGamma = 0x9E3779B97F4A7C15L
  private final val SparkHashSeed = 42L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** (h1, h2) = big-endian first/second 8 bytes of md5(token) — the
    * layout `('0x' || substr(md5(t), 1, 16))::UBIGINT` parses in SQL. */
  private def md5Halves(t: org.apache.spark.unsafe.types.UTF8String): (Long, Long) = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(t.getBytes)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 8) { h1 = (h1 << 8) | (d(i) & 0xFFL); i += 1 }
    while (i < 16) { h2 = (h2 << 8) | (d(i) & 0xFFL); i += 1 }
    (h1, h2)
  }

  /** Shared by interpreted eval and generated code (static forwarder).
    * Null tokens (absent from graft token arrays) are skipped; an
    * empty/null array yields zero bands (the row never joins). */
  def minhashBands(tokens: ArrayData, k: Int, bands: Int): ArrayData = {
    if (tokens == null || tokens.numElements() == 0)
      return new GenericArrayData(Array.empty[Any])
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, -1L) // unsigned max
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val (h1, h2) = md5Halves(tokens.getUTF8String(j))
        var lane = h1
        var i = 0
        while (i < k) {
          if (java.lang.Long.compareUnsigned(lane, sig(i)) < 0) sig(i) = lane
          lane += h2 // wraps mod 2^64, matching the SQL HUGEINT % form
          i += 1
        }
      }
      j += 1
    }
    val r = k / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(r * 21)
      var i = b * r
      while (i < (b + 1) * r) {
        if (i > b * r) sb.append(',')
        sb.append(java.lang.Long.toUnsignedString(sig(i)))
        i += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Shared by interpreted eval and generated code (static forwarder). */
  def simhashCompute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    if (tokens != null) {
      val n = tokens.numElements()
      var j = 0
      while (j < n) {
        if (!tokens.isNullAt(j)) {
          val (h1, _) = md5Halves(tokens.getUTF8String(j))
          var b = 0
          while (b < 64) {
            // branch-free ±1: bit set → +1, clear → -1
            votes(b) += (((h1 >>> b) & 1L).toInt << 1) - 1
            b += 1
          }
        }
        j += 1
      }
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sh |= 1L << b
      b += 1
    }
    sh
  }

  /** Two-pointer merge count over sorted duplicate-free string arrays.
    * Null elements (none in graft token sets) sort wherever the producing
    * sort put them and simply never match. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  /** Shared by interpreted eval and generated code (static forwarder). */
  def minhashCompute(tokens: ArrayData, k: Int): ArrayData = {
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var seen = false
    if (tokens != null) {
      val n = tokens.numElements()
      var j = 0
      while (j < n) {
        // Spark's xxhash64 is null-tolerant: a null input leaves the hash
        // at the seed (42), it does NOT produce a null — mirror that.
        val h =
          if (tokens.isNullAt(j)) SparkHashSeed
          else XXH64.hashUTF8String(tokens.getUTF8String(j), SparkHashSeed)
        seen = true
        var i = 0
        while (i < k) {
          val v = XXH64.hashLong(h ^ (i * GoldenGamma), SparkHashSeed)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
        j += 1
      }
    }
    if (seen) new GenericArrayData(sig)
    else new GenericArrayData(Array.fill[Any](k)(null))
  }

  /** Register graft hash expressions on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      exprs => {
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_sig numHashes must be an int literal, got $other")
        }
        MinHashSig(exprs(0), k)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_size",
      exprs => SortedIntersectCount(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_bands",
      exprs => {
        val args = exprs.drop(1).map {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash_bands k/bands must be int literals, got $other")
        }
        MinHashBands(exprs(0), args(0), args(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHash(exprs(0)),
      "built-in")
    // Spark's own bloom-probe expression (the one its runtime bloom-filter
    // join injects) — present in catalyst but not exposed through the
    // public registry, so surface it under the graft prefix. The filter
    // side must be a foldable binary (we pass a Literal of the serialized
    // sketch); the value side a LongType hash.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)),
      "built-in")
  }

  /** Column form; requires [[install]] on the executing session. */
  def minhashSig(tokens: Column, numHashes: Int): Column =
    call_function("graft_minhash_sig", tokens, org.apache.spark.sql.functions.lit(numHashes))

  /** Column form; requires [[install]] on the executing session. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_size", a, b)

  /** Column form; requires [[install]] on the executing session. */
  def minhashBandKeys(tokens: Column, numHashes: Int, bands: Int): Column =
    call_function("graft_minhash_bands", tokens,
      org.apache.spark.sql.functions.lit(numHashes),
      org.apache.spark.sql.functions.lit(bands))

  /** Column form; requires [[install]] on the executing session. */
  def simhash(tokens: Column): Column =
    call_function("graft_simhash", tokens)

  /** Column form of Spark's native bloom probe; `bf` must be a foldable
    * binary column (serialized `org.apache.spark.util.sketch.BloomFilter`
    * built over LONG values), `value` a LongType hash. Requires
    * [[install]] on the executing session. */
  def mightContain(bf: Column, value: Column): Column =
    call_function("graft_might_contain", bf, value)
}
