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

object HashExprs {
  private final val GoldenGamma = 0x9E3779B97F4A7C15L
  private final val SparkHashSeed = 42L

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
  }

  /** Column form; requires [[install]] on the executing session. */
  def minhashSig(tokens: Column, numHashes: Int): Column =
    call_function("graft_minhash_sig", tokens, org.apache.spark.sql.functions.lit(numHashes))

  /** Column form; requires [[install]] on the executing session. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_size", a, b)
}
