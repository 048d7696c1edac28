package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native vector arithmetic for embedding columns.
  *
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` is semantically right
  * but higher-order functions evaluate their lambdas per element outside
  * whole-stage codegen — interpreted dispatch per float. This expression
  * generates a tight primitive loop instead (~10× on 64-dim embeddings),
  * with identical left-to-right double accumulation so results are
  * bit-for-bit the same as the HOF form (and the DuckDB oracle).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  require(left.dataType.isInstanceOf[ArrayType] && right.dataType.isInstanceOf[ArrayType],
    s"graft_dot expects array inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    // element accessors are PER SIDE, as in doGenCode: a mixed
    // float×double call (e.g. a float embedding against a double literal
    // plane array) must not read 8 bytes from a 4-byte-element array
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = (e: Expression, arr: String, i: String) =>
      if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(left, a, i)} * ${get(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Nearest candidate under exact integer squared L2 — the k-means‖
  * seeding's inner loop ([[graft.operators.Clustering]]).
  *
  * `vec` is a micro-quantized `array<long>`; `cands` a (foldable, small —
  * the candidate pool, never row data) `array<array<long>>`. Returns the
  * minimum Σ(x−y)² over candidates (`returnIndex = false`, LongType) or
  * the index of that minimum, ties to the LOWEST index (`returnIndex =
  * true`, IntegerType — the same tie order as a struct-min over
  * `(d, index)`).
  *
  * Semantically identical to a crossJoin against a broadcast candidates
  * frame + `min` / argmin-struct aggregate — integer sums are order-free
  * exact, so decomposition cannot change a single bit — but it runs as
  * one primitive loop per row inside whole-stage codegen: no intermediate
  * `zip_with` array per (row, candidate), no exchange for the per-id
  * re-aggregation. Plan size stays O(1) in pool size (the pool rides one
  * array literal), the property the r13 broadcast-join form bought, now
  * without the shuffle.
  */
case class NearestCandidateQ(vec: Expression, cands: Expression,
                             returnIndex: Boolean) extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cands
  override def dataType: DataType = if (returnIndex) IntegerType else LongType
  override def prettyName: String =
    if (returnIndex) "graft_nearest_ixq" else "graft_nearest_d2q"

  require(vec.dataType == ArrayType(LongType, containsNull = true) ||
    vec.dataType == ArrayType(LongType, containsNull = false),
    s"$prettyName expects array<long> vec, got ${vec.dataType}")
  require(cands.dataType.isInstanceOf[ArrayType] &&
    cands.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType],
    s"$prettyName expects array<array<long>> candidates, got ${cands.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val cs = b.asInstanceOf[ArrayData]
    val m = cs.numElements()
    var best = Long.MaxValue
    var bi = 0
    var j = 0
    while (j < m) {
      val c = cs.getArray(j)
      val n = math.min(x.numElements(), c.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - c.getLong(i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bi = j }
      j += 1
    }
    if (returnIndex) bi else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      s"""
         |int $m = $b.numElements();
         |long $best = Long.MAX_VALUE;
         |int $bi = 0;
         |for (int $j = 0; $j < $m; $j++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $b.getArray($j);
         |  int $n = java.lang.Math.min($a.numElements(), $c.numElements());
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $a.getLong($i) - $c.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if ($acc < $best) { $best = $acc; $bi = $j; }
         |}
         |${ev.value} = ${if (returnIndex) bi else best};
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, cands = r)
}

object VectorExprs {
  /** Register graft vector expressions on a session (idempotent). */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_d2q",
      exprs => NearestCandidateQ(exprs(0), exprs(1), returnIndex = false),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_ixq",
      exprs => NearestCandidateQ(exprs(0), exprs(1), returnIndex = true),
      "built-in")
  }

  /** Column form; requires [[install]] on the executing session. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Min integer d² from `vec` to the literal candidate pool. */
  def nearestDistQ(vec: Column, cands: Seq[Seq[Long]]): Column =
    call_function("graft_nearest_d2q", vec,
      org.apache.spark.sql.functions.typedlit(cands))

  /** Index of the nearest candidate (ties to the lowest index). */
  def nearestIdxQ(vec: Column, cands: Seq[Seq[Long]]): Column =
    call_function("graft_nearest_ixq", vec,
      org.apache.spark.sql.functions.typedlit(cands))
}
