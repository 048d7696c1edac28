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

object VectorExprs {
  /** Register `graft_dot` on a session (idempotent). */
  def install(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Column form; requires [[install]] on the executing session. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
