package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

object TextExprs {

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
  def install(spark: SparkSession): Unit =
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

  /** Column form; requires [[install]] on the executing session. */
  def spanScrub(text: Column, gps: Column, n: Int): Column =
    call_function("graft_span_scrub", text, gps,
      org.apache.spark.sql.functions.lit(n))
}
