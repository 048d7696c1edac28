package graft.plans

import com.fasterxml.jackson.databind.JsonNode
import graft.functions.JsonMatch
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the JSON filter engine:
  * `json_match(schemaJson, inputJson): Boolean`.
  *
  * Compared to a Scala UDF this avoids the UDF call convention (row boxing,
  * closure serialization) and parses the schema ONCE per task when the
  * schema is a literal/constant (the overwhelmingly common shape — the
  * reference stores one filter per destination). It generates REAL codegen
  * (a static call into the evaluator, one Jackson parse per row) rather
  * than CodegenFallback, so a filter containing it stays inside
  * WholeStageCodegen — measured on sf0.1 events this single-parse
  * evaluator beats both a `get_json_object`-based lowering (2 text scans)
  * and a variant-typed lowering (4+ binary parses); see DESIGN.md.
  *
  * Two-valued semantics: null/malformed input never matches (false, not
  * null), mirroring the reference evaluator.
  */
case class JsonMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "json_match"

  // parse-once cache for a constant schema (per task deserialization)
  @transient private lazy val constSchema: Option[JsonNode] =
    if (left.foldable) {
      Option(left.eval(null)).flatMap { s =>
        try Some(JsonMatch.parse(s.toString))
        catch { case _: Exception => None }
      }
    } else None

  /** Entry point shared by interpreted eval and generated code. */
  def doMatch(schema: UTF8String, in: UTF8String): Boolean = constSchema match {
    case Some(parsed) =>
      // parse the UTF8String's bytes directly: Jackson reads UTF-8, so the
      // toString UTF-16 decode would be pure overhead on the per-row path
      try JsonMatch.matches(parsed, JsonMatch.parse(in.getBytes))
      catch { case _: Exception => false }
    case None => JsonMatch.matches(schema.toString, in.toString)
  }

  override def eval(input: InternalRow): Any = {
    val in = right.eval(input)
    if (in == null) return false
    val s = left.eval(input)
    s != null && doMatch(s.asInstanceOf[UTF8String], in.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jsonMatchExpr", this)
    val schemaGen = left.genCode(ctx)
    val inGen = right.genCode(ctx)
    val resultCode =
      code"""
        ${schemaGen.code}
        ${inGen.code}
        boolean ${ev.value} = false;
        if (!${inGen.isNull} && !${schemaGen.isNull}) {
          ${ev.value} = $self.doMatch(${schemaGen.value}, ${inGen.value});
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JsonMatchExpr {
  /** Register `json_match` as a SQL function on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_match", exprs => JsonMatchExpr(exprs(0), exprs(1)), "built-in")
}
