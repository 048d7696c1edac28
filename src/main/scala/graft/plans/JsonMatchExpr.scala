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

/** Single-parse match + projection:
  * `json_match_project(schemaJson, inputJson, field...)` returns an
  * `array<struct<field: string, ...>>` — empty when the input does not
  * match the schema, else one struct holding the requested TOP-LEVEL
  * fields rendered as `get_json_object` renders them (unquoted scalars,
  * compact JSON for objects/arrays).
  *
  * Why an array: `filter(json_match).select(get_json_object)` parses the
  * input twice, and the obvious fusion — project a nullable struct, then
  * filter on it — re-splits into two evaluations when Catalyst pushes the
  * filter back through the project. Exploding an (empty | singleton)
  * array keeps match and extraction inside ONE evaluation per row in
  * `GenerateExec`: one Jackson parse serves both (VERDICT r5 #3,
  * `json_filter_gte` single-parse).
  */
case class JsonMatchProject(schema: Expression, input: Expression,
                            fieldExprs: Seq[Expression])
    extends Expression {

  require(fieldExprs.nonEmpty && fieldExprs.forall(e =>
    e.foldable && e.dataType == org.apache.spark.sql.types.StringType),
    "json_match_project fields must be string literals")

  @transient private lazy val fields: Array[String] =
    fieldExprs.map(_.eval(null).toString).toArray

  override def children: Seq[Expression] = schema +: input +: fieldExprs
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(fields.map(f =>
      org.apache.spark.sql.types.StructField(f, org.apache.spark.sql.types.StringType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "json_match_project"

  @transient private lazy val constSchema: Option[JsonNode] =
    if (schema.foldable) {
      Option(schema.eval(null)).flatMap { s =>
        try Some(JsonMatch.parse(s.toString))
        catch { case _: Exception => None }
      }
    } else None

  @transient private lazy val empty =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])

  /** Entry point shared by interpreted eval and generated code. */
  def doProject(schemaStr: UTF8String,
                in: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (in == null) return empty
    try {
      val node = JsonMatch.parse(in.getBytes)
      val sch = constSchema.getOrElse {
        if (schemaStr == null) return empty
        JsonMatch.parse(schemaStr.toString)
      }
      if (!JsonMatch.matches(sch, node)) empty
      else {
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          val v = node.get(fields(i))
          vals(i) =
            if (v == null || v.isNull) null
            else if (v.isTextual) UTF8String.fromString(v.textValue)
            else UTF8String.fromString(v.toString)
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals)))
      }
    } catch { case _: Exception => empty }
  }

  override def eval(input0: InternalRow): Any = {
    val in = input.eval(input0)
    val s = schema.eval(input0)
    doProject(s.asInstanceOf[UTF8String], in.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jsonMatchProject", this)
    val schemaGen = schema.genCode(ctx)
    val inGen = input.genCode(ctx)
    val resultCode =
      code"""
        ${schemaGen.code}
        ${inGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $self.doProject(
            ${schemaGen.isNull} ? null : ${schemaGen.value},
            ${inGen.isNull} ? null : ${inGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(schema = newChildren(0), input = newChildren(1),
      fieldExprs = newChildren.drop(2))
}

object JsonMatchExpr {
  /** Register `json_match` + `json_match_project` on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_match", exprs => JsonMatchExpr(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "json_match_project",
      exprs => JsonMatchProject(exprs(0), exprs(1), exprs.drop(2)), "built-in")
  }
}
