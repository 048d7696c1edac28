package graft.plans

import com.fasterxml.jackson.databind.JsonNode
import graft.functions.JsonMatch
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the JSON filter engine:
  * `json_match(schemaJson, inputJson): Boolean`.
  *
  * Compared to a Scala UDF this avoids the UDF call convention (row boxing,
  * closure serialization), parses the schema ONCE per task when the schema
  * is a literal/constant (the overwhelmingly common shape — the reference
  * stores one filter per destination), and is visible to the optimizer —
  * [[LowerJsonMatch]] rewrites compilable schemas into plain predicates that
  * reach the parquet scan. Falls back to interpreted eval for codegen
  * (CodegenFallback): the lowered form IS the codegen'd fast path; this node
  * only survives for schemas that genuinely need the recursive evaluator.
  *
  * Two-valued semantics: null/malformed input never matches (false, not
  * null), mirroring the reference evaluator.
  */
case class JsonMatchExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

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

  override def eval(input: InternalRow): Any = {
    val in = right.eval(input)
    if (in == null) return false
    constSchema match {
      case Some(schema) =>
        try JsonMatch.matches(schema, JsonMatch.parse(in.toString))
        catch { case _: Exception => false }
      case None =>
        val s = left.eval(input)
        s != null && JsonMatch.matches(s.toString, in.toString)
    }
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
