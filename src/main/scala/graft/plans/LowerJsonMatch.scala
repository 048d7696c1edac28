package graft.plans

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.JsonNodeType
import graft.functions.JsonMatch
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DoubleType, StringType}
import scala.jdk.CollectionConverters._

/** Optimizer rule: lower `json_match(<literal schema>, col)` into native
  * `get_json_object` + comparison predicates when the schema is simple
  * (nested structural objects with literal / single-comparison leaves).
  *
  * Why it matters at scale: the lowered predicate is whole-stage-codegen'd
  * and its conjuncts participate in ordinary filter pushdown — Catalyst can
  * reorder them, fold constants, and prune columns, none of which is
  * possible through an opaque black-box expression. Schemas using
  * `$or/$not/$in/$exist/array literals` keep the exact recursive evaluator
  * ([[JsonMatchExpr]]).
  */
object LowerJsonMatch extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case jm @ JsonMatchExpr(Literal(s, StringType), input) if s != null =>
        compileExpr(s.toString, input).getOrElse(jm)
    }

  /** Expression-level twin of [[JsonMatch.compile]]. */
  def compileExpr(schemaJson: String, jsonCol: Expression): Option[Expression] = {
    def extract(path: String): Expression =
      GetJsonObject(jsonCol, Literal.create(path, StringType))
    def walk(schema: JsonNode, path: String): Option[Expression] = {
      // "$lit" = implicit literal equality (any-element on array input);
      // explicit $eq is whole-array deep equality (see JsonMatch.compile)
      if (!schema.isObject) return leaf(schema, path, "$lit")
      val entries = schema.properties.asScala.toSeq
      val parts = entries.map { e =>
        val k = e.getKey
        if (k.startsWith("$")) leaf(e.getValue, path, k)
        else walk(e.getValue, s"$path.${e.getKey}")
      }
      if (parts.exists(_.isEmpty)) None else Some(parts.flatten.reduce(And))
    }
    // TRY-mode cast: a non-numeric string yields NULL (collapsed to false by
    // the surrounding Coalesce), never an ANSI runtime error — the evaluator
    // treats cross-type comparisons as non-matches, so must the fast path
    def num(e: Expression): Expression = Cast(e, DoubleType, None, EvalMode.TRY)
    def leaf(lit0: JsonNode, path: String, op: String): Option[Expression] = {
      val ex = extract(path)
      // equality leaves get the reference's any-element semantics when the
      // input value is a JSON array (twin of JsonMatch.compile.eqOrContains)
      def eqOrContains(scalarEq: Expression, elemType: org.apache.spark.sql.types.DataType,
                       elemLit: Expression): Expression =
        If(StartsWith(ex, Literal("[")),
          ArrayContains(
            JsonToStructs(org.apache.spark.sql.types.ArrayType(elemType),
              Map.empty[String, String], ex), elemLit),
          scalarEq)
      (op, lit0.getNodeType) match {
        case ("$lit", JsonNodeType.NUMBER) =>
          Some(eqOrContains(EqualTo(num(ex), Literal(lit0.doubleValue)),
            DoubleType, Literal(lit0.doubleValue)))
        case ("$lit", JsonNodeType.STRING) =>
          Some(eqOrContains(EqualTo(ex, Literal(lit0.asText)),
            StringType, Literal(lit0.asText)))
        case ("$lit", JsonNodeType.BOOLEAN) => Some(EqualTo(ex, Literal(lit0.asBoolean.toString)))
        case ("$eq", JsonNodeType.NUMBER) => Some(EqualTo(num(ex), Literal(lit0.doubleValue)))
        case ("$eq", JsonNodeType.STRING) => Some(EqualTo(ex, Literal(lit0.asText)))
        case ("$eq", JsonNodeType.BOOLEAN) => Some(EqualTo(ex, Literal(lit0.asBoolean.toString)))
        // $neq on a missing key fails in the reference evaluator
        // (match.go:87-100), so require the key present before comparing
        case ("$neq", JsonNodeType.NUMBER) =>
          Some(And(IsNotNull(ex), Not(EqualNullSafe(num(ex), Literal(lit0.doubleValue)))))
        case ("$neq", JsonNodeType.STRING) =>
          Some(And(IsNotNull(ex), Not(EqualNullSafe(ex, Literal(lit0.asText)))))
        case ("$gt", JsonNodeType.NUMBER) => Some(GreaterThan(num(ex), Literal(lit0.doubleValue)))
        case ("$gte", JsonNodeType.NUMBER) => Some(GreaterThanOrEqual(num(ex), Literal(lit0.doubleValue)))
        case ("$lt", JsonNodeType.NUMBER) => Some(LessThan(num(ex), Literal(lit0.doubleValue)))
        case ("$lte", JsonNodeType.NUMBER) => Some(LessThanOrEqual(num(ex), Literal(lit0.doubleValue)))
        case ("$gt", JsonNodeType.STRING) => Some(GreaterThan(ex, Literal(lit0.asText)))
        case ("$gte", JsonNodeType.STRING) => Some(GreaterThanOrEqual(ex, Literal(lit0.asText)))
        case ("$lt", JsonNodeType.STRING) => Some(LessThan(ex, Literal(lit0.asText)))
        case ("$lte", JsonNodeType.STRING) => Some(LessThanOrEqual(ex, Literal(lit0.asText)))
        case ("$startsWith", JsonNodeType.STRING) => Some(StartsWith(ex, Literal(lit0.asText)))
        case ("$endsWith", JsonNodeType.STRING) => Some(EndsWith(ex, Literal(lit0.asText)))
        case _ => None
      }
    }
    // two-valued parity with the evaluator: missing keys → NULL → false
    try walk(JsonMatch.parse(schemaJson), "$")
      .map(e => Coalesce(Seq(e, Literal(false, BooleanType))))
    catch { case _: Exception => None }
  }

  /** Enable on an existing session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(LowerJsonMatch))
      spark.experimental.extraOptimizations = opts :+ LowerJsonMatch
    JsonMatchExpr.register(spark)
  }
}

/** `SparkSessionExtensions` entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => LowerJsonMatch)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("json_match"),
      new ExpressionInfo(classOf[JsonMatchExpr].getName, "json_match"),
      (exprs: Seq[Expression]) => JsonMatchExpr(exprs(0), exprs(1))))
  }
}
