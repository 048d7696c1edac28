package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Structural JSON filter engine.
  *
  * Re-implements the semantics of hookdeck/outpost's `simplejsonmatch`
  * package (`internal/simplejsonmatch/match.go:10-228`, `operators.go:14-306`;
  * operator table in its README): a filter *schema* (a JSON object) is
  * matched recursively against an input JSON value.
  *
  * Semantics:
  *   - a schema object whose keys are all non-`$` strings matches an input
  *     object field-by-field (every listed key must match; extra input keys
  *     are ignored)
  *   - a literal value in the schema means `$eq`
  *   - operator objects: `$eq $neq $gt $gte $lt $lte $in $nin $startsWith
  *     $endsWith $exist $or $and $not`; several operators in one object AND
  *     together
  *   - `$or` / `$and` take an array of schemas; `$not` takes a schema
  *   - if the INPUT value is an array, a match succeeds if ANY element
  *     matches (array-contains semantics); `$not` inverts after that
  *   - loose coercion for equality/comparison: numbers compare numerically;
  *     a string that parses as a number compares numerically with a number;
  *     booleans compare with the strings "true"/"false"
  *   - `$exist: true` requires the key to be present, `false` absent
  *
  * The pure evaluator is the correctness reference (used as a UDF and by the
  * streaming fanout). [[compile]] lowers simple schemas (no `$or`/`$not`/
  * arrays-as-literals) to a native `Column` over a JSON string column using
  * `get_json_object` — that form is codegen'd and prunable by Catalyst, and
  * is preferred in the batch query path.
  */
object JsonMatch {
  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Top-level entry: does `input` (a JSON object) match `schema`? */
  def matches(schema: JsonNode, input: JsonNode): Boolean = matchValue(schema, Some(input))

  def matches(schemaJson: String, inputJson: String): Boolean =
    try matches(parse(schemaJson), parse(inputJson))
    catch { case _: Exception => false }

  // ------------------------------------------------------------------ eval --

  private def isOperatorObject(schema: JsonNode): Boolean =
    schema.isObject && schema.fieldNames.asScala.exists(_.startsWith("$"))

  /** Match a schema node against an (optional — absent key) input value. */
  private def matchValue(schema: JsonNode, input: Option[JsonNode]): Boolean = {
    if (schema.isObject && isOperatorObject(schema)) {
      schema.properties.asScala.forall(e => applyOp(e.getKey, e.getValue, input))
    } else if (schema.isObject) {
      // structural object match; input arrays get any-element semantics
      input match {
        case Some(in) if in.isArray =>
          in.elements.asScala.exists(el => matchValue(schema, Some(el)))
        case Some(in) if in.isObject =>
          schema.properties.asScala.forall { e =>
            matchValue(e.getValue, Option(in.get(e.getKey)))
          }
        case _ => false
      }
    } else {
      // literal → $eq
      input.exists(in => looseContains(in, schema))
    }
  }

  private def applyOp(op: String, arg: JsonNode, input: Option[JsonNode]): Boolean = op match {
    case "$exist" =>
      val want = arg.asBoolean(true)
      input.isDefined == want
    case "$or" => arg.isArray && arg.elements.asScala.exists(s => matchValue(s, input))
    case "$and" => arg.isArray && arg.elements.asScala.forall(s => matchValue(s, input))
    case "$not" => !matchValue(arg, input)
    case "$eq" => input.exists(in => looseContains(in, arg))
    case "$neq" => !input.exists(in => looseContains(in, arg))
    case "$in" =>
      arg.isArray && input.exists(in => arg.elements.asScala.exists(a => looseContains(in, a)))
    case "$nin" =>
      !(arg.isArray && input.exists(in => arg.elements.asScala.exists(a => looseContains(in, a))))
    case "$gt" => cmpAny(input, arg, _ > 0)
    case "$gte" => cmpAny(input, arg, _ >= 0)
    case "$lt" => cmpAny(input, arg, _ < 0)
    case "$lte" => cmpAny(input, arg, _ <= 0)
    case "$startsWith" => strAny(input)(s => arg.isTextual && s.startsWith(arg.asText))
    case "$endsWith" => strAny(input)(s => arg.isTextual && s.endsWith(arg.asText))
    case _ => false // unknown operator (incl. unimplemented $ref) never matches
  }

  /** input (scalar or array → any element) loosely equals literal. */
  private def looseContains(input: JsonNode, lit: JsonNode): Boolean =
    if (input.isArray) input.elements.asScala.exists(el => looseEq(el, lit))
    else looseEq(input, lit)

  private def looseEq(a: JsonNode, b: JsonNode): Boolean = {
    if (a.getNodeType == b.getNodeType) {
      (a.isNumber && b.isNumber && a.doubleValue == b.doubleValue) || a == b
    } else {
      (numOf(a), numOf(b)) match {
        case (Some(x), Some(y)) => x == y
        case _ =>
          // bool <-> "true"/"false" string coercion
          val as = coerceString(a); val bs = coerceString(b)
          as.isDefined && as == bs
      }
    }
  }

  private def numOf(n: JsonNode): Option[Double] =
    if (n.isNumber) Some(n.doubleValue)
    else if (n.isTextual) n.asText.toDoubleOption
    else None

  private def coerceString(n: JsonNode): Option[String] =
    if (n.isTextual) Some(n.asText)
    else if (n.isBoolean) Some(if (n.asBoolean) "true" else "false")
    else None

  private def cmpAny(input: Option[JsonNode], arg: JsonNode, ok: Int => Boolean): Boolean =
    input.exists { in =>
      val elems = if (in.isArray) in.elements.asScala.toSeq else Seq(in)
      elems.exists { el =>
        (numOf(el), numOf(arg)) match {
          case (Some(x), Some(y)) => ok(java.lang.Double.compare(x, y))
          case _ if el.isTextual && arg.isTextual => ok(el.asText.compareTo(arg.asText))
          case _ => false
        }
      }
    }

  private def strAny(input: Option[JsonNode])(f: String => Boolean): Boolean =
    input.exists { in =>
      val elems = if (in.isArray) in.elements.asScala.toSeq else Seq(in)
      elems.exists(el => el.isTextual && f(el.asText))
    }

  // --------------------------------------------------------------- column --

  /** UDF form over a JSON-string column (correctness fallback; the schema is
    * parsed once per executor via the closure). */
  def matchesUdf(schemaJson: String): org.apache.spark.sql.expressions.UserDefinedFunction = {
    udf((input: String) => input != null && matches(schemaJson, input))
  }

  /** Lower a simple schema to a native Column over a JSON string column.
    *
    * Handles nested structural objects whose leaves are literals or single
    * comparison/string operators on scalars. Returns None when the schema
    * uses `$or`/`$and`/`$not`/`$in`/`$nin`/`$exist`, array literals, or
    * non-scalar leaves — callers fall back to [[matchesUdf]]. The compiled
    * form ends up as `get_json_object` + comparisons: codegen'd and visible
    * to Catalyst (constant folding, filter pushdown of conjuncts).
    */
  def compile(schemaJson: String, jsonCol: Column): Option[Column] = {
    def walk(schema: JsonNode, path: String): Option[Column] = {
      if (!schema.isObject) return leaf(schema, path, "$eq")
      val entries = schema.properties.asScala.toSeq
      val parts = entries.map { e =>
        val k = e.getKey
        if (k.startsWith("$")) leaf(e.getValue, path, k)
        else walk(e.getValue, s"$path.$k")
      }
      if (parts.exists(_.isEmpty)) None
      else Some(parts.flatten.reduce(_ && _))
    }
    def leaf(lit0: JsonNode, path: String, op: String): Option[Column] = {
      val extracted = get_json_object(jsonCol, path)
      (op, lit0.getNodeType) match {
        case ("$eq", JsonNodeType.NUMBER) => Some(extracted.cast("double") === lit(lit0.doubleValue))
        case ("$eq", JsonNodeType.STRING) => Some(extracted === lit(lit0.asText))
        case ("$eq", JsonNodeType.BOOLEAN) => Some(extracted === lit(lit0.asBoolean.toString))
        case ("$neq", JsonNodeType.NUMBER) => Some(!(extracted.cast("double") <=> lit(lit0.doubleValue)))
        case ("$neq", JsonNodeType.STRING) => Some(!(extracted <=> lit(lit0.asText)))
        case ("$gt", JsonNodeType.NUMBER) => Some(extracted.cast("double") > lit(lit0.doubleValue))
        case ("$gte", JsonNodeType.NUMBER) => Some(extracted.cast("double") >= lit(lit0.doubleValue))
        case ("$lt", JsonNodeType.NUMBER) => Some(extracted.cast("double") < lit(lit0.doubleValue))
        case ("$lte", JsonNodeType.NUMBER) => Some(extracted.cast("double") <= lit(lit0.doubleValue))
        case ("$startsWith", JsonNodeType.STRING) => Some(extracted.startsWith(lit0.asText))
        case ("$endsWith", JsonNodeType.STRING) => Some(extracted.endsWith(lit0.asText))
        case _ => None
      }
    }
    // missing keys make comparisons NULL; the evaluator is two-valued, so
    // collapse NULL → false for parity
    try walk(parse(schemaJson), "$").map(c => coalesce(c, lit(false)))
    catch { case _: Exception => None }
  }
}
