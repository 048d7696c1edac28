package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeType
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Structural JSON filter engine.
  *
  * Re-implements the semantics of hookdeck/outpost's `simplejsonmatch`
  * package (`internal/simplejsonmatch/match.go:10-228`,
  * `operators.go:14-306`, `types.go:39-101`; the package is itself a port of
  * the public hookdeck/simple-json-match TypeScript library). A filter
  * *schema* (a JSON value) is matched recursively against an input JSON
  * value. The evaluator mirrors the reference's two-function structure —
  * a top-level schema walk plus a value matcher — because filter semantics
  * are the #1 user-facing surface and every corner case matters:
  *
  *   - a schema object whose keys are non-`$` strings matches an input
  *     object field-by-field (every listed key must match; extra input keys
  *     are ignored); a key MISSING from the input fails its condition unless
  *     the subschema contains `$exist: false` (match.go:87-100)
  *   - a literal value in the schema means equality; primitives compare
  *     strictly by type (numbers numerically, strings exactly, booleans
  *     exactly — NO string↔number or bool↔string coercion; operators.go:33-64)
  *   - operator objects: `$eq $neq $gt $gte $lt $lte $in $nin $startsWith
  *     $endsWith $exist`; several operators in one object AND together;
  *     `$or` / `$and` take an array of schemas; `$not` negates (top level of
  *     any schema object; alongside other keys it ANDs with them)
  *   - if the INPUT value is an array: a literal schema matches if ANY
  *     element matches; an ARRAY schema requires every schema element to
  *     match some input element (contains-all, match.go:139-153); an
  *     OPERATOR schema applies each operator to the whole array
  *     (match.go:156-176) — so `$eq` is deep equality, `$in`/`$nin` are
  *     membership, and comparisons fail
  *   - `$gt/$gte/$lt/$lte`: both strings → lexicographic, both numbers →
  *     numeric, anything else fails (operators.go:73-146)
  *   - `$in`: array arg → membership; string arg on string input →
  *     substring; scalar arg on array input → contains (operators.go:149-184)
  *   - `$startsWith`/`$endsWith` accept a string or an array of strings
  *   - `$exist: true` requires the key present, `false` absent
  *
  * The pure evaluator is the ONLY engine (pinned by the ported 240-case
  * corpus in JsonMatchCorpusSpec): the batch path runs it through the
  * codegen'd single-parse [[graft.plans.JsonMatchExpr]], the streaming
  * fanout through [[matchesUdf]]. A per-path predicate lowering was
  * measured slower and removed in round 3 (note at end of file).
  */
object JsonMatch {
  private val mapper = new ObjectMapper()

  def parse(json: String): JsonNode = mapper.readTree(json)

  /** Parse UTF-8 bytes directly — the batch hot path hands Spark
    * `UTF8String` payloads whose bytes Jackson can consume without the
    * UTF-16 round trip `toString` would pay (one decode per row saved). */
  def parse(json: Array[Byte]): JsonNode = mapper.readTree(json)

  /** Top-level entry: does `input` match `schema`? */
  def matches(schema: JsonNode, input: JsonNode): Boolean = matchSchema(input, schema)

  def matches(schemaJson: String, inputJson: String): Boolean =
    try matches(parse(schemaJson), parse(inputJson))
    catch { case _: Exception => false }

  // ------------------------------------------------------------------ eval --

  private val OperatorKeys = Set(
    "$eq", "$neq", "$gt", "$gte", "$lt", "$lte",
    "$in", "$nin", "$startsWith", "$endsWith", "$exist")

  private def isOperatorKey(k: String): Boolean = OperatorKeys.contains(k)

  private def isPrimitive(n: JsonNode): Boolean =
    n.isNull || n.isNumber || n.isTextual || n.isBoolean

  /** Top-level schema walk (reference match.go:10-111). */
  private def matchSchema(input: JsonNode, schema: JsonNode): Boolean = try {
    // $not at this schema level
    if (schema.isObject) {
      val not = schema.get("$not")
      if (not != null) {
        val r = matchSchema(input, not)
        if (schema.size == 1) return !r
        if (r) return false // negated condition matched → whole schema fails
        // else: fall through and check the remaining keys
      }
    }

    if (isPrimitive(input) || input.isArray) return !mismatch(input, schema)

    if (schema.isObject) {
      if (!input.isObject) return !mismatch(input, schema)
      val it = schema.properties.asScala.iterator
      while (it.hasNext) {
        val e = it.next(); val k = e.getKey; val sub = e.getValue
        if (k == "$not") () // handled above
        else if (k == "$or" && sub.isArray) {
          if (!sub.elements.asScala.exists(s => matchSchema(input, s))) return false
        } else if (k == "$and" && sub.isArray) {
          if (!sub.elements.asScala.forall(s => matchSchema(input, s))) return false
        } else {
          val v = input.get(k) // null ⟺ key absent (JSON null is NullNode)
          if (v == null) {
            // absent key passes only under an explicit $exist: false
            val existFalse = sub.isObject && {
              val ex = sub.get("$exist")
              ex != null && ex.isBoolean && !ex.asBoolean
            }
            if (!existFalse) return false
          } else if (mismatch(v, sub)) return false
        }
      }
      true
    } else !mismatch(input, schema)
  } catch { case _: Exception => false }

  /** Value-level matcher; returns true on MISMATCH (reference
    * match.go:115-228 `recursivelyMatchValue`, same inverted convention). */
  private def mismatch(input: JsonNode, schema: JsonNode): Boolean = {
    if (isPrimitive(schema)) {
      if (isPrimitive(input)) return !primEq(input, schema)
      if (input.isArray) // any element may match
        return !input.elements.asScala.exists(el => !mismatch(el, schema))
      if (input.isObject) return true
    }

    if (input.isArray) {
      if (schema.isArray) // contains-all: every schema element found in input
        return !schema.elements.asScala.forall(ss =>
          input.elements.asScala.exists(el => !mismatch(el, ss)))
      if (schema.isObject && schema.fieldNames.asScala.exists(isOperatorKey))
        // operators apply to the array as a whole
        return !schema.properties.asScala
          .filter(e => isOperatorKey(e.getKey))
          .forall(e => applyOp(e.getKey, input, e.getValue))
      return !input.elements.asScala.exists(el => !mismatch(el, schema))
    }

    if (schema.isObject) {
      val or = schema.get("$or")
      if (or != null && or.isArray)
        return !or.elements.asScala.exists(s => matchSchema(input, s))
      val ops = schema.properties.asScala.filter(e => isOperatorKey(e.getKey)).toSeq
      if (ops.nonEmpty)
        return !ops.forall(e => applyOp(e.getKey, input, e.getValue))
      if (isPrimitive(input)) return true
      return !matchSchema(input, schema)
    }

    true
  }

  /** One operator against a present value; false covers both "didn't match"
    * and the reference's unsupported-type errors (operators.go:279-306). */
  private def applyOp(op: String, v: JsonNode, arg: JsonNode): Boolean = op match {
    case "$eq" => opEq(v, arg)
    case "$neq" => !opEq(v, arg)
    case "$gt" => cmp(v, arg, _ > 0)
    case "$gte" => cmp(v, arg, _ >= 0)
    case "$lt" => cmp(v, arg, _ < 0)
    case "$lte" => cmp(v, arg, _ <= 0)
    case "$in" => opIn(v, arg).getOrElse(false)
    case "$nin" => opIn(v, arg).map(!_).getOrElse(false) // error → fail, not invert
    case "$startsWith" => strOp(v, arg)(_ startsWith _)
    case "$endsWith" => strOp(v, arg)(_ endsWith _)
    case "$exist" => arg.isBoolean && arg.asBoolean // value IS present here
    case _ => false // unknown operator (incl. unimplemented $ref)
  }

  /** Strict primitive equality (operators.go:33-64 `compareEquality`):
    * numbers numerically, strings/bools exactly, null == null; no coercion. */
  private def primEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNull && b.isNull) true
    else if (a.isNull || b.isNull) false
    else if (a.isNumber && b.isNumber) a.doubleValue == b.doubleValue
    else if (a.isTextual && b.isTextual) a.asText == b.asText
    else if (a.isBoolean && b.isBoolean) a.asBoolean == b.asBoolean
    else false

  /** $eq: primitives via [[primEq]], otherwise deep structural equality
    * (the reference serializes both sides; operators.go:14-30). */
  private def opEq(v: JsonNode, arg: JsonNode): Boolean =
    if (isPrimitive(v) && isPrimitive(arg)) primEq(v, arg)
    else deepEq(v, arg)

  private def deepEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.doubleValue == b.doubleValue
    else if (a.isArray && b.isArray)
      a.size == b.size && a.elements.asScala.zip(b.elements.asScala).forall {
        case (x, y) => deepEq(x, y)
      }
    else if (a.isObject && b.isObject) {
      val ak = a.fieldNames.asScala.toSet
      ak == b.fieldNames.asScala.toSet && ak.forall(k => deepEq(a.get(k), b.get(k)))
    } else a.getNodeType == b.getNodeType && a == b

  /** $gt/$gte/$lt/$lte: strings lexicographically, numbers numerically,
    * mixed/other types are unsupported (operators.go:73-146). */
  private def cmp(v: JsonNode, arg: JsonNode, ok: Int => Boolean): Boolean =
    if (v.isTextual && arg.isTextual) ok(v.asText.compareTo(arg.asText))
    else if (v.isNumber && arg.isNumber) ok(java.lang.Double.compare(v.doubleValue, arg.doubleValue))
    else false

  /** $in (operators.go:149-184); None = unsupported-type error. */
  private def opIn(v: JsonNode, arg: JsonNode): Option[Boolean] =
    if (arg.isArray) {
      if (!isPrimitive(v)) None
      else Some(arg.elements.asScala.exists(item => primEq(v, item)))
    } else if (v.isTextual) {
      if (arg.isTextual) Some(v.asText.contains(arg.asText)) else None
    } else if (v.isArray) {
      Some(v.elements.asScala.exists(el => primEq(el, arg)))
    } else None

  /** $startsWith/$endsWith: string or array-of-strings argument; a
    * non-string array element is an error unless a match came first
    * (operators.go:193-246 iterates and errors in order). */
  private def strOp(v: JsonNode, arg: JsonNode)(f: (String, String) => Boolean): Boolean = {
    if (!v.isTextual) return false
    val s = v.asText
    if (arg.isTextual) f(s, arg.asText)
    else if (arg.isArray) {
      val it = arg.elements.asScala
      while (it.hasNext) {
        val item = it.next()
        if (!item.isTextual) return false // ErrUnsupportedType
        if (f(s, item.asText)) return true
      }
      false
    } else false
  }

  // --------------------------------------------------------------- column --

  /** UDF form over a JSON-string column (correctness fallback; the schema is
    * parsed once per executor via the closure). */
  def matchesUdf(schemaJson: String): org.apache.spark.sql.expressions.UserDefinedFunction = {
    udf((input: String) => input != null && matches(schemaJson, input))
  }

  /* Round 3 note: a lowering of simple schemas into per-path extraction
   * predicates (round 2: get_json_object; round 3 prototype: an EXACT
   * variant-typed form with schema_of_variant type guards and an
   * any-element array fallback) was benchmarked against the codegen'd
   * single-parse evaluator expression (graft.plans.JsonMatchExpr) on sf0.1
   * events and LOST — 0.31 s / 0.65 s vs 0.21 s — because FilterExec does
   * no common-subexpression elimination (every conjunct re-parses the JSON)
   * and none of these predicates is parquet-pushable. The lowering was
   * removed; the evaluator is the only engine, which also eliminates the
   * fast-path divergence class by construction. See DESIGN.md.
   */
}
