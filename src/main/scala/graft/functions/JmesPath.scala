package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, BooleanNode, DoubleNode, JsonNodeFactory, NullNode, ObjectNode, TextNode}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Full JMESPath (jmespath.org spec) over Jackson trees.
  *
  * The reference evaluates partition-key and object-key templates with the
  * complete go-jmespath library (`destregistry/partitionkey/partitionkey.go:11-40`),
  * so ANY spec-legal template is a legal user config — identifier paths are
  * merely the common case. This is an original Pratt parser + tree
  * evaluator implementing the spec grammar: identifiers (quoted and raw),
  * index/slice access, list/object/slice/filter projections, flatten,
  * pipes, multiselect lists and hashes, comparators, boolean logic, raw
  * string and JSON literals, expression references, and the complete
  * builtin function library.
  *
  * Semantics follow the published spec:
  *   - a missing field/index is `null`, never an error;
  *   - projections drop per-element `null` results; a projection applied
  *     to the wrong type is `null`;
  *   - false-likes for boolean logic are null/false/""/[]/{};
  *   - `a || b` returns the first truthy operand's VALUE, `a && b` the
  *     second (or the false-like first), as in the spec;
  *   - ordering comparators on non-numbers yield `null`;
  *   - function arity/type violations THROW [[JmesPathError]] (go-jmespath
  *     returns an error; the reference's callers treat that as evaluation
  *     failure, e.g. `destawskinesis.go:236-239`).
  *
  * Numbers are evaluated as doubles throughout, mirroring go-jmespath
  * (JSON unmarshals every number to float64).
  */
object JmesPath {

  final case class JmesPathError(msg: String) extends RuntimeException(msg)

  private val F = JsonNodeFactory.instance

  // ---------------------------------------------------------------- AST
  sealed trait Ast
  private case object Identity extends Ast
  private case object Current extends Ast
  private final case class Field(name: String) extends Ast
  private final case class Subexpr(l: Ast, r: Ast) extends Ast
  private final case class Index(i: Int) extends Ast
  private final case class SliceNode(start: Option[Int], stop: Option[Int], step: Option[Int]) extends Ast
  private final case class Projection(l: Ast, r: Ast) extends Ast
  private final case class ValueProjection(l: Ast, r: Ast) extends Ast
  private final case class FilterProjection(l: Ast, cond: Ast, r: Ast) extends Ast
  private final case class Flatten(child: Ast) extends Ast
  private final case class PipeNode(l: Ast, r: Ast) extends Ast
  private final case class MultiList(elems: Seq[Ast]) extends Ast
  private final case class MultiHash(pairs: Seq[(String, Ast)]) extends Ast
  private final case class Cmp(op: String, l: Ast, r: Ast) extends Ast
  private final case class AndNode(l: Ast, r: Ast) extends Ast
  private final case class OrNode(l: Ast, r: Ast) extends Ast
  private final case class NotNode(e: Ast) extends Ast
  private final case class LiteralNode(v: JsonNode) extends Ast
  private final case class FuncCall(name: String, args: Seq[Ast]) extends Ast
  private final case class ExpRef(e: Ast) extends Ast

  // ------------------------------------------------------------- lexer
  private final case class Tok(typ: String, text: String, pos: Int)

  private def lex(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    def err(m: String) = throw JmesPathError(s"syntax error at $i: $m")
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '.' => out += Tok("dot", ".", i); i += 1
        case '*' => out += Tok("star", "*", i); i += 1
        case ',' => out += Tok("comma", ",", i); i += 1
        case ':' => out += Tok("colon", ":", i); i += 1
        case '@' => out += Tok("at", "@", i); i += 1
        case '(' => out += Tok("lparen", "(", i); i += 1
        case ')' => out += Tok("rparen", ")", i); i += 1
        case '{' => out += Tok("lbrace", "{", i); i += 1
        case '}' => out += Tok("rbrace", "}", i); i += 1
        case ']' => out += Tok("rbracket", "]", i); i += 1
        case '[' =>
          if (i + 1 < n && s.charAt(i + 1) == ']') { out += Tok("flatten", "[]", i); i += 2 }
          else if (i + 1 < n && s.charAt(i + 1) == '?') { out += Tok("filter", "[?", i); i += 2 }
          else { out += Tok("lbracket", "[", i); i += 1 }
        case '|' =>
          if (i + 1 < n && s.charAt(i + 1) == '|') { out += Tok("or", "||", i); i += 2 }
          else { out += Tok("pipe", "|", i); i += 1 }
        case '&' =>
          if (i + 1 < n && s.charAt(i + 1) == '&') { out += Tok("and", "&&", i); i += 2 }
          else { out += Tok("amp", "&", i); i += 1 }
        case '=' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += Tok("eq", "==", i); i += 2 }
          else err("'=' is not an operator (use '==')")
        case '!' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += Tok("ne", "!=", i); i += 2 }
          else { out += Tok("not", "!", i); i += 1 }
        case '<' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += Tok("lte", "<=", i); i += 2 }
          else { out += Tok("lt", "<", i); i += 1 }
        case '>' =>
          if (i + 1 < n && s.charAt(i + 1) == '=') { out += Tok("gte", ">=", i); i += 2 }
          else { out += Tok("gt", ">", i); i += 1 }
        case '\'' =>
          // raw string: \' and \\ unescape, everything else literal
          val sb = new StringBuilder
          var j = i + 1
          var closed = false
          while (j < n && !closed) {
            val ch = s.charAt(j)
            if (ch == '\\' && j + 1 < n && (s.charAt(j + 1) == '\'' || s.charAt(j + 1) == '\\')) {
              sb.append(s.charAt(j + 1)); j += 2
            } else if (ch == '\'') { closed = true; j += 1 }
            else { sb.append(ch); j += 1 }
          }
          if (!closed) err("unterminated raw string")
          out += Tok("rawstr", sb.toString, i); i = j
        case '"' =>
          // quoted identifier: JSON string syntax
          var j = i + 1
          var closed = false
          while (j < n && !closed) {
            val ch = s.charAt(j)
            if (ch == '\\') j += 2
            else if (ch == '"') { closed = true; j += 1 }
            else j += 1
          }
          if (!closed) err("unterminated quoted identifier")
          val raw = s.substring(i, j)
          val name =
            try JsonMatch.parse(raw).asText()
            catch { case _: Exception => err("bad quoted identifier") }
          out += Tok("quoted", name, i); i = j
        case '`' =>
          var j = i + 1
          val sb = new StringBuilder
          var closed = false
          while (j < n && !closed) {
            val ch = s.charAt(j)
            if (ch == '\\' && j + 1 < n && s.charAt(j + 1) == '`') { sb.append('`'); j += 2 }
            else if (ch == '`') { closed = true; j += 1 }
            else { sb.append(ch); j += 1 }
          }
          if (!closed) err("unterminated literal")
          out += Tok("literal", sb.toString, i); i = j
        case d if d.isDigit || d == '-' =>
          var j = i + 1
          while (j < n && s.charAt(j).isDigit) j += 1
          if (j == i + 1 && d == '-') err("lone '-'")
          out += Tok("number", s.substring(i, j), i); i = j
        case a if a.isLetter || a == '_' =>
          var j = i + 1
          while (j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
          out += Tok("field", s.substring(i, j), i); i = j
        case other => err(s"unexpected character '$other'")
      }
    }
    out += Tok("eof", "", n)
    out.result()
  }

  // ------------------------------------------------------------ parser
  private val Bp: Map[String, Int] = Map(
    "eof" -> 0, "field" -> 0, "quoted" -> 0, "rawstr" -> 0, "literal" -> 0,
    "rbracket" -> 0, "rparen" -> 0, "comma" -> 0, "rbrace" -> 0,
    "number" -> 0, "at" -> 0, "amp" -> 0, "colon" -> 0,
    "pipe" -> 1, "or" -> 2, "and" -> 3,
    "eq" -> 5, "ne" -> 5, "lt" -> 5, "lte" -> 5, "gt" -> 5, "gte" -> 5,
    "flatten" -> 9, "star" -> 20, "filter" -> 21, "dot" -> 40, "not" -> 45,
    "lbrace" -> 50, "lbracket" -> 55, "lparen" -> 60)

  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def advance(): Tok = { val t = toks(pos); pos += 1; t }
    private def expect(typ: String): Tok = {
      val t = advance()
      if (t.typ != typ) throw JmesPathError(s"expected $typ, got ${t.typ} at ${t.pos}")
      t
    }

    def parse(): Ast = {
      val e = expression(0)
      if (peek.typ != "eof") throw JmesPathError(s"unexpected ${peek.typ} at ${peek.pos}")
      e
    }

    def expression(rbp: Int): Ast = {
      var left = nud(advance())
      while (rbp < Bp(peek.typ)) left = led(advance(), left)
      left
    }

    private def nud(t: Tok): Ast = t.typ match {
      case "field" =>
        if (peek.typ == "lparen") { advance(); parseFunction(t.text) } else Field(t.text)
      case "quoted" =>
        if (peek.typ == "lparen") throw JmesPathError("quoted identifier cannot be a function name")
        Field(t.text)
      case "rawstr" => LiteralNode(TextNode.valueOf(t.text))
      case "literal" => LiteralNode(parseLiteral(t.text))
      case "star" => ValueProjection(Identity, parseProjectionRhs(Bp("star")))
      case "filter" => parseFilter(Identity)
      case "flatten" => Projection(Flatten(Identity), parseProjectionRhs(Bp("flatten")))
      case "lbracket" => parseBracket(Identity, nudContext = true)
      case "lbrace" => parseMultiHash()
      case "not" => NotNode(expression(Bp("not")))
      case "lparen" => val e = expression(0); expect("rparen"); e
      case "at" => Current
      case "amp" => ExpRef(expression(0))
      case other => throw JmesPathError(s"unexpected $other at ${t.pos}")
    }

    private def led(t: Tok, left: Ast): Ast = t.typ match {
      case "dot" =>
        if (peek.typ == "star") { advance(); ValueProjection(left, parseProjectionRhs(Bp("star"))) }
        else Subexpr(left, parseDotRhs(Bp("dot")))
      case "pipe" => PipeNode(left, expression(Bp("pipe")))
      case "or" => OrNode(left, expression(Bp("or")))
      case "and" => AndNode(left, expression(Bp("and")))
      case "eq" | "ne" | "lt" | "lte" | "gt" | "gte" =>
        Cmp(t.typ, left, expression(Bp(t.typ)))
      case "flatten" => Projection(Flatten(left), parseProjectionRhs(Bp("flatten")))
      case "filter" => parseFilter(left)
      case "lbracket" => parseBracket(left, nudContext = false)
      case "lparen" =>
        throw JmesPathError(s"function call on non-identifier at ${t.pos}")
      case other => throw JmesPathError(s"unexpected $other at ${t.pos}")
    }

    /** `[` already consumed. Index, slice, `[*]`, or (nud only) multiselect list. */
    private def parseBracket(left: Ast, nudContext: Boolean): Ast = peek.typ match {
      case "number" | "colon" =>
        val first =
          if (peek.typ == "number") { val v = advance().text.toInt; Some(v) } else None
        if (peek.typ == "colon") parseSliceRest(left, first)
        else { expect("rbracket"); Subexpr(left, Index(first.get)) }
      case "star" if toks(pos + 1).typ == "rbracket" =>
        advance(); advance()
        Projection(left, parseProjectionRhs(Bp("star")))
      case _ if nudContext =>
        Subexpr(left, parseMultiList())
      case other => throw JmesPathError(s"unexpected $other in brackets at ${peek.pos}")
    }

    /** `[` already consumed; parse `expr, expr, …]`. */
    private def parseMultiList(): Ast = {
      val elems = ArrayBuffer[Ast]()
      while (peek.typ != "rbracket") {
        elems += expression(0)
        if (peek.typ == "comma") advance()
        else if (peek.typ != "rbracket")
          throw JmesPathError(s"expected ',' or ']' at ${peek.pos}")
      }
      advance()
      MultiList(elems.toSeq)
    }

    private def parseSliceRest(left: Ast, start: Option[Int]): Ast = {
      expect("colon")
      var stop: Option[Int] = None
      var step: Option[Int] = None
      if (peek.typ == "number") stop = Some(advance().text.toInt)
      if (peek.typ == "colon") {
        advance()
        if (peek.typ == "number") step = Some(advance().text.toInt)
      }
      expect("rbracket")
      // a slice is itself a projection
      Projection(Subexpr(left, SliceNode(start, stop, step)), parseProjectionRhs(Bp("star")))
    }

    private def parseFilter(left: Ast): Ast = {
      val cond = expression(0)
      expect("rbracket")
      FilterProjection(left, cond, parseProjectionRhs(Bp("filter")))
    }

    private def parseDotRhs(bp: Int): Ast = peek.typ match {
      // parse the FULL sub-expression at the dot's binding power, so
      // `a[*].b[0].c` chains the RHS's own indexes/projections
      case "field" | "quoted" | "star" => expression(bp)
      // after a dot, a bracket is a multiselect list (never an index)
      case "lbracket" => advance(); parseMultiList()
      case "lbrace" => advance(); parseMultiHash()
      case other => throw JmesPathError(s"unexpected $other after '.' at ${peek.pos}")
    }

    private def parseProjectionRhs(bp: Int): Ast = {
      if (Bp(peek.typ) < 10) Identity
      else peek.typ match {
        case "lbracket" | "filter" | "flatten" => expression(bp)
        case "dot" => advance(); parseDotRhs(bp)
        case other => throw JmesPathError(s"bad projection continuation $other at ${peek.pos}")
      }
    }

    private def parseMultiHash(): Ast = {
      val pairs = ArrayBuffer[(String, Ast)]()
      while (peek.typ != "rbrace") {
        val key = peek.typ match {
          case "field" | "quoted" => advance().text
          case other => throw JmesPathError(s"bad multiselect-hash key $other at ${peek.pos}")
        }
        expect("colon")
        pairs += key -> expression(0)
        if (peek.typ == "comma") advance()
        else if (peek.typ != "rbrace")
          throw JmesPathError(s"expected ',' or '}' at ${peek.pos}")
      }
      advance()
      MultiHash(pairs.toSeq)
    }

    private def parseFunction(name: String): Ast = {
      val args = ArrayBuffer[Ast]()
      while (peek.typ != "rparen") {
        args += expression(0)
        if (peek.typ == "comma") advance()
        else if (peek.typ != "rparen")
          throw JmesPathError(s"expected ',' or ')' at ${peek.pos}")
      }
      advance()
      FuncCall(name, args.toSeq)
    }

    private def parseLiteral(text: String): JsonNode =
      try JsonMatch.parse(text)
      catch {
        // legacy literal form: `bare words` is a string literal
        case _: Exception => TextNode.valueOf(text)
      }
  }

  // --------------------------------------------------------- evaluator
  private val Null: JsonNode = NullNode.instance

  private def truthy(n: JsonNode): Boolean = n match {
    case _ if n == null || n.isNull => false
    case b if b.isBoolean => b.asBoolean
    case t if t.isTextual => t.asText.nonEmpty
    case a if a.isArray => a.size > 0
    case o if o.isObject => o.size > 0
    case _ => true // numbers are truthy, including 0 (per spec)
  }

  private def numEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber) a.doubleValue == b.doubleValue
    else a == b

  private def deepEq(a: JsonNode, b: JsonNode): Boolean = (a, b) match {
    case _ if a.isNumber || b.isNumber => numEq(a, b)
    case _ if a.isArray && b.isArray =>
      a.size == b.size && a.elements.asScala.zip(b.elements.asScala).forall { case (x, y) => deepEq(x, y) }
    case _ if a.isObject && b.isObject =>
      a.size == b.size && a.properties.asScala.forall { e =>
        b.has(e.getKey) && deepEq(e.getValue, b.get(e.getKey))
      }
    case _ => a == b
  }

  private def eval(ast: Ast, data: JsonNode): JsonNode = ast match {
    case Identity | Current => if (data == null) Null else data
    case Field(name) =>
      if (data != null && data.isObject && data.has(name)) data.get(name) else Null
    case Subexpr(l, r) => eval(r, eval(l, data))
    case Index(i) =>
      if (data == null || !data.isArray) Null
      else {
        val idx = if (i < 0) data.size + i else i
        if (idx >= 0 && idx < data.size) data.get(idx) else Null
      }
    case SliceNode(s0, s1, st) =>
      if (data == null || !data.isArray) Null
      else slice(data.asInstanceOf[ArrayNode], s0, s1, st)
    case Projection(l, r) =>
      val base = eval(l, data)
      if (!base.isArray) Null
      else {
        val out = F.arrayNode()
        base.elements.asScala.foreach { e =>
          val v = eval(r, e)
          if (!v.isNull) out.add(v)
        }
        out
      }
    case ValueProjection(l, r) =>
      val base = eval(l, data)
      if (!base.isObject) Null
      else {
        val out = F.arrayNode()
        base.properties.asScala.foreach { e =>
          val v = eval(r, e.getValue)
          if (!v.isNull) out.add(v)
        }
        out
      }
    case FilterProjection(l, cond, r) =>
      val base = eval(l, data)
      if (!base.isArray) Null
      else {
        val out = F.arrayNode()
        base.elements.asScala.foreach { e =>
          if (truthy(eval(cond, e))) {
            val v = eval(r, e)
            if (!v.isNull) out.add(v)
          }
        }
        out
      }
    case Flatten(child) =>
      val base = eval(child, data)
      if (!base.isArray) Null
      else {
        val out = F.arrayNode()
        base.elements.asScala.foreach { e =>
          if (e.isArray) e.elements.asScala.foreach(out.add)
          else out.add(e)
        }
        out
      }
    case PipeNode(l, r) => eval(r, eval(l, data))
    case MultiList(elems) =>
      if (data == null || data.isNull) Null
      else {
        val out = F.arrayNode()
        elems.foreach(e => out.add(eval(e, data)))
        out
      }
    case MultiHash(pairs) =>
      if (data == null || data.isNull) Null
      else {
        val out = F.objectNode()
        pairs.foreach { case (k, e) => out.set[ObjectNode](k, eval(e, data)) }
        out
      }
    case Cmp(op, l, r) =>
      val a = eval(l, data)
      val b = eval(r, data)
      op match {
        case "eq" => BooleanNode.valueOf(deepEq(a, b))
        case "ne" => BooleanNode.valueOf(!deepEq(a, b))
        case _ =>
          if (!a.isNumber || !b.isNumber) Null
          else {
            val (x, y) = (a.doubleValue, b.doubleValue)
            BooleanNode.valueOf(op match {
              case "lt" => x < y
              case "lte" => x <= y
              case "gt" => x > y
              case "gte" => x >= y
            })
          }
      }
    case AndNode(l, r) =>
      val a = eval(l, data); if (!truthy(a)) a else eval(r, data)
    case OrNode(l, r) =>
      val a = eval(l, data); if (truthy(a)) a else eval(r, data)
    case NotNode(e) => BooleanNode.valueOf(!truthy(eval(e, data)))
    case LiteralNode(v) => v
    case FuncCall(name, args) => callFunction(name, args, data)
    case ExpRef(_) => throw JmesPathError("expression reference outside a function argument")
  }

  private def slice(arr: ArrayNode, s0: Option[Int], s1: Option[Int], stO: Option[Int]): JsonNode = {
    val n = arr.size
    val step = stO.getOrElse(1)
    if (step == 0) throw JmesPathError("slice step cannot be 0")
    def clamp(v: Int, lo: Int, hi: Int) = math.max(lo, math.min(hi, v))
    val (start, stop) =
      if (step > 0) {
        val a = s0.map(v => if (v < 0) clamp(n + v, 0, n) else clamp(v, 0, n)).getOrElse(0)
        val b = s1.map(v => if (v < 0) clamp(n + v, 0, n) else clamp(v, 0, n)).getOrElse(n)
        (a, b)
      } else {
        val a = s0.map(v => if (v < 0) clamp(n + v, -1, n - 1) else clamp(v, -1, n - 1)).getOrElse(n - 1)
        val b = s1.map(v => if (v < 0) clamp(n + v, -1, n - 1) else clamp(v, -1, n - 1)).getOrElse(-1)
        (a, b)
      }
    val out = F.arrayNode()
    var i = start
    while (if (step > 0) i < stop else i > stop) {
      out.add(arr.get(i))
      i += step
    }
    out
  }

  // --------------------------------------------------------- functions
  private def typeName(n: JsonNode): String =
    if (n == null || n.isNull) "null"
    else if (n.isBoolean) "boolean"
    else if (n.isTextual) "string"
    else if (n.isNumber) "number"
    else if (n.isArray) "array"
    else "object"

  /** Engine-computed numbers. go-jmespath computes in float64, and Go's
    * `json.Marshal` renders integral floats with no fraction (`6`, not
    * `6.0`); every rendering of engine output goes through
    * `JsonNode.toString`, so materialize exactly-integral results as long
    * nodes — composed `to_string`/`join` partition keys then match
    * reference-produced bytes. Comparisons are unaffected ([[numEq]] and
    * orderings go through `doubleValue`). 2^53 bound keeps the long form
    * lossless; anything beyond stays a double. */
  private def num(d: Double): JsonNode =
    if (d == math.rint(d) && math.abs(d) <= 9007199254740992d &&
        !(d == 0.0 && 1 / d < 0))
      JsonNodeFactory.instance.numberNode(d.toLong)
    else DoubleNode.valueOf(d)

  /** Shortest round-trip decimal digits of a positive double:
    * (significant digits, decimal exponent of the leading digit).
    * 123456.0 → ("123456", 5); 0.001 → ("1", -3). Shared by the `%g`
    * renderer ([[PartitionKey.goG]]) and [[goJsonNumber]]. */
  private[functions] def shortestDigits(ad: Double): (String, Int) = {
    val repr = java.lang.Double.toString(ad)
    val (mantissa, exp10) = repr.split('E') match {
      case Array(m) =>
        val dot = m.indexOf('.')
        (m.replace(".", ""), dot - 1)
      case Array(m, e) =>
        val dot = m.indexOf('.')
        (m.replace(".", ""), e.toInt + (if (dot > 1) dot - 1 else 0))
    }
    val digits = mantissa.replaceFirst("0+$", "") match { case "" => "0"; case s => s }
    val lead = digits.indexWhere(_ != '0')
    if (lead > 0) (digits.substring(lead), exp10 - lead) else (digits, exp10)
  }

  /** Go `encoding/json` float rendering (`floatEncoder`): shortest
    * round-trip digits; FIXED notation unless |d| < 1e-6 or ≥ 1e21, where
    * the 'e' form appears with Go's cleanup of single-digit negative
    * exponents (`1e-7`, not `1e-07`; positive exponents keep two digits:
    * `1e+21`). `to_string` of a non-integral payload double must produce
    * these bytes to match go-jmespath's json.Marshal. */
  private[functions] def goJsonNumber(d: Double): String = {
    if (d.isNaN || d.isInfinite) return d.toString // json.Marshal errors; unreachable from parsed payloads
    if (d == 0.0) return if (1 / d < 0) "-0" else "0"
    val neg = d < 0
    val ad = math.abs(d)
    val (sig, exp) = shortestDigits(ad)
    val nd = sig.length
    val sb = new StringBuilder(if (neg) "-" else "")
    if (ad < 1e-6 || ad >= 1e21) {
      sb.append(sig.head)
      if (nd > 1) sb.append('.').append(sig.tail)
      sb.append('e').append(if (exp < 0) '-' else '+')
      val ae = math.abs(exp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
      val s = sb.toString
      // encoding/json: e-0X collapses to e-X
      if (s(s.length - 3) == '-' && s(s.length - 2) == '0')
        s.substring(0, s.length - 2) + s.last
      else s
    } else if (exp >= nd - 1) {
      sb.append(sig).append("0" * (exp - nd + 1)).toString
    } else if (exp >= 0) {
      sb.append(sig.substring(0, exp + 1)).append('.')
        .append(sig.substring(exp + 1)).toString
    } else {
      sb.append("0.").append("0" * (-exp - 1)).append(sig).toString
    }
  }

  private def badType(fn: String, got: JsonNode): Nothing =
    throw JmesPathError(s"$fn: invalid type ${typeName(got)}")

  private def arity(fn: String, args: Seq[_], n: Int): Unit =
    if (args.size != n) throw JmesPathError(s"$fn: expected $n arguments, got ${args.size}")

  private def callFunction(name: String, rawArgs: Seq[Ast], data: JsonNode): JsonNode = {
    def evalArg(a: Ast): JsonNode = a match {
      case ExpRef(_) => throw JmesPathError(s"$name: unexpected expression reference")
      case e => eval(e, data)
    }
    def expRef(a: Ast): Ast = a match {
      case ExpRef(e) => e
      case _ => throw JmesPathError(s"$name: expected an expression reference (&expr)")
    }
    def sortKey(e: Ast, elem: JsonNode): JsonNode = {
      val k = eval(e, elem)
      if (!k.isNumber && !k.isTextual) badType(name, k)
      k
    }
    def keyOrdering(sample: JsonNode): Ordering[JsonNode] =
      if (sample.isNumber) Ordering.by[JsonNode, Double](_.doubleValue)
      else Ordering.by[JsonNode, String](_.asText)

    name match {
      case "abs" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isNumber) badType(name, a)
        num(math.abs(a.doubleValue))
      case "avg" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isArray) badType(name, a)
        val xs = a.elements.asScala.toSeq
        if (xs.exists(!_.isNumber)) badType(name, a)
        if (xs.isEmpty) Null else num(xs.map(_.doubleValue).sum / xs.size)
      case "ceil" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isNumber) badType(name, a)
        num(math.ceil(a.doubleValue))
      case "floor" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isNumber) badType(name, a)
        num(math.floor(a.doubleValue))
      case "contains" =>
        arity(name, rawArgs, 2)
        val subject = evalArg(rawArgs(0))
        val search = evalArg(rawArgs(1))
        if (subject.isTextual) {
          if (!search.isTextual) badType(name, search)
          BooleanNode.valueOf(subject.asText.contains(search.asText))
        } else if (subject.isArray)
          BooleanNode.valueOf(subject.elements.asScala.exists(deepEq(_, search)))
        else badType(name, subject)
      case "ends_with" =>
        arity(name, rawArgs, 2)
        val (a, b) = (evalArg(rawArgs(0)), evalArg(rawArgs(1)))
        if (!a.isTextual || !b.isTextual) badType(name, if (a.isTextual) b else a)
        BooleanNode.valueOf(a.asText.endsWith(b.asText))
      case "starts_with" =>
        arity(name, rawArgs, 2)
        val (a, b) = (evalArg(rawArgs(0)), evalArg(rawArgs(1)))
        if (!a.isTextual || !b.isTextual) badType(name, if (a.isTextual) b else a)
        BooleanNode.valueOf(a.asText.startsWith(b.asText))
      case "join" =>
        arity(name, rawArgs, 2)
        val sep = evalArg(rawArgs(0))
        val arr = evalArg(rawArgs(1))
        if (!sep.isTextual) badType(name, sep)
        if (!arr.isArray) badType(name, arr)
        val xs = arr.elements.asScala.toSeq
        if (xs.exists(!_.isTextual)) badType(name, arr)
        TextNode.valueOf(xs.map(_.asText).mkString(sep.asText))
      case "keys" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isObject) badType(name, a)
        val out = F.arrayNode()
        a.fieldNames.asScala.foreach(k => out.add(TextNode.valueOf(k)))
        out
      case "values" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isObject) badType(name, a)
        val out = F.arrayNode()
        a.elements.asScala.foreach(out.add)
        out
      case "length" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (a.isTextual) num(a.asText.codePointCount(0, a.asText.length).toDouble)
        else if (a.isArray) num(a.size.toDouble)
        else if (a.isObject) num(a.size.toDouble)
        else badType(name, a)
      case "map" =>
        arity(name, rawArgs, 2)
        val e = expRef(rawArgs(0))
        val arr = evalArg(rawArgs(1))
        if (!arr.isArray) badType(name, arr)
        val out = F.arrayNode()
        // map keeps nulls (unlike projections)
        arr.elements.asScala.foreach(x => out.add(eval(e, x)))
        out
      case "max" | "min" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isArray) badType(name, a)
        val xs = a.elements.asScala.toSeq
        if (xs.isEmpty) Null
        else {
          val allNum = xs.forall(_.isNumber)
          val allStr = xs.forall(_.isTextual)
          if (!allNum && !allStr) badType(name, a)
          implicit val ord: Ordering[JsonNode] = keyOrdering(xs.head)
          if (name == "max") xs.max else xs.min
        }
      case "max_by" | "min_by" =>
        arity(name, rawArgs, 2)
        val arr = evalArg(rawArgs(0))
        val e = expRef(rawArgs(1))
        if (!arr.isArray) badType(name, arr)
        val xs = arr.elements.asScala.toSeq
        if (xs.isEmpty) Null
        else {
          val keys = xs.map(x => sortKey(e, x))
          implicit val ord: Ordering[JsonNode] = keyOrdering(keys.head)
          val pairs = xs.zip(keys)
          (if (name == "max_by") pairs.maxBy(_._2) else pairs.minBy(_._2))._1
        }
      case "sort_by" =>
        arity(name, rawArgs, 2)
        val arr = evalArg(rawArgs(0))
        val e = expRef(rawArgs(1))
        if (!arr.isArray) badType(name, arr)
        val xs = arr.elements.asScala.toSeq
        val out = F.arrayNode()
        if (xs.nonEmpty) {
          val keys = xs.map(x => sortKey(e, x))
          implicit val ord: Ordering[JsonNode] = keyOrdering(keys.head)
          xs.zip(keys).sortBy(_._2).foreach(p => out.add(p._1))
        }
        out
      case "merge" =>
        if (rawArgs.isEmpty) throw JmesPathError("merge: expected at least 1 argument")
        val out = F.objectNode()
        rawArgs.foreach { a =>
          val o = evalArg(a)
          if (!o.isObject) badType(name, o)
          o.properties.asScala.foreach(e => out.set[ObjectNode](e.getKey, e.getValue))
        }
        out
      case "not_null" =>
        if (rawArgs.isEmpty) throw JmesPathError("not_null: expected at least 1 argument")
        rawArgs.iterator.map(evalArg).find(!_.isNull).getOrElse(Null)
      case "reverse" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (a.isTextual) TextNode.valueOf(a.asText.reverse)
        else if (a.isArray) {
          val out = F.arrayNode()
          a.elements.asScala.toSeq.reverse.foreach(out.add)
          out
        } else badType(name, a)
      case "sort" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isArray) badType(name, a)
        val xs = a.elements.asScala.toSeq
        val out = F.arrayNode()
        if (xs.nonEmpty) {
          val allNum = xs.forall(_.isNumber)
          val allStr = xs.forall(_.isTextual)
          if (!allNum && !allStr) badType(name, a)
          implicit val ord: Ordering[JsonNode] = keyOrdering(xs.head)
          xs.sorted.foreach(out.add)
        }
        out
      case "sum" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (!a.isArray) badType(name, a)
        val xs = a.elements.asScala.toSeq
        if (xs.exists(!_.isNumber)) badType(name, a)
        num(xs.map(_.doubleValue).sum)
      case "to_array" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (a.isArray) a
        else if (a.isNull) Null
        else { val out = F.arrayNode(); out.add(a); out }
      case "to_number" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (a.isNumber) num(a.doubleValue)
        else if (a.isTextual)
          try num(a.asText.trim.toDouble) catch { case _: NumberFormatException => Null }
        else Null
      case "to_string" =>
        arity(name, rawArgs, 1)
        val a = evalArg(rawArgs.head)
        if (a.isTextual) a
        // non-integral doubles (integral ones materialize as longs in
        // [[num]]) render with json.Marshal's byte-exact float form —
        // Jackson's toString goes scientific at 1e7 where Go stays fixed
        else if (a.isDouble || a.isFloat)
          TextNode.valueOf(goJsonNumber(a.doubleValue))
        else TextNode.valueOf(a.toString)
      case "type" =>
        arity(name, rawArgs, 1)
        TextNode.valueOf(typeName(evalArg(rawArgs.head)))
      case other => throw JmesPathError(s"unknown function: $other")
    }
  }

  // -------------------------------------------------------------- API
  /** Compiled template, reusable across rows. Thread-safe (the AST is
    * immutable and evaluation carries no state). */
  final class Compiled private[JmesPath] (private[JmesPath] val ast: Ast) {
    /** Evaluate against a parsed payload; missing → null node. */
    def search(payload: JsonNode): JsonNode = {
      val r = eval(ast, if (payload == null) Null else payload)
      if (r == null) Null else r
    }
  }

  /** Parse a template. Throws [[JmesPathError]] on syntax errors. */
  def compile(template: String): Compiled =
    new Compiled(new Parser(lex(template)).parse())

  /** One-shot search (parse + eval). */
  def search(template: String, payload: JsonNode): JsonNode =
    compile(template).search(payload)
}
