package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Message partition-key extraction (reference: hookdeck/outpost
  * `internal/destregistry/partitionkey/partitionkey.go:11-40` — a JMESPath
  * expression over the delivery payload, falling back to the event id when
  * the expression is empty or evaluates to nothing).
  *
  * A FAST SUBSET — identifier paths with dots, array indexing, quoted
  * identifiers (`a.b`, `items[0].sku`, `"weird-key".id`), and the
  * `join('<sep>', [path, …])` form the reference's own test corpus
  * exercises — compiles to codegen'd `get_json_object` extraction.
  * Everything else the JMESPath spec allows (projections, flatten, pipes,
  * filters, multiselects, the builtin function library) evaluates through
  * the full [[JmesPath]] engine, matching the reference's use of the
  * complete go-jmespath library; only SYNTAX errors reject.
  *
  * Two forms:
  *   - [[evaluate]]: exact per-row evaluation with the reference's scalar
  *     rendering (Go `%g` for numbers — shortest round-trip digits,
  *     scientific when the exponent reaches the digit count);
  *   - [[column]]: codegen'd `get_json_object` fast path for analytical
  *     queries (string keys — the overwhelmingly common case).
  */
object PartitionKey {

  /** Parse the JMESPath subset into a JsonPath string for
    * `get_json_object` (`$.a.b[0]`), or None if out of subset. */
  def toJsonPath(template: String): Option[String] = {
    if (template == null || template.isEmpty) return None
    val Ident = """[A-Za-z_][A-Za-z0-9_]*""".r
    val sb = new StringBuilder("$")
    var i = 0
    val n = template.length
    var expectSegment = true
    while (i < n) {
      template.charAt(i) match {
        case '.' if !expectSegment => expectSegment = true; i += 1
        case '[' =>
          val close = template.indexOf(']', i)
          if (close < 0) return None
          val idx = template.substring(i + 1, close)
          if (!idx.forall(_.isDigit) || idx.isEmpty) return None
          sb.append('[').append(idx).append(']')
          i = close + 1
          expectSegment = false
        case '"' if expectSegment =>
          val close = template.indexOf('"', i + 1)
          if (close < 0) return None
          val name = template.substring(i + 1, close)
          if (name.isEmpty || name.exists(c => c == '.' || c == '[' || c == '\'')) return None
          sb.append("['").append(name).append("']")
          i = close + 1
          expectSegment = false
        case _ if expectSegment =>
          Ident.findPrefixOf(template.substring(i)) match {
            case Some(id) => sb.append('.').append(id); i += id.length; expectSegment = false
            case None => return None
          }
        case _ => return None
      }
    }
    if (expectSegment) None else Some(sb.toString)
  }

  /** `join('<sep>', [path, path, …])` — the one JMESPath FUNCTION the
    * reference's own test corpus exercises (`partitionkey_test.go` "join
    * expression"). Returns (separator, element path templates) or None. */
  def parseJoin(template: String): Option[(String, Seq[String])] = {
    val JoinRe = """^join\(\s*'([^']*)'\s*,\s*\[(.*)\]\s*\)$""".r
    template.trim match {
      case JoinRe(sep, inner) =>
        // element paths in the subset contain no commas (identifier paths
        // and quoted identifiers only), so a top-level split is exact
        val parts = inner.split(',').map(_.trim).toSeq
        if (parts.isEmpty || parts.exists(p => p.isEmpty || toJsonPath(p).isEmpty)) None
        else Some((sep, parts))
      case _ => None
    }
  }

  private def walkPath(payload: JsonNode, jsonPath: String): JsonNode = {
    var node = payload
    // walk segments after "$"
    val seg = """\.([A-Za-z_][A-Za-z0-9_]*)|\[(\d+)\]|\['([^']*)'\]""".r
    seg.findAllMatchIn(jsonPath.substring(1)).foreach { m =>
      if (node != null) {
        if (m.group(1) != null) node = node.get(m.group(1))
        else if (m.group(2) != null) node = node.get(m.group(2).toInt)
        else node = node.get(m.group(3))
      }
    }
    node
  }

  /** Exact evaluation over a parsed payload; mirrors partitionkey.go's
    * result rendering and fallback rules. Templates outside the fast
    * subset evaluate through the full [[JmesPath]] engine (the reference
    * links the complete go-jmespath library, so any spec-legal template is
    * a legal config); invalid SYNTAX throws, as in the reference — its
    * Kinesis caller catches and falls back (`destawskinesis.go:236-239`). */
  def evaluate(template: String, payload: JsonNode, fallbackKey: String): String = {
    if (template == null || template.isEmpty) return fallbackKey
    parseJoin(template) match {
      case Some((sep, parts)) =>
        // go-jmespath's join() requires an array of strings: a missing or
        // non-string element is an evaluation ERROR in the reference, not
        // a fallback — same contract here
        val vals = parts.map(p => walkPath(payload, toJsonPath(p).get))
        if (vals.exists(v => v == null || !v.isTextual))
          throw new IllegalArgumentException(
            s"join() element is not a string: $template")
        val joined = vals.map(_.asText).mkString(sep)
        return if (joined.isEmpty) fallbackKey else joined
      case None => ()
    }
    val node = toJsonPath(template) match {
      case Some(path) => walkPath(payload, path)
      case None =>
        try compiled(template).search(payload)
        catch {
          case e: JmesPath.JmesPathError =>
            throw new IllegalArgumentException(e.msg)
        }
    }
    if (node == null || node.isNull) fallbackKey
    else if (node.isTextual) { val s = node.asText; if (s.isEmpty) fallbackKey else s }
    else if (node.isNumber) goG(node.doubleValue)
    else if (node.isBoolean) node.asBoolean.toString
    else node.toString // objects/arrays: raw JSON, the %v analogue
  }

  // parse-once template cache (streaming sinks evaluate one template per
  // destination across every row of every micro-batch)
  private val templateCache =
    new java.util.concurrent.ConcurrentHashMap[String, JmesPath.Compiled]()
  private def compiled(template: String): JmesPath.Compiled =
    templateCache.computeIfAbsent(template, t => JmesPath.compile(t))

  /** String-payload form with the CALLER's error contract folded in: the
    * reference's one production call site treats any evaluation failure as
    * fallback-to-event-id (`destawskinesis.go:238-241`), and substitutes an
    * empty object for a nil parsed payload (`destawskinesis.go:231-233`).
    * So here: null/unparseable payload and runtime evaluation errors (e.g.
    * `abs(name)` on a string — spec-legal template, type error at eval) all
    * yield the fallback; nothing throws per row. */
  def evaluate(template: String, payloadJson: String, fallbackKey: String): String =
    try {
      val payload =
        if (payloadJson == null) JsonMatch.parse("{}")
        else JsonMatch.parse(payloadJson)
      evaluate(template, payload, fallbackKey)
    } catch { case scala.util.control.NonFatal(_) => fallbackKey }

  /** Go `%g` float rendering: shortest round-trip digits, fixed notation
    * unless the decimal exponent reaches the digit count or drops below -4
    * (strconv.FormatFloat(f, 'g', -1, 64) semantics). */
  def goG(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "+Inf" else "-Inf"
    if (d == 0.0) return if (1 / d < 0) "-0" else "0"
    val neg = d < 0
    val ad = math.abs(d)
    // shortest decimal digits (shared with JmesPath's json.Marshal form)
    val (sig, expAdj) = JmesPath.shortestDigits(ad)
    val nd = sig.length
    val sb = new StringBuilder(if (neg) "-" else "")
    // strconv/ftoa.go: shortest %g goes scientific iff exp < -4 || exp >= 6
    if (expAdj < -4 || expAdj >= 6) {
      // scientific: d.ddde±XX  (Go uses e+09 style, two-digit minimum)
      sb.append(sig.head)
      if (nd > 1) sb.append('.').append(sig.tail)
      sb.append('e').append(if (expAdj < 0) '-' else '+')
      val ae = math.abs(expAdj)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    } else if (expAdj >= nd - 1) {
      sb.append(sig).append("0" * (expAdj - nd + 1))
    } else if (expAdj >= 0) {
      sb.append(sig.substring(0, expAdj + 1)).append('.').append(sig.substring(expAdj + 1))
    } else {
      sb.append("0.").append("0" * (-expAdj - 1)).append(sig)
    }
    sb.toString
  }

  /** Column fast path: extract the key from a JSON payload column with the
    * event-id fallback. Subset templates compile to codegen'd
    * `get_json_object` (string-typed keys only — numbers come back in raw
    * JSON text form, not `%g`; use [[evaluate]] for exact parity).
    * `join(…)` templates render via `concat_ws`; a missing element — an
    * evaluation error in the reference — takes the fallback, matching what
    * the reference's Kinesis caller does with that error. Any other
    * spec-legal template runs the full [[JmesPath]] engine per row with
    * [[evaluate]]'s exact rendering; syntax errors throw HERE, at query
    * build, not per row. */
  def column(template: String, payloadCol: Column, fallbackCol: Column): Column =
    if (template == null || template.isEmpty) fallbackCol
    else parseJoin(template) match {
      case Some((sep, parts)) =>
        val cols = parts.map(p => get_json_object(payloadCol, toJsonPath(p).get))
        val anyMissing = cols.map(_.isNull).reduce(_ || _)
        val joined = concat_ws(sep, cols: _*)
        when(anyMissing || joined === "", fallbackCol).otherwise(joined)
      case None => toJsonPath(template) match {
        case Some(p) =>
          val extracted = get_json_object(payloadCol, p)
          when(extracted.isNull || extracted === "", fallbackCol).otherwise(extracted)
        case None =>
          JmesPath.compile(template) // validate now; fail at plan time
          val full = udf((payload: String, fb: String) =>
            evaluate(template, payload, fb))
          full(payloadCol, fallbackCol)
      }
    }
}
