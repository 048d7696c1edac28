package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Topic-pattern matching: `*`-wildcard glob over topic strings.
  *
  * Reference: hookdeck/outpost `internal/models/entities.go:150-160`
  * (`MatchTopic`) and `:255-289` (`matchTopicPattern` — greedy backtracking
  * glob). Semantics:
  *   - `*` in a pattern matches any (possibly empty) run of characters
  *   - all other characters match literally
  *   - a pattern list matches if ANY pattern matches
  *   - the pattern list `["*"]` matches everything
  *   - an empty/absent event topic matches any pattern list
  *
  * Two forms: a pure matcher (used in the streaming fanout path and tests)
  * and a compile-to-regex `Column` form (`rlike`) that stays codegen'd —
  * preferred in distributed plans over a UDF.
  */
object TopicMatch {

  /** Pure backtracking glob: does `pattern` match `topic`? */
  def matchOne(pattern: String, topic: String): Boolean = {
    // classic two-pointer glob with single-star backtracking
    var p = 0; var t = 0
    var starP = -1; var starT = -1
    while (t < topic.length) {
      if (p < pattern.length && (pattern.charAt(p) == topic.charAt(t))) {
        p += 1; t += 1
      } else if (p < pattern.length && pattern.charAt(p) == '*') {
        starP = p; starT = t; p += 1
      } else if (starP >= 0) {
        p = starP + 1; starT += 1; t = starT
      } else return false
    }
    while (p < pattern.length && pattern.charAt(p) == '*') p += 1
    p == pattern.length
  }

  /** Pattern-list semantics (empty topic matches all). */
  def matches(patterns: Seq[String], topic: String): Boolean =
    topic == null || topic.isEmpty || patterns.exists(matchOne(_, topic))

  /** Normalize a topic set: drop duplicates and entries covered by a strictly
    * more general sibling wildcard pattern (reference `entities.go:213-244`). */
  def normalize(patterns: Seq[String]): Seq[String] = {
    val distinct = patterns.distinct
    distinct.filterNot { p =>
      distinct.exists(q => q != p && q.contains('*') && matchOne(q, p))
    }
  }

  /** The `["*"]` subscription (reference `entities.go:146-148`). */
  def matchesAll(patterns: Seq[String]): Boolean =
    patterns.length == 1 && patterns.head == "*"

  /** Subscription-set validation (reference `entities.go:162-197`
    * `Topics.Validate`): an empty set is invalid; `["*"]` alone is always
    * valid; against a configured available-topics list every entry must
    * be an available topic — or, when wildcards are allowed, a pattern
    * matching at least one available topic — and a bare `*` entry mixed
    * with others is rejected; with NO available list, exact topics pass
    * and wildcard patterns only when allowed. */
  def validate(patterns: Seq[String], availableTopics: Seq[String],
               allowWildcards: Boolean = false): Boolean = {
    if (patterns.isEmpty) return false
    if (matchesAll(patterns)) return true
    if (availableTopics.isEmpty)
      return allowWildcards || patterns.forall(!_.contains('*'))
    patterns.forall { p =>
      if (p == "*") false
      else if (p.contains('*'))
        allowWildcards && availableTopics.exists(matchOne(p, _))
      else availableTopics.contains(p)
    }
  }

  /** Compile one glob pattern to an anchored Java regex. */
  def toRegex(pattern: String): String =
    "^" + pattern.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*") + "$"

  /** Column predicate: does `topic` match any of `patterns`?
    * Pure `rlike` composition → codegen'd, no UDF. */
  def matchesExpr(topic: Column, patterns: Seq[String]): Column = {
    val anyPattern = patterns.foldLeft(lit(false)) { (acc, p) =>
      if (p == "*") lit(true) || acc
      else if (!p.contains('*')) acc || (topic === lit(p))
      else acc || topic.rlike(toRegex(p))
    }
    topic.isNull || (topic === lit("")) || anyPattern
  }
}
