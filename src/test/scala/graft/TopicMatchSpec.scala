package graft

import graft.functions.TopicMatch
import org.apache.spark.sql.functions._

class TopicMatchSpec extends GraftSuite {

  private val cases: Seq[(String, String, Boolean)] = Seq(
    // (pattern, topic, expected)
    ("*", "anything", true),
    ("*", "", true),
    ("user.created", "user.created", true),
    ("user.created", "user.createdX", false),
    ("user.*", "user.created", true),
    ("user.*", "user.", true),
    ("user.*", "user", false),
    ("*.created", "user.created", true),
    ("*.created", "created", false),
    ("u*r.*d", "user.created", true),
    ("u*r.*d", "user.updated", true),
    ("u*r.*d", "user.updates", false),
    ("a*b*c", "abc", true),
    ("a*b*c", "aXbYc", true),
    ("a*b*c", "aXcYb", false),
    ("**", "x", true),
    ("", "", true),
    ("", "x", false)
  )

  test("pure glob matcher") {
    cases.foreach { case (p, t, want) =>
      assert(TopicMatch.matchOne(p, t) == want, s"pattern=$p topic=$t")
    }
  }

  test("pattern-list semantics: empty topic matches all; any-of") {
    assert(TopicMatch.matches(Seq("a", "b"), ""))
    assert(TopicMatch.matches(Seq("a", "b"), null))
    assert(TopicMatch.matches(Seq("a", "b.*"), "b.x"))
    assert(!TopicMatch.matches(Seq("a", "b.*"), "c"))
    assert(TopicMatch.matches(Seq("*"), "whatever"))
  }

  test("normalize drops duplicates and wildcard-covered entries") {
    assert(TopicMatch.normalize(Seq("a", "a", "b")) == Seq("a", "b"))
    assert(TopicMatch.normalize(Seq("user.*", "user.created", "other")) == Seq("user.*", "other"))
    assert(TopicMatch.normalize(Seq("*", "x", "y")) == Seq("*"))
  }

  test("topic-set validation: reference test table ported verbatim (entities_test.go:13-125)") {
    val avail = Seq("user.created", "user.deleted", "user.updated")
    val cases = Seq(
      (Seq("user.created"), avail, false, true),
      (Seq("user.created", "user.updated"), avail, false, true),
      (Seq("user.*"), avail, false, false),
      (Seq("user.*"), avail, true, true),
      (Seq("order.*"), avail, true, false),
      (Seq("user.created", "order.*"), avail, true, false),
      (Seq("order.*"), Seq("order.created", "user.created"), true, true),
      (Seq("*"), avail, false, true),
      (Seq("*", "user.created"), avail, false, false),
      (Seq("user.invalid"), avail, false, false),
      (Seq("user.created", "user.invalid"), avail, false, false),
      (Seq(), avail, false, false),
      (Seq("any.topic"), Seq(), false, true),
      (Seq("any.topic", "another.topic"), Seq(), false, true),
      (Seq("*"), Seq(), false, true),
      (Seq("user.*"), Seq(), false, false),
      (Seq("user.*"), Seq(), true, true),
      (Seq(), Seq(), false, false))
    cases.foreach { case (topics, available, wild, expect) =>
      assert(TopicMatch.validate(topics, available, wild) == expect,
        s"topics=$topics available=$available allowWildcards=$wild")
    }
  }

  test("column form agrees with pure matcher") {
    val spark2 = spark
    import spark2.implicits._
    val topics = cases.map(_._2).distinct.filter(_ != null)
    val df = topics.toDF("topic")
    val patterns = Seq("user.*", "*.created", "a*b*c")
    val got = df.withColumn("m", TopicMatch.matchesExpr(col("topic"), patterns))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    topics.foreach { t =>
      assert(got(t) == TopicMatch.matches(patterns, t), s"topic=$t")
    }
  }
}
