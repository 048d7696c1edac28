package graft

import graft.functions.JsonMatch
import org.apache.spark.sql.functions._

/** Operator corpus in the spirit of the reference's generated suite
  * (simplejsonmatch): every operator, coercion corners, array-any semantics,
  * nesting, and $not composition. */
class JsonMatchSpec extends GraftSuite {

  private val doc =
    """{"id":"evt_1","topic":"order.created","time":"2026-01-02T03:04:05Z",
      |"metadata":{"source":"crm","priority":"high"},
      |"data":{"amount":150,"price":"42.5","active":true,"tags":["a","b"],
      |"user":{"id":7,"name":"Ada"},"items":[{"sku":"x1","qty":2},{"sku":"y2","qty":5}],
      |"nil":null}}""".stripMargin

  private val cases: Seq[(String, Boolean)] = Seq(
    // literal → $eq
    ("""{"topic":"order.created"}""", true),
    ("""{"topic":"order.updated"}""", false),
    // nested structural
    ("""{"data":{"amount":150}}""", true),
    ("""{"data":{"user":{"id":7}}}""", true),
    ("""{"data":{"user":{"id":8}}}""", false),
    // STRICT typing (reference operators.go:33-64): no string↔number or
    // bool↔string coercion
    ("""{"data":{"amount":"150"}}""", false),
    ("""{"data":{"price":42.5}}""", false),
    ("""{"data":{"price":"42.5"}}""", true),
    ("""{"data":{"active":"true"}}""", false),
    ("""{"data":{"active":true}}""", true),
    ("""{"data":{"active":false}}""", false),
    // $eq/$neq
    ("""{"data":{"amount":{"$eq":150}}}""", true),
    ("""{"data":{"amount":{"$neq":150}}}""", false),
    ("""{"data":{"amount":{"$neq":151}}}""", true),
    // comparisons: numbers numerically; a numeric string NEVER compares
    // with a number ($gt mixed types is unsupported → false); two strings
    // compare lexicographically
    ("""{"data":{"amount":{"$gt":100}}}""", true),
    ("""{"data":{"amount":{"$gt":150}}}""", false),
    ("""{"data":{"amount":{"$gte":150}}}""", true),
    ("""{"data":{"amount":{"$lt":200}}}""", true),
    ("""{"data":{"amount":{"$lte":149}}}""", false),
    ("""{"data":{"price":{"$gt":40}}}""", false),
    ("""{"data":{"price":{"$lt":"43"}}}""", true),
    // string comparisons
    ("""{"data":{"user":{"name":{"$gt":"Aa"}}}}""", true),
    ("""{"data":{"user":{"name":{"$lt":"Aa"}}}}""", false),
    // $in/$nin: array membership is type-strict; a string arg on a string
    // input is a SUBSTRING test (operators.go:164-171)
    ("""{"data":{"amount":{"$in":[100,150,200]}}}""", true),
    ("""{"data":{"amount":{"$in":["150"]}}}""", false),
    ("""{"data":{"amount":{"$in":[1,2]}}}""", false),
    ("""{"data":{"amount":{"$nin":[1,2]}}}""", true),
    ("""{"data":{"amount":{"$nin":[150]}}}""", false),
    ("""{"topic":{"$in":"der.cre"}}""", true),
    ("""{"topic":{"$nin":"der.cre"}}""", false),
    ("""{"topic":{"$in":"nope"}}""", false),
    // $startsWith/$endsWith
    ("""{"topic":{"$startsWith":"order."}}""", true),
    ("""{"topic":{"$endsWith":".created"}}""", true),
    ("""{"topic":{"$startsWith":"user."}}""", false),
    // array input: literal schema → any element; operator schema applies to
    // the WHOLE array ($in with array arg on array input is unsupported;
    // scalar arg is membership; $eq of an array literal is ordered equality)
    ("""{"data":{"tags":"a"}}""", true),
    ("""{"data":{"tags":"c"}}""", false),
    ("""{"data":{"tags":{"$in":["b","z"]}}}""", false),
    ("""{"data":{"tags":{"$in":"b"}}}""", true),
    ("""{"data":{"tags":{"$nin":"z"}}}""", true),
    ("""{"data":{"tags":{"$eq":["a","b"]}}}""", true),
    ("""{"data":{"tags":{"$eq":["b","a"]}}}""", false),
    ("""{"data":{"tags":["b"]}}""", true),
    ("""{"data":{"tags":["a","b"]}}""", true),
    ("""{"data":{"tags":["a","z"]}}""", false),
    // structural match against array of objects (any element)
    ("""{"data":{"items":{"sku":"y2"}}}""", true),
    ("""{"data":{"items":{"sku":"z9"}}}""", false),
    ("""{"data":{"items":{"qty":{"$gte":5}}}}""", true),
    ("""{"data":{"items":{"qty":{"$gt":5}}}}""", false),
    // $exist
    ("""{"data":{"amount":{"$exist":true}}}""", true),
    ("""{"data":{"missing":{"$exist":false}}}""", true),
    ("""{"data":{"missing":{"$exist":true}}}""", false),
    ("""{"data":{"amount":{"$exist":false}}}""", false),
    // $or/$and/$not
    ("""{"$or":[{"topic":"order.created"},{"topic":"nope"}]}""", true),
    ("""{"$or":[{"topic":"a"},{"topic":"b"}]}""", false),
    ("""{"$and":[{"topic":{"$startsWith":"order"}},{"data":{"amount":{"$gt":100}}}]}""", true),
    ("""{"$and":[{"topic":{"$startsWith":"order"}},{"data":{"amount":{"$gt":999}}}]}""", false),
    ("""{"$not":{"topic":"order.created"}}""", false),
    ("""{"$not":{"topic":"nope"}}""", true),
    // value-level {$not: ...} on a PRIMITIVE value never matches — $not is
    // only consumed at the top of a schema object whose input is an object
    // (match.go:19-36 vs 220-221); this mirrors the reference exactly
    ("""{"data":{"amount":{"$not":{"$gt":200}}}}""", false),
    ("""{"data":{"$not":{"amount":9}}}""", true),
    ("""{"data":{"$not":{"amount":150}}}""", false),
    // multiple operators AND together
    ("""{"data":{"amount":{"$gt":100,"$lt":200}}}""", true),
    ("""{"data":{"amount":{"$gt":100,"$lt":150}}}""", false),
    // multiple top-level keys AND together
    ("""{"topic":"order.created","data":{"amount":150}}""", true),
    ("""{"topic":"order.created","data":{"amount":1}}""", false),
    // metadata map
    ("""{"metadata":{"source":"crm"}}""", true),
    ("""{"metadata":{"source":"erp"}}""", false),
    // null handling
    ("""{"data":{"nil":{"$exist":true}}}""", true),
    ("""{"data":{"nil":5}}""", false),
    ("""{"data":{"nil":null}}""", true),
    ("""{"data":{"nil":{"$eq":null}}}""", true),
    ("""{"data":{"nil":{"$neq":null}}}""", false),
    // MISSING key fails its condition even under $neq/$nin (match.go:87-100)
    ("""{"data":{"missing":{"$neq":"x"}}}""", false),
    ("""{"data":{"missing":{"$nin":[1]}}}""", false),
    ("""{"missing":"x"}""", false),
    // unknown operator never matches (incl. unimplemented $ref)
    ("""{"data":{"amount":{"$ref":"#/x"}}}""", false)
  )

  test(s"evaluator corpus (${cases.size} cases)") {
    cases.foreach { case (schema, want) =>
      assert(JsonMatch.matches(schema, doc) == want, s"schema=$schema")
    }
  }

  test("malformed inputs fail closed") {
    assert(!JsonMatch.matches("""{"a":1}""", """not json"""))
    assert(!JsonMatch.matches("""not json""", """{"a":1}"""))
  }

  private def exprCol(schema: String) = {
    graft.plans.JsonMatchExpr.register(spark)
    call_function("json_match", lit(schema), col("j"))
  }

  test("expression form agrees with the evaluator on simple schemas") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      """{"k":87,"s":"hello","t":"order.created"}""",
      """{"k":12,"s":"world","t":"user.created"}""",
      """{"k":50,"s":"hey","t":"order.x"}""",
      """{"s":"no-k","t":"order.y"}""")
    val df = docs.toDF("j")
    val schemas = Seq(
      """{"k":{"$gte":50}}""",
      """{"k":87}""",
      """{"s":{"$startsWith":"he"}}""",
      """{"t":{"$endsWith":".created"},"k":{"$lt":100}}""",
      """{"$or":[{"k":87},{"s":"no-k"}]}""",
      """{"k":{"$in":[12,50]}}""")
    schemas.foreach { sc =>
      val got = df.withColumn("m", exprCol(sc)).collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      docs.foreach { d =>
        assert(got(d) == JsonMatch.matches(sc, d), s"schema=$sc doc=$d")
      }
    }
  }

  test("execution path is typed-EXACT (strict primitive typing)") {
    val spark2 = spark
    import spark2.implicits._
    // reference strict typing (operators.go:33-64): a numeric string never
    // compares with a number, a boolean string never equals a boolean
    val sc = """{"k":{"$gte":50}}"""
    val docs = Seq("""{"k":"50"}""", """{"k":50}""", """{"k":49}""", """{"k":true}""")
    val got = docs.toDF("j").withColumn("m", exprCol(sc)).collect().map(_.getBoolean(1)).toSeq
    assert(got == Seq(false, true, false, false))
    val bd = Seq("""{"ok":true}""", """{"ok":"true"}""", """{"ok":false}""")
    val gb = bd.toDF("j").withColumn("m", exprCol("""{"ok":true}""")).collect()
      .map(_.getBoolean(1)).toSeq
    assert(gb == Seq(true, false, false))
  }

  test("execution path: structural match through arrays of objects (any-element)") {
    val spark2 = spark
    import spark2.implicits._
    // the round-2 lowered-path divergence class (match.go:139-184): one
    // engine since round 3, exact on the execution path by construction
    val sc = """{"items":{"qty":{"$gte":5}}}"""
    val docs = Seq(
      """{"items":[{"qty":2},{"qty":9}]}""", // any element
      """{"items":[{"qty":2}]}""",
      """{"items":{"qty":7}}""",
      """{"items":5}""")
    val got = docs.toDF("j").withColumn("m", exprCol(sc)).collect().map(_.getBoolean(1)).toSeq
    assert(got == Seq(true, false, true, false))
    docs.zip(got).foreach { case (d, g) => assert(JsonMatch.matches(sc, d) == g, d) }
  }

  test("$neq on a missing key fails in both evaluator and expression form") {
    val spark2 = spark
    import spark2.implicits._
    val sc = """{"type":{"$neq":"created"}}"""
    assert(!JsonMatch.matches(sc, """{}"""))
    assert(JsonMatch.matches(sc, """{"type":"updated"}"""))
    val rows = Seq("""{}""", """{"type":"updated"}""", """{"type":"created"}""")
      .toDF("j").withColumn("m", exprCol(sc)).collect().map(_.getBoolean(1)).toSeq
    assert(rows == Seq(false, true, false))
  }
}
