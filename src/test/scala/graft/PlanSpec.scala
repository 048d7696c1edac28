package graft

import graft.plans.{JsonMatchExpr, LowerJsonMatch}
import org.apache.spark.sql.functions._

class PlanSpec extends GraftSuite {

  private def countJsonMatchNodes(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: JsonMatchExpr => n += 1
      case _ => ()
    }))
    n
  }

  test("LowerJsonMatch rewrites compilable schemas out of the plan") {
    LowerJsonMatch.install(spark)
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("""{"k":87}""", """{"k":12}""", """{"k":"50"}""", """{"x":1}""")
      .toDF("j")
    val lowered = df.filter(expr("""json_match('{"k":{"$gte":50}}', j)"""))
    assert(countJsonMatchNodes(lowered) == 0, "simple schema must be lowered")
    // strict typing (reference operators.go:73-146): the string "50" never
    // compares with the number 50, so only {"k":87} matches. (This local
    // relation is constant-folded through the evaluator; the lossy lowered
    // form on real scans is pinned separately in JsonMatchSpec.)
    assert(lowered.collect().map(_.getString(0)).toSet == Set("""{"k":87}"""))

    // local relations get folded whole; assert on a parquet-backed plan
    val kept = graft.core.Tables.events(spark, sf)
      .filter(expr("""json_match('{"$or":[{"k":1}]}', props)"""))
    assert(countJsonMatchNodes(kept) == 1, "$or schema must keep the evaluator")
  }

  test("JsonMatchExpr evaluator path agrees with the pure evaluator") {
    LowerJsonMatch.install(spark)
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq("""{"k":87,"s":"ab"}""", """{"k":3}""", """not json""", """{"s":"zz"}""")
    val schema = """{"$or":[{"k":{"$gte":50}},{"s":{"$startsWith":"z"}}]}"""
    val got = docs.toDF("j")
      .withColumn("m", expr(s"json_match('$schema', j)"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    docs.foreach { d =>
      assert(got(d) == graft.functions.JsonMatch.matches(schema, d), d)
    }
  }

  test("lowered predicate pushes get_json_object conjuncts through the plan") {
    LowerJsonMatch.install(spark)
    val e = graft.core.Tables.events(spark, sf)
      .filter(expr("""json_match('{"k":{"$lt":30}}', props)"""))
    // the optimized plan must contain a plain Filter with get_json_object
    val s = e.queryExecution.optimizedPlan.toString
    assert(s.contains("get_json_object"), s)
    assert(!s.contains("json_match"), s)
  }
}
