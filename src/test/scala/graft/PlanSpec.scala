package graft

import graft.plans.JsonMatchExpr
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

  test("json_match filter stays inside WholeStageCodegen (real doGenCode)") {
    JsonMatchExpr.register(spark)
    val e = graft.core.Tables.events(spark, sf)
      .filter(expr("""json_match('{"k":{"$lt":30}}', props)"""))
    assert(countJsonMatchNodes(e) == 1)
    // the round-2 CodegenFallback marker pushed the Filter OUT of
    // WholeStageCodegen (an un-starred Filter node between codegen stages);
    // with real doGenCode the filter must be fused: no bare "Filter" line
    val phys = e.queryExecution.executedPlan.toString
    val bareFilter = phys.linesIterator.exists(l => l.trim.startsWith("Filter "))
    assert(!bareFilter, s"json_match filter fell out of WholeStageCodegen:\n$phys")
    assert(phys.contains("json_match"), phys)
  }

  test("json_match strict typing holds on the execution path") {
    JsonMatchExpr.register(spark)
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("""{"k":87}""", """{"k":12}""", """{"k":"50"}""", """{"x":1}""")
      .toDF("j")
    val got = df.filter(expr("""json_match('{"k":{"$gte":50}}', j)"""))
      .collect().map(_.getString(0)).toSet
    // reference operators.go:73-146: the string "50" never compares with 50
    assert(got == Set("""{"k":87}"""))
  }

  test("JsonMatchExpr evaluator path agrees with the pure evaluator") {
    JsonMatchExpr.register(spark)
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
}
