package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The co-located-join story (SURVEY §4 physical design): bucketing both
  * fact tables on the join key at write time removes the join-time shuffle
  * entirely — at 100 TB that's the difference between a network-bound and a
  * local join. Asserted on the physical plan, not claimed. */
class BucketedJoinSpec extends GraftSuite {

  test("bucketed tables join without a shuffle exchange") {
    val spark2 = spark
    import spark2.implicits._
    // AQE wraps plans (hides exchanges from collect) and broadcast would
    // sidestep the comparison on tiny data — pin both off for the assertion
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val events = graft.core.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")

    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_users")
    // a failed prior run can leave the managed location behind
    Seq("b_events", "b_users").foreach { t =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(s"spark-warehouse/$t"))
    }
    events.write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("b_events")
    events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .write.bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("b_users")

    val joined = spark.table("b_events")
      .join(spark.table("b_users"), "user_id")
      .groupBy("event_type").agg(sum("n").as("total"))

    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    // one shuffle for the final groupBy(event_type) is expected;
    // the JOIN itself must not introduce any
    assert(shuffles.length <= 1,
      s"bucketed join must not shuffle its inputs:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() > 0)

    // un-bucketed baseline: the same join DOES shuffle both sides
    val flat = events.join(
      events.groupBy("user_id").agg(count(lit(1)).as("n")), "user_id")
      .groupBy("event_type").agg(sum("n").as("total"))
    val flatShuffles = flat.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(flatShuffles.length > 1, "baseline sanity: unbucketed join shuffles")

    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_users")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }
}
