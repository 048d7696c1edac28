package graft

import java.sql.Timestamp
import java.time.Instant
import graft.operators.{Keyset, ListQuery, Logstore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Port of the reference CRUD + misc drivertest inventory
  * (`internal/logstore/drivertest/crud.go`, `misc.go`) against the parquet
  * log store: insert/verify, in-batch dedup, list filters, retrieves,
  * tenant isolation, cross-tenant queries, inclusive time boundaries,
  * idempotent duplicate inserts (read-side dedup), malformed cursors.
  */
class LogstoreCrudSpec extends GraftSuite {

  import ListQuery.{Gte, Lte, Request}

  private val base = Instant.parse("2024-03-10T12:00:00Z")
  private def at(minBack: Long): Timestamp =
    Timestamp.from(base.minusSeconds(minBack * 60))

  private val topics = Seq("user.created", "user.updated", "user.deleted")
  private val dests = Seq("dest_a", "dest_b", "dest_c")

  private def entry(i: Int, tenant: String = "t1",
                    id: String = null, metadata: Map[String, String] = Map("k" -> "v")) = {
    val eid = Option(id).getOrElse(f"batch_evt_$i%02d")
    (f"batch_del_$i%02d", eid, tenant, dests(i % 3), topics(i % 3),
      if (i % 2 == 1) "failed" else "success", "200",
      at(i + 1), at(i + 1), metadata, """{"x":1}""")
  }

  private def toDf(rows: Seq[(String, String, String, String, String, String,
      String, Timestamp, Timestamp, Map[String, String], String)]): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    rows.toDF("attempt_id", "event_id", "tenant_id", "destination_id",
      "topic", "status", "code", "ts", "event_time", "metadata", "data")
  }

  private def freshStore(): String =
    java.nio.file.Files.createTempDirectory("graft_crud").toString + "/log"

  private def listAttempts(path: String, req: Request): Keyset.Page =
    ListQuery.list(Logstore.scan(spark, path), req, "att", "ts", "attempt_id")

  test("insert and verify: single delivery via list-by-event-id and retrieve") {
    val path = freshStore()
    Logstore.insertMany(toDf(Seq(entry(0, id = "single_evt"))), path, "attempt_id", "ts")
    val p = listAttempts(path, Request(
      inFilters = Map("tenant_id" -> Seq("t1"), "event_id" -> Seq("single_evt")),
      timeFilters = Seq(Gte -> base.minusSeconds(3600)), limit = 10))
    assert(p.rows.size == 1)
    assert(p.rows.head.getAs[String]("event_id") == "single_evt")
    assert(p.rows.head.getAs[String]("status") == "success")
    val r = ListQuery.retrieve(
      Logstore.scan(spark, path).filter(col("tenant_id") === "t1"),
      "event_id", "single_evt")
    assert(r.isDefined && r.get.getAs[String]("event_id") == "single_evt")
  }

  private lazy val batchPath: String = {
    val path = freshStore()
    Logstore.insertMany(toDf((0 until 15).map(i => entry(i))), path, "attempt_id", "ts")
    path
  }

  test("batch insert: all 15 rows land") {
    val p = listAttempts(batchPath, Request(
      inFilters = Map("tenant_id" -> Seq("t1")), limit = 100))
    assert(p.rows.size == 15)
  }

  test("empty batch is a no-op") {
    val path = freshStore()
    Logstore.insertMany(toDf(Seq(entry(0))), path, "attempt_id", "ts")
    Logstore.insertMany(toDf(Nil), path, "attempt_id", "ts")
    assert(Logstore.scan(spark, path).count() == 1)
  }

  test("null metadata persists as empty map, not a read error") {
    val path = freshStore()
    Logstore.insertMany(
      toDf(Seq(entry(0, metadata = null))).withColumn("metadata",
        coalesce(col("metadata"),
          map().cast("map<string,string>"))),
      path, "attempt_id", "ts")
    val m = Logstore.scan(spark, path).head().getAs[Map[String, String]]("metadata")
    assert(m != null && m.isEmpty)
  }

  test("duplicate entries within a batch collapse to one row") {
    val path = freshStore()
    Logstore.insertMany(toDf(Seq(entry(1), entry(1), entry(1))), path, "attempt_id", "ts")
    assert(Logstore.scan(spark, path).count() == 1)
  }

  test("concurrent duplicate inserts are idempotent through scanLatest") {
    val path = freshStore()
    val batch = toDf((0 until 5).map(i => entry(i)))
    Logstore.insertMany(batch, path, "attempt_id", "ts") // writer A
    Logstore.insertMany(batch, path, "attempt_id", "ts") // redelivered batch
    assert(Logstore.scan(spark, path).count() == 10, "raw store holds both appends")
    assert(Logstore.scanLatest(spark, path, "attempt_id", "ts").count() == 5,
      "read-side dedup restores exactly-once semantics")
  }

  // ─── list filters (crud.go:257-368) ──────────────────────────────────

  test("ListEvent by destination: single and multiple") {
    val one = listAttempts(batchPath, Request(
      inFilters = Map("tenant_id" -> Seq("t1"), "destination_id" -> Seq("dest_a")),
      limit = 100))
    assert(one.rows.size == 5)
    assert(one.rows.forall(_.getAs[String]("destination_id") == "dest_a"))
    val two = listAttempts(batchPath, Request(
      inFilters = Map("tenant_id" -> Seq("t1"),
        "destination_id" -> Seq("dest_a", "dest_b")), limit = 100))
    assert(two.rows.size == 10)
  }

  test("list by topic, status, and event id") {
    val t = listAttempts(batchPath, Request(
      inFilters = Map("topic" -> Seq(topics.head)), limit = 100))
    assert(t.rows.size == 5 && t.rows.forall(_.getAs[String]("topic") == topics.head))
    val s = listAttempts(batchPath, Request(
      inFilters = Map("status" -> Seq("failed")), limit = 100))
    assert(s.rows.size == 7)
    val e = listAttempts(batchPath, Request(
      inFilters = Map("event_id" -> Seq("batch_evt_03")), limit = 100))
    assert(e.rows.size == 1 && e.rows.head.getAs[String]("attempt_id") == "batch_del_03")
  }

  test("list by time range") {
    // entries i=0..14 at base-(i+1)min: [base-5min, base-1min] holds i=0..4
    val p = listAttempts(batchPath, Request(
      timeFilters = Seq(Gte -> base.minusSeconds(300), Lte -> base.minusSeconds(60)),
      limit = 100))
    assert(p.rows.map(_.getAs[String]("attempt_id")).toSet ==
      (0 until 5).map(i => f"batch_del_$i%02d").toSet)
  }

  // ─── retrieve (crud.go:369-430) ──────────────────────────────────────

  test("retrieve: non-existent and wrong tenant return None") {
    val scoped = Logstore.scan(spark, batchPath)
    assert(ListQuery.retrieve(scoped.filter(col("tenant_id") === "t1"),
      "event_id", "no_such_event").isEmpty)
    assert(ListQuery.retrieve(scoped.filter(col("tenant_id") === "t_other"),
      "event_id", "batch_evt_03").isEmpty)
    assert(ListQuery.retrieve(scoped.filter(col("tenant_id") === "t1"),
      "attempt_id", "batch_del_03").isDefined)
  }

  // ─── misc.go: isolation, cross-tenant, boundaries, cursors ───────────

  private lazy val twoTenantPath: String = {
    val path = freshStore()
    Logstore.insertMany(toDf(
      (0 until 4).map(i => entry(i)) ++
        (4 until 8).map(i => entry(i, tenant = "t2"))), path, "attempt_id", "ts")
    path
  }

  test("tenant isolation: list and retrieve see only their tenant") {
    val p1 = listAttempts(twoTenantPath, Request(
      inFilters = Map("tenant_id" -> Seq("t1")), limit = 100))
    assert(p1.rows.size == 4 && p1.rows.forall(_.getAs[String]("tenant_id") == "t1"))
    // t2's attempt invisible through t1's scope
    assert(ListQuery.retrieve(
      Logstore.scan(spark, twoTenantPath).filter(col("tenant_id") === "t1"),
      "attempt_id", "batch_del_05").isEmpty)
  }

  test("cross-tenant queries: empty tenant filter returns all tenants") {
    val p = listAttempts(twoTenantPath, Request(limit = 100))
    assert(p.rows.size == 8)
    assert(p.rows.map(_.getAs[String]("tenant_id")).toSet == Set("t1", "t2"))
    assert(ListQuery.retrieve(Logstore.scan(spark, twoTenantPath),
      "attempt_id", "batch_del_05").isDefined)
  }

  test("time boundaries: GTE and LTE are inclusive") {
    // entry 2 sits exactly at base-3min
    val exact = base.minusSeconds(180)
    val gte = listAttempts(batchPath, Request(
      timeFilters = Seq(Gte -> exact), limit = 100))
    assert(gte.rows.map(_.getAs[String]("attempt_id")).toSet ==
      (0 to 2).map(i => f"batch_del_$i%02d").toSet, "GTE includes the exact row")
    val lte = listAttempts(batchPath, Request(
      timeFilters = Seq(Lte -> exact), limit = 100))
    assert(lte.rows.map(_.getAs[String]("attempt_id")).toSet ==
      (2 until 15).map(i => f"batch_del_$i%02d").toSet, "LTE includes the exact row")
  }

  test("compaction: many small appends collapse to one sorted, deduped file per month") {
    val path = freshStore()
    // 6 separate appends (6+ files), incl. a redelivered duplicate batch
    (0 until 5).foreach(i => Logstore.insertMany(toDf(Seq(entry(i))), path, "attempt_id", "ts"))
    Logstore.insertMany(toDf(Seq(entry(0))), path, "attempt_id", "ts") // dup of att 00
    val month = "2024-03"
    def files(): Int = Option(new java.io.File(path, s"month=$month").listFiles())
      .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert(files() >= 6)
    assert(Logstore.scan(spark, path).count() == 6, "raw store holds the duplicate")
    Logstore.compactMonth(spark, path, month, "attempt_id", "ts")
    assert(files() == 1, "one file after compaction")
    val rows = Logstore.scan(spark, path)
    assert(rows.count() == 5, "compaction applies read-side dedup")
    // entries sit at base-(i+1)min, so time order is att_04 .. att_00
    val ids = rows.orderBy(col("ts"), col("attempt_id"))
      .select("attempt_id").collect().map(_.getString(0)).toSeq
    assert(ids == (4 to 0 by -1).map(i => f"batch_del_$i%02d"))
    // compacting a non-existent month is a no-op
    Logstore.compactMonth(spark, path, "1999-01", "attempt_id", "ts")
  }

  test("malformed cursors fail with a client error") {
    for (bad <- Seq("not_a_cursor", "attv01:!!!", "")) {
      if (bad.nonEmpty)
        intercept[IllegalArgumentException] {
          listAttempts(batchPath, Request(limit = 10, next = Some(bad)))
        }
    }
    // a cursor minted for events must not decode for attempts
    val evCur = graft.core.Cursor.encode("evt", graft.core.Cursor.Key(1000L, "x"))
    intercept[IllegalArgumentException] {
      listAttempts(batchPath, Request(limit = 10, next = Some(evCur)))
    }
  }
}
