package graft

import graft.operators.{CommitLog, JoinView, Scd2}
import org.apache.spark.sql.functions._

/** Maintenance-operator contracts the gates can't see: replay idempotency,
  * cursor behavior on no-op ranges, all-unchanged SCD2 batches, and
  * view-equals-recompute at every step (not just the final one). */
class JoinViewScd2Spec extends GraftSuite {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-03-$d%02d 00:00:00")

  test("join view equals a from-scratch join after EVERY refresh, and replays no-op") {
    val spark2 = spark
    import spark2.implicits._
    val base = tmp("graft_jv_spec")
    val (lt, rt, vt) = (s"$base/l", s"$base/r", s"$base/v")
    val spec = JoinView.Spec("k", "k", Seq("l_id", "k", "ts", "name"), "ts")

    def recompute(): Set[(Long, Long, String)] =
      CommitLog.scan(spark, lt).join(CommitLog.scan(spark, rt)
          .select(col("k"), col("name")), Seq("k"))
        .select(col("l_id"), col("k"), col("name"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    def view(): Set[(Long, Long, String)] =
      JoinView.readView(spark, vt)
        .select(col("l_id"), col("k"), col("name"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    CommitLog.append((1 to 20).map(i => (i.toLong, (i % 4).toLong, ts(1)))
      .toDF("l_id", "k", "ts"), lt, idCol = "l_id", tsCol = "ts")
    CommitLog.append((0 to 3).map(i => (i.toLong, s"n$i", ts(1)))
      .toDF("k", "name", "r_ts"), rt, idCol = "k", tsCol = "r_ts")
    JoinView.refresh(spark, lt, rt, vt, spec)
    assert(view() == recompute())

    // right-side delta alone
    CommitLog.append(Seq((4L, "n4", ts(2))).toDF("k", "name", "r_ts"),
      rt, idCol = "k", tsCol = "r_ts")
    // left rows arriving for the new right key, same refresh range
    CommitLog.append((21 to 25).map(i => (i.toLong, (i % 5).toLong, ts(2)))
      .toDF("l_id", "k", "ts"), lt, idCol = "l_id", tsCol = "ts")
    JoinView.refresh(spark, lt, rt, vt, spec)
    assert(view() == recompute())

    // row-level delete on the left propagates as signed removals
    CommitLog.deleteWhere(spark, lt, col("l_id") <= 5, idCol = "l_id", tsCol = "ts")
    JoinView.refresh(spark, lt, rt, vt, spec)
    assert(view() == recompute())
    assert(!view().exists(_._1 <= 5))

    // replay with unchanged heads: version must not move
    val v0 = CommitLog.snapshot(vt).version
    JoinView.refresh(spark, lt, rt, vt, spec)
    assert(CommitLog.snapshot(vt).version == v0, "no-op refresh committed")

    // compaction-only range: cursor advances via a data-less commit, view
    // content untouched
    val before = view()
    CommitLog.compactMonth(spark, lt, "2024-03", idCol = "l_id", tsCol = "ts")
    JoinView.refresh(spark, lt, rt, vt, spec)
    assert(view() == before)
    assert(JoinView.synced(vt)._1 == CommitLog.snapshot(lt).version,
      "cursor did not advance over a compaction")
  }

  test("join view: racing refreshers apply the delta exactly once (OCC)") {
    val spark2 = spark
    import spark2.implicits._
    val base = tmp("graft_jv_race")
    val (lt, rt, vt) = (s"$base/l", s"$base/r", s"$base/v")
    val spec = JoinView.Spec("k", "k", Seq("l_id", "k", "ts", "name"), "ts")
    CommitLog.append((0 to 4).map(i => (i.toLong, s"n$i", ts(1)))
      .toDF("k", "name", "r_ts"), rt, idCol = "k", tsCol = "r_ts")
    CommitLog.append((1 to 50).map(i => (i.toLong, (i % 5).toLong, ts(1)))
      .toDF("l_id", "k", "ts"), lt, idCol = "l_id", tsCol = "ts")
    JoinView.refresh(spark, lt, rt, vt, spec)
    CommitLog.append((51 to 80).map(i => (i.toLong, (i % 5).toLong, ts(2)))
      .toDF("l_id", "k", "ts"), lt, idCol = "l_id", tsCol = "ts")

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val racers = (1 to 4).map(_ => Future(JoinView.refresh(spark, lt, rt, vt, spec)))
    racers.foreach(Await.result(_, 120.seconds))

    val got = JoinView.readView(spark, vt).select(col("l_id")).as[Long]
      .collect().sorted.toSeq
    assert(got == (1L to 80L), // exactly-once: no double rows, none lost
      s"racing refreshers corrupted the view: ${got.take(10)}... n=${got.size}")
    assert(JoinView.synced(vt) ==
      (CommitLog.snapshot(lt).version, CommitLog.snapshot(rt).version))
  }

  test("streaming join-view intake: epochs drain into the view, a replayed " +
      "epoch no-ops, and the view matches a one-shot recompute") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmp("graft_jv_stream")
    val (lt, rt, vt) = (s"$base/l", s"$base/r", s"$base/v")
    val spec = JoinView.Spec("k", "k", Seq("l_id", "k", "ts", "name"), "ts")
    CommitLog.append((0 to 4).map(i => (i.toLong, s"n$i", ts(1)))
      .toDF("k", "name", "r_ts"), rt, idCol = "k", tsCol = "r_ts")

    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long)]
    val q = graft.streaming.ViewStream.joinViewIntake(
      mem.toDF().toDF("l_id", "k").withColumn("ts", lit(ts(1))),
      lt, rt, vt, spec, idCol = "l_id", checkpoint = s"$base/chk")
    try {
      mem.addData((1L to 40L).map(i => (i, i % 5)))
      q.processAllAvailable()
      // dimension grows BETWEEN epochs: the next epoch's refresh must pick
      // up the right-side delta too
      CommitLog.append(Seq((5L, "n5", ts(2))).toDF("k", "name", "r_ts"),
        rt, idCol = "k", tsCol = "r_ts")
      mem.addData((41L to 60L).map(i => (i, i % 6)))
      q.processAllAvailable()
    } finally q.stop()

    val got = JoinView.readView(spark, vt)
      .select(col("l_id"), col("k"), col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = CommitLog.scan(spark, lt)
      .join(CommitLog.scan(spark, rt).select(col("k"), col("name")), Seq("k"))
      .select(col("l_id"), col("k"), col("name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
    assert(got.size == 60, s"expected every fact row joined, got ${got.size}")

    // replayed epoch straight at the batch helper: both halves must no-op
    val (lv, vv) = (CommitLog.snapshot(lt).version, CommitLog.snapshot(vt).version)
    graft.streaming.ViewStream.joinViewBatch(
      Seq((41L, 5L)).toDF("l_id", "k").withColumn("ts", lit(ts(1))),
      1L, lt, rt, vt, spec, idCol = "l_id")
    assert(CommitLog.snapshot(lt).version == lv, "replayed epoch re-appended")
    assert(CommitLog.snapshot(vt).version == vv, "replayed epoch moved the view")
  }

  test("streaming scd2 intake: epochs version the dimension; no-change epochs write nothing") {
    val spark2 = spark
    import spark2.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = tmp("graft_scd2_stream")
    val table = s"$base/dim"
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = graft.streaming.ViewStream.scd2Intake(
      mem.toDF().toDF("k", "ts", "attr"), table, "k", "ts", s"$base/chk")
    try {
      mem.addData(Seq((1L, ts(1), "a"), (2L, ts(1), "b")))
      q.processAllAvailable()
      val v1 = CommitLog.snapshot(table).version
      mem.addData(Seq((1L, ts(2), "a"), (2L, ts(2), "b"))) // all unchanged
      q.processAllAvailable()
      assert(CommitLog.snapshot(table).version == v1,
        "no-change epoch committed")
      mem.addData(Seq((1L, ts(3), "a2"), (3L, ts(3), "c"))) // change + new key
      q.processAllAvailable()
    } finally q.stop()
    val h = Scd2.readHistory(spark, table)
      .select(col("k"), col("attr"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(h == Set((1L, "a", false), (1L, "a2", true),
      (2L, "b", true), (3L, "c", true)), s"history mismatch: $h")
  }

  test("scd2: change hash is column-order stable and keeps nulls") {
    val spark2 = spark
    import spark2.implicits._
    val table = tmp("graft_scd2_ord") + "/dim"
    val b1 = Seq((1L, ts(1), "x", null.asInstanceOf[String]),
      (2L, ts(1), "y", "z")).toDF("k", "ts", "attr_a", "attr_b")
    Scd2.applyBatch(spark, b1, table, "k", "ts", token = Some("o1"))
    val v1 = CommitLog.snapshot(table).version

    // same attribute VALUES, columns presented in the opposite order (and
    // one null in play): must hash identically -> no commit, no versions
    val b2 = Seq((1L, ts(2), null.asInstanceOf[String], "x"),
      (2L, ts(2), "z", "y")).toDF("k", "ts", "attr_b", "attr_a")
    Scd2.applyBatch(spark, b2, table, "k", "ts", token = Some("o2"))
    assert(CommitLog.snapshot(table).version == v1,
      "reordered-column batch opened spurious versions")
    assert(Scd2.readHistory(spark, table).count() == 2)

    // a REAL change that only swaps which attribute is null must be seen
    val b3 = Seq((1L, ts(3), "x", null.asInstanceOf[String]))
      .toDF("k", "ts", "attr_b", "attr_a")
    Scd2.applyBatch(spark, b3, table, "k", "ts", token = Some("o3"))
    val h = Scd2.readHistory(spark, table).filter(col("k") === 1L)
      .select(col("attr_a"), col("attr_b"), col("is_current"))
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getBoolean(2))).toSet
    assert(h == Set((Some("x"), None, false), (None, Some("x"), true)),
      s"null-swap change not versioned: $h")
  }

  test("scd2: migrateHashes repairs pre-upgrade _h once; unchanged batches " +
      "then write nothing instead of opening spurious versions") {
    val spark2 = spark
    import spark2.implicits._
    val table = tmp("graft_scd2_mig") + "/dim"
    val b1 = Seq((1L, ts(1), "x", null.asInstanceOf[String]),
      (2L, ts(1), "y", "z")).toDF("k", "ts", "attr_a", "attr_b")
    Scd2.applyBatch(spark, b1, table, "k", "ts", token = Some("m1"))

    // regress the stored rows to the OLD hash format: unsorted column
    // order + to_json's default null-dropping — what a pre-upgrade
    // applyBatch would have persisted
    val snap = CommitLog.snapshot(table)
    val old = Scd2.readHistory(spark, table)
      .withColumn("_h", md5(to_json(struct(col("attr_b"), col("attr_a")))))
    CommitLog.replaceFiles(old, table, "valid_from",
      removes = snap.files.map(_.path),
      sortCols = Seq("valid_from", "_vid"))

    // both rows carry a stale hash (order for k=2, dropped null for k=1)
    assert(Scd2.migrateHashes(spark, table, "k") == 2L)
    // idempotent: nothing left to repair, no commit
    val v = CommitLog.snapshot(table).version
    assert(Scd2.migrateHashes(spark, table, "k") == 0L)
    assert(CommitLog.snapshot(table).version == v)

    // the migration's point: an all-unchanged post-upgrade batch is a
    // no-op again (pre-migration it would re-version every key)
    val same = Seq((1L, ts(2), "x", null.asInstanceOf[String]),
      (2L, ts(2), "y", "z")).toDF("k", "ts", "attr_a", "attr_b")
    Scd2.applyBatch(spark, same, table, "k", "ts", token = Some("m2"))
    assert(CommitLog.snapshot(table).version == v,
      "unchanged batch committed after migration")
    assert(Scd2.readHistory(spark, table).count() == 2)

    // real changes still version
    val chg = Seq((2L, ts(3), "y", "w")).toDF("k", "ts", "attr_a", "attr_b")
    Scd2.applyBatch(spark, chg, table, "k", "ts", token = Some("m3"))
    val h = Scd2.readHistory(spark, table).filter(col("k") === 2L)
      .select(col("attr_b"), col("is_current"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSet
    assert(h == Set(("z", false), ("w", true)), s"change not versioned: $h")
  }

  test("scd2: all-unchanged batch writes nothing; token replay no-ops") {
    val spark2 = spark
    import spark2.implicits._
    val table = tmp("graft_scd2_spec") + "/dim"
    def obs(t: Int, attrs: Map[Long, String]) =
      attrs.toSeq.map { case (k, a) => (k, ts(t), a) }.toDF("k", "ts", "attr")

    Scd2.applyBatch(spark, obs(1, Map(1L -> "a", 2L -> "b")), table, "k", "ts",
      token = Some("b1"))
    val v1 = CommitLog.snapshot(table).version

    // token replay: same batch again must not change the table
    Scd2.applyBatch(spark, obs(1, Map(1L -> "a", 2L -> "b")), table, "k", "ts",
      token = Some("b1"))
    assert(CommitLog.snapshot(table).version == v1, "token replay re-applied")

    // all attrs unchanged at a NEW ts: no version rows, no commit at all
    Scd2.applyBatch(spark, obs(2, Map(1L -> "a", 2L -> "b")), table, "k", "ts",
      token = Some("b2"))
    assert(CommitLog.snapshot(table).version == v1, "unchanged batch committed")
    assert(Scd2.readHistory(spark, table).count() == 2)

    // one change + one no-change: exactly one closed + one opened row
    Scd2.applyBatch(spark, obs(3, Map(1L -> "a", 2L -> "c")), table, "k", "ts",
      token = Some("b3"))
    val h = Scd2.readHistory(spark, table)
      .select(col("k"), col("attr"), col("is_current"),
        unix_millis(col("valid_to")).as("to_ms"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(h.count(_._1 == 1L) == 1, s"unchanged key grew history: $h")
    assert(h.count(_._1 == 2L) == 2, s"changed key missing a version: $h")
    val closed = h.find(t => t._1 == 2L && !t._3).get
    assert(closed._2 == "b" && closed._4 == ts(3).getTime,
      s"prior version not closed at the change ts: $closed")
    assert(h.exists(t => t._1 == 2L && t._3 && t._2 == "c"))
  }
}
