package graft

import graft.operators.CommitLog
import org.apache.spark.sql.functions._

/** Crash-window fault injection for the commit log: every residue a
  * writer can leave by dying mid-operation must be (a) invisible to all
  * readers and (b) reclaimed by vacuum after the grace window. */
class CommitLogCrashSpec extends GraftSuite {

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_clc").toString

  private def sampleBatch(ids: Range, month: String) = {
    val spark2 = spark
    import spark2.implicits._
    ids.map(i => (s"id$i", java.sql.Timestamp.valueOf(s"$month-15 10:00:${i % 60}"), i))
      .toDF("id", "ts", "v")
  }

  /** What append's moveStaged does, replayed up to the crash point: part
    * files land in data/ under fresh names, the staging dir goes away —
    * and then the writer dies before committing the entry. */
  private def moveStagedLikeAppend(staging: java.nio.file.Path, table: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val moved = Seq.newBuilder[String]
    java.nio.file.Files.list(staging).iterator().asScala
      .filter(_.getFileName.toString.startsWith("month=")).foreach { mdir =>
        val month = mdir.getFileName.toString
        val dest = java.nio.file.Paths.get(table, "data", month)
        java.nio.file.Files.createDirectories(dest)
        java.nio.file.Files.list(mdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet")).foreach { f =>
            val name = s"part-${java.util.UUID.randomUUID()}.parquet"
            java.nio.file.Files.move(f, dest.resolve(name))
            moved += s"data/$month/$name"
          }
      }
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).iterator().asScala.foreach(rm)
      java.nio.file.Files.deleteIfExists(p); ()
    }
    rm(staging)
    moved.result()
  }

  test("crash after moveStaged, before commit: files invisible, vacuum reclaims") {
    val t = freshTable()
    CommitLog.append(sampleBatch(1 to 20, "2024-01"), t, "id", "ts")
    // simulate the crash: stage a second batch's parquet into data/ with
    // moveStaged (exactly what append does) but never commit the entry
    val staging = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(t), ".stage-")
    sampleBatch(21 to 40, "2024-01")
      .withColumn("month", lit("2024-01"))
      .write.mode("overwrite").partitionBy("month").parquet(staging.toString)
    val orphans = moveStagedLikeAppend(staging, t)
    assert(orphans.nonEmpty)

    // invisible: scan still reads only the committed 20 rows
    assert(CommitLog.scan(spark, t).count() == 20)
    // reclaimed: zero-grace vacuum deletes exactly the orphans (as data/)
    val deleted = CommitLog.vacuum(t, graceMillis = 0)
    assert(deleted.toSet == orphans.toSet, deleted)
    assert(CommitLog.scan(spark, t).count() == 20)
    // and the table keeps working
    CommitLog.append(sampleBatch(41 to 45, "2024-02"), t, "id", "ts")
    assert(CommitLog.scan(spark, t).count() == 25)
  }

  test("crash before the version claim: stale .tmp entry is inert and swept") {
    val t = freshTable()
    CommitLog.append(sampleBatch(1 to 10, "2024-01"), t, "id", "ts")
    val log = java.nio.file.Paths.get(t, "_log")
    // the residue commit() leaves if it dies between writeString and
    // createIfAbsent — including a torn (half-written) render
    val tmp = log.resolve(".tmp-deadbeef")
    java.nio.file.Files.writeString(tmp, """{"op":"append","adds":[{"pa""")
    val v0 = CommitLog.snapshot(t).version

    // invisible: snapshot/scan/commit all ignore dotfiles
    assert(CommitLog.snapshot(t).version == v0)
    assert(CommitLog.scan(spark, t).count() == 10)
    CommitLog.append(sampleBatch(11 to 15, "2024-01"), t, "id", "ts")
    assert(CommitLog.snapshot(t).version == v0 + 1)

    // swept past grace, and only the residue — committed entries survive
    val deleted = CommitLog.vacuum(t, graceMillis = 0)
    assert(deleted == Seq("_log/.tmp-deadbeef"), deleted)
    assert(!java.nio.file.Files.exists(tmp))
    assert(CommitLog.scan(spark, t).count() == 15)
  }

  test("crash before moveStaged: abandoned staging dir is swept whole") {
    val t = freshTable()
    CommitLog.append(sampleBatch(1 to 10, "2024-01"), t, "id", "ts")
    val staging = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(t), ".stage-")
    sampleBatch(11 to 30, "2024-01")
      .withColumn("month", lit("2024-01"))
      .write.mode("overwrite").partitionBy("month").parquet(staging.toString)

    assert(CommitLog.scan(spark, t).count() == 10)
    // a fresh staging dir survives a grace-respecting vacuum (a LIVE
    // writer may still be filling it) ...
    assert(CommitLog.vacuum(t).isEmpty)
    assert(java.nio.file.Files.isDirectory(staging))
    // ... and goes as one unit once stale
    val deleted = CommitLog.vacuum(t, graceMillis = 0)
    assert(deleted == Seq(staging.getFileName.toString), deleted)
    assert(!java.nio.file.Files.exists(staging))
    assert(CommitLog.scan(spark, t).count() == 10)
  }

  test("long-running staged write survives vacuum: leaf mtime counts, not root") {
    // A staging dir's ROOT mtime freezes once month= children exist; only
    // the leaves advance while parquet tasks stream in. A write running
    // longer than the grace window must NOT be swept out from under its
    // live writer — staleness is the newest mtime ANYWHERE in the tree.
    val t = freshTable()
    CommitLog.append(sampleBatch(1 to 10, "2024-01"), t, "id", "ts")
    val staging = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(t), ".stage-")
    sampleBatch(11 to 30, "2024-01")
      .withColumn("month", lit("2024-01"))
      .write.mode("overwrite").partitionBy("month").parquet(staging.toString)
    // age the root + month dir past any grace; keep ONE leaf fresh (the
    // file a task just finished writing)
    import scala.jdk.CollectionConverters._
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 3600L * 1000)
    def walk(p: java.nio.file.Path): Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(p))
        p +: java.nio.file.Files.list(p).iterator().asScala.toSeq.flatMap(walk)
      else Seq(p)
    val tree = walk(staging)
    val freshLeaf = tree.filter(_.getFileName.toString.endsWith(".parquet")).head
    tree.filterNot(_ == freshLeaf)
      .foreach(java.nio.file.Files.setLastModifiedTime(_, old))
    assert(CommitLog.vacuum(t, graceMillis = 15L * 60 * 1000).isEmpty)
    assert(java.nio.file.Files.isDirectory(staging))
    // once the last leaf goes stale too, the whole tree is garbage
    java.nio.file.Files.setLastModifiedTime(freshLeaf, old)
    val deleted = CommitLog.vacuum(t, graceMillis = 15L * 60 * 1000)
    assert(deleted == Seq(staging.getFileName.toString), deleted)
    assert(!java.nio.file.Files.exists(staging))
  }

  test("cross-table store batch: crash between events and attempts appends, token replay converges") {
    // the reference writes events+attempts in ONE store batch
    // (logmq/batchprocessor.go:192-307); on the commit log they are two
    // commits, so the crash window "events committed, attempts not" is
    // real — Logstore.insertBatchTx's recovery rule says replaying the
    // whole batch under the same token converges both tables exactly-once
    val spark2 = spark
    import spark2.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_xtab").toString
    val (evT, atT) = (s"$base/events", s"$base/attempts")
    def events(ids: Range) = ids.map(i =>
      (s"ev$i", java.sql.Timestamp.valueOf(s"2024-02-10 08:00:${i % 60}"), "order.created"))
      .toDF("event_id", "ts", "topic")
    def attempts(ids: Range) = ids.flatMap(i => Seq(1, 2).map(a =>
      (s"at${i}_$a", s"ev$i", a,
        java.sql.Timestamp.valueOf(s"2024-02-10 08:01:${i % 60}"))))
      .toDF("attempt_id", "event_id", "attempt_number", "attempt_time")

    // batch 0 lands clean (both commits)
    graft.operators.Logstore.insertBatchTx(
      events(0 until 10), attempts(0 until 10), evT, atT, token = "ingest-0")

    // batch 1 CRASHES mid-batch: the events append commits, the process
    // dies before the attempts append — replayed here by running only
    // the first half of insertBatchTx's fixed commit order
    CommitLog.append(events(10 until 20), evT, "event_id", "ts",
      token = Some("ingest-1"))
    // half-ingested state is visible as such: events there, attempts not
    assert(CommitLog.scan(spark, evT).count() == 20)
    assert(CommitLog.scan(spark, atT).count() == 20)

    // recovery = the at-least-once upstream redelivers the WHOLE batch
    // under the same token
    graft.operators.Logstore.insertBatchTx(
      events(10 until 20), attempts(10 until 20), evT, atT, token = "ingest-1")
    assert(CommitLog.scan(spark, evT).count() == 20) // events: token no-op, no dup
    assert(CommitLog.scan(spark, atT).count() == 40) // attempts: applied once
    // and a SECOND full replay (redelivery storm) is a complete no-op
    val (vE, vA) = (CommitLog.snapshot(evT).version, CommitLog.snapshot(atT).version)
    graft.operators.Logstore.insertBatchTx(
      events(10 until 20), attempts(10 until 20), evT, atT, token = "ingest-1")
    assert(CommitLog.snapshot(evT).version == vE)
    assert(CommitLog.snapshot(atT).version == vA)
    assert(CommitLog.scan(spark, evT).count() == 20)
    assert(CommitLog.scan(spark, atT).count() == 40)
    // exactly-once CONTENT, not just counts: every attempt's event exists
    // (the fixed order's read invariant) and ids are unique
    val at = CommitLog.scan(spark, atT)
    val ev = CommitLog.scan(spark, evT)
    assert(at.select("attempt_id").distinct().count() == 40)
    assert(at.join(ev, Seq("event_id"), "left_anti").count() == 0)
  }
}
