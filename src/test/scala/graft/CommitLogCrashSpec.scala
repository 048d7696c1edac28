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
}
