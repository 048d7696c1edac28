package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import graft.operators.CommitLog
import org.apache.spark.sql.functions._

/** Multi-writer stress over one commit-log table: concurrent appenders ×
  * two racing compactors × retention, all live at once. Asserts the
  * serializability contract the Scaladoc claims:
  *
  *   - every committed version number is claimed exactly once and the
  *     sequence is contiguous (the create-if-absent primitive is the
  *     total order);
  *   - no append is lost and no row duplicated, whatever interleaving the
  *     scheduler produced (replay of the log = final state);
  *   - compaction preserves the row multiset it rewrites — a compactor
  *     that loses its removes to a concurrent commit aborts with
  *     ConcurrentDelete and its staged files stay invisible;
  *   - retention atomically drops only the old month;
  *   - a post-quiescence vacuum(grace=0) deletes exactly the
  *     unreferenced files: data dir == snapshot afterwards.
  */
class CommitLogConcurrencySpec extends GraftSuite {

  test("concurrent appends x compaction x retention serialize; ConcurrentDelete holds") {
    val spark2 = spark
    import spark2.implicits._
    val table = Files.createTempDirectory("graft_cl_stress").toString + "/t"

    // pre-seed an OLD month the retention thread will drop
    val t0old = java.sql.Timestamp.valueOf("2023-12-15 00:00:00")
    CommitLog.append(
      Seq((-1L, t0old), (-2L, t0old)).toDF("id", "ts"), table, "id", "ts")

    val appenders = 4
    val batchesPer = 8
    val rowsPer = 25
    val pool = Executors.newFixedThreadPool(appenders + 3)
    val start = new CountDownLatch(1)
    val concurrentDeletes = new AtomicInteger(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val ts = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")

    def run(body: => Unit): java.util.concurrent.Future[_] = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try body catch { case t: Throwable => failures.add(t) }
      }
    })

    // appenders: disjoint id ranges, all in month 2024-01
    val appendTasks = (0 until appenders).map { a =>
      run {
        (0 until batchesPer).foreach { b =>
          val base = (a * batchesPer + b) * rowsPer
          val rows = (0 until rowsPer).map(i => ((base + i).toLong, ts))
          CommitLog.append(rows.toDF("id", "ts"), table, "id", "ts")
        }
      }
    }
    // two compactors racing on the same month: losers must abort cleanly
    val compactTasks = (0 until 2).map { _ =>
      run {
        (0 until 6).foreach { _ =>
          try CommitLog.compactMonth(spark, table, "2024-01", "id", "ts")
          catch { case _: CommitLog.ConcurrentDelete =>
            concurrentDeletes.incrementAndGet(); () }
          Thread.sleep(30)
        }
      }
    }
    // retention drops the old month while everything else runs
    val retainTask = run {
      Thread.sleep(50)
      try CommitLog.dropMonthsBefore(table, "2024-01")
      catch { case _: CommitLog.ConcurrentDelete =>
        concurrentDeletes.incrementAndGet(); () }
    }

    start.countDown()
    (appendTasks ++ compactTasks :+ retainTask).foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty, s"unexpected failures: ${failures.asScala.map(_.toString).take(3)}")

    // version sequence: contiguous 1..N, each claimed exactly once
    val logDir = Paths.get(table, "_log")
    val versions = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.contains("checkpoint") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted
    assert(versions == (1L to versions.length))

    // serializability: the surviving rows are exactly the 2024-01 appends,
    // each exactly once — nothing lost to compaction races, nothing
    // duplicated, old month gone
    val expected = (0 until appenders * batchesPer * rowsPer).map(_.toLong).toSet
    val got = CommitLog.scan(spark, table).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size, "duplicated rows after races")
    assert(got.toSet == expected,
      s"lost ${expected.diff(got.toSet).size} / gained ${got.toSet.diff(expected).size} rows")
    assert(CommitLog.scan(spark, table)
      .select("month").distinct().collect().map(_.getString(0)).toSeq == Seq("2024-01"))

    // idempotency token still holds after the storm: re-append of an
    // applied token is a no-op
    val vBefore = CommitLog.snapshot(table).version
    CommitLog.append(Seq((999999L, ts)).toDF("id", "ts"), table, "id", "ts",
      token = Some("tok-1"))
    CommitLog.append(Seq((999999L, ts)).toDF("id", "ts"), table, "id", "ts",
      token = Some("tok-1"))
    assert(CommitLog.scan(spark, table).filter(col("id") === 999999L).count() == 1)
    assert(CommitLog.snapshot(table).version == vBefore + 1)

    // quiescent vacuum with zero grace: data dir collapses to the snapshot
    CommitLog.vacuum(table, graceMillis = 0)
    val snapPaths = CommitLog.snapshot(table).files.map(_.path).toSet
    val onDisk = Files.walk(Paths.get(table, "data")).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => Paths.get(table).relativize(p).toString).toSet
    assert(onDisk == snapPaths,
      s"vacuum left ${onDisk.diff(snapPaths).size} orphans / ate ${snapPaths.diff(onDisk).size} live files")
  }

  private implicit class IterAsScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
  test("snapshot cache under racing commits: versions are monotone per " +
      "reader, fresh commits become visible, content matches an uncached replay") {
    val spark2 = spark
    import spark2.implicits._
    val table = Files.createTempDirectory("graft_cl_snapcache").toString + "/t"
    val ts = java.sql.Timestamp.valueOf("2024-02-10 00:00:00")
    CommitLog.append(Seq((0L, ts)).toDF("id", "ts"), table, "id", "ts")

    val pool = Executors.newFixedThreadPool(5)
    val start = new CountDownLatch(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    // one writer: 30 sequential appends
    val writer = pool.submit(new Runnable {
      def run(): Unit = {
        start.await()
        try (1L to 30L).foreach { i =>
          CommitLog.append(Seq((i, ts)).toDF("id", "ts"), table, "id", "ts")
        } catch { case t: Throwable => failures.add(t) }
        finally stop.set(true)
      }
    })
    // four readers: hammer the CACHED snapshot path, asserting per-reader
    // monotonicity (a cache serving a version older than one it already
    // served would be a coherence bug, not just staleness)
    val readers = (0 until 4).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          var last = -1L
          try while (!stop.get()) {
            val v = CommitLog.snapshot(table).version
            if (v < last)
              throw new AssertionError(s"snapshot went backwards: $last -> $v")
            last = v
          } catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    (writer +: readers).foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty, failures.asScala.toSeq.map(_.toString))
    // final cached snapshot == an uncached full replay (snapshotAt)
    val snap = CommitLog.snapshot(table)
    val replay = CommitLog.snapshotAt(table, snap.version)
    assert(snap.version == 31L, s"lost commits: ${snap.version}")
    assert(snap.files.map(_.path).sorted == replay.files.map(_.path).sorted,
      "cached snapshot diverged from the uncached log replay")
  }

  private implicit class QAsScala[A](q: java.util.concurrent.ConcurrentLinkedQueue[A]) {
    def asScala: Iterator[A] = q.iterator().asScala
  }
}
