package graft

import java.sql.Timestamp
import java.time.Instant
import graft.operators.{Keyset, ListQuery}
import org.apache.spark.sql.DataFrame

/** Port of the reference's pagination conformance inventory
  * (`internal/pagination/paginationtest/suite.go` — the 11 generic walk
  * cases — instantiated for attempt and event lists with and without a
  * destination filter, as `internal/logstore/drivertest/pagination.go`
  * does, plus its TimeFilterWithCursor group: window-bounded walks, GT/LT
  * boundary exclusion, and prev-cursor × time-filter interplay).
  */
class PaginationConformanceSpec extends GraftSuite {

  import ListQuery.{Gt, Gte, Lt, Lte, Request}

  private val base = Instant.parse("2024-06-01T12:00:00Z")
  private def at(sec: Long): Timestamp = Timestamp.from(base.plusSeconds(sec))

  /** One list surface under test: builds `count` rows (times increasing
    * with index), returns the rows the list should see in index order. */
  private case class Inst(name: String, resource: String, idCol: String,
                          filters: Map[String, Seq[Any]],
                          mk: Int => (DataFrame, Seq[String]))

  private def attemptRows(n: Int, destCycle: Int): (DataFrame, Seq[(String, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until n).map { i =>
      (f"att_$i%03d", f"evt_$i%03d", s"dest_${i % math.max(destCycle, 1)}",
        "t1", at(i + 1), "success", "200")
    }
    (rows.toDF("attempt_id", "event_id", "destination_id", "tenant_id",
      "ts", "status", "code"),
      rows.map(r => (r._1, r._3)))
  }

  private def eventRows(n: Int, destCycle: Int): (DataFrame, Seq[(String, String)]) = {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until n).map { i =>
      (f"evt_$i%03d", "t1", s"dest_${i % math.max(destCycle, 1)}",
        "test.topic", at(i))
    }
    (rows.toDF("event_id", "tenant_id", "destination_id", "topic", "ts"),
      rows.map(r => (r._1, r._3)))
  }

  private val instances = Seq(
    Inst("ListAttempt", "att", "attempt_id", Map.empty,
      n => { val (df, rs) = attemptRows(n, 1); (df, rs.map(_._1)) }),
    Inst("ListEvent", "evt", "event_id", Map.empty,
      n => { val (df, rs) = eventRows(n, 1); (df, rs.map(_._1)) }),
    Inst("ListAttempt_WithDestinationFilter", "att", "attempt_id",
      Map("destination_id" -> Seq("dest_0")),
      n => { val (df, rs) = attemptRows(n, 2); (df, rs.filter(_._2 == "dest_0").map(_._1)) }),
    Inst("ListEvent_WithDestinationFilter", "evt", "event_id",
      Map("destination_id" -> Seq("dest_0")),
      n => { val (df, rs) = eventRows(n, 2); (df, rs.filter(_._2 == "dest_0").map(_._1)) }))

  private def list(inst: Inst, df: DataFrame, limit: Int, order: Keyset.Order,
                   next: Option[String] = None, prev: Option[String] = None,
                   time: Seq[(ListQuery.TimeOp, Instant)] = Nil): Keyset.Page =
    ListQuery.list(df, Request(inFilters = inst.filters, timeFilters = time,
      order = order, limit = limit, next = next, prev = prev),
      inst.resource, "ts", inst.idCol)

  private def ids(p: Keyset.Page, inst: Inst): Seq[String] =
    p.rows.map(_.getAs[String](inst.idCol))

  private def walkForward(inst: Inst, df: DataFrame, limit: Int,
                          order: Keyset.Order): Seq[Keyset.Page] = {
    var pages = Vector(list(inst, df, limit, order))
    var guard = 0
    while (pages.last.next.isDefined && guard < 50) {
      pages :+= list(inst, df, limit, order, next = pages.last.next)
      guard += 1
    }
    pages
  }

  for (inst <- instances) {
    test(s"${inst.name}: forward traversal covers all items exactly once (desc)") {
      val (df, expected) = inst.mk(10)
      val pages = walkForward(inst, df, 3, Keyset.Desc)
      val collected = pages.flatMap(p => ids(p, inst))
      assert(pages.head.prev.isEmpty, "first page has no prev")
      assert(collected.distinct == collected, "no duplicates across pages")
      assert(collected == expected.reverse)
    }

    test(s"${inst.name}: backward traversal reproduces forward pages in reverse (desc)") {
      val (df, expected) = inst.mk(9)
      if (expected.size >= 3) {
        val fwd = walkForward(inst, df, 3, Keyset.Desc)
        if (fwd.size >= 2) {
          var res = fwd.last
          var backPages = Vector.empty[Keyset.Page]
          var guard = 0
          while (res.prev.isDefined && guard < 50) {
            res = list(inst, df, 3, Keyset.Desc, prev = res.prev)
            backPages :+= res
            guard += 1
          }
          backPages.zipWithIndex.foreach { case (bp, i) =>
            val fIdx = fwd.size - 2 - i
            if (fIdx >= 0)
              assert(ids(bp, inst) == ids(fwd(fIdx), inst), s"back page $i")
          }
          assert(backPages.nonEmpty && backPages.last.prev.isEmpty,
            "arriving back at the first page clears prev")
        }
      }
    }

    test(s"${inst.name}: round trip next-then-prev returns the same page (desc)") {
      val (df, expected) = inst.mk(9)
      if (expected.size >= 6) {
        val p1 = list(inst, df, 3, Keyset.Desc)
        val p2 = list(inst, df, 3, Keyset.Desc, next = p1.next)
        val back = list(inst, df, 3, Keyset.Desc, prev = p2.prev)
        assert(ids(back, inst) == ids(p1, inst))
      }
    }

    test(s"${inst.name}: first page has no prev; last page has no next") {
      val (df, expected) = inst.mk(5)
      assert(list(inst, df, 3, Keyset.Desc).prev.isEmpty)
      val last = walkForward(inst, df, 3, Keyset.Desc).last
      assert(last.next.isEmpty)
      if (expected.size > 3) assert(last.prev.isDefined)
    }

    test(s"${inst.name}: empty results carry no cursors") {
      val (df, _) = inst.mk(0)
      val p = list(inst, df, 10, Keyset.Desc)
      assert(p.rows.isEmpty && p.next.isEmpty && p.prev.isEmpty)
    }

    test(s"${inst.name}: partial last page") {
      val (df, expected) = inst.mk(7)
      if (expected.nonEmpty) {
        val last = walkForward(inst, df, 3, Keyset.Desc).last
        val want = if (expected.size % 3 == 0) 3 else expected.size % 3
        assert(last.rows.size == want && last.next.isEmpty)
      }
    }

    test(s"${inst.name}: exact page boundary — full last page, no next") {
      val (df, expected) = inst.mk(6)
      if (expected.size == 6) {
        val p1 = list(inst, df, 3, Keyset.Desc)
        assert(p1.rows.size == 3 && p1.next.isDefined)
        val p2 = list(inst, df, 3, Keyset.Desc, next = p1.next)
        assert(p2.rows.size == 3 && p2.next.isEmpty)
      }
    }

    test(s"${inst.name}: single item has no cursors") {
      val (df, expected) = inst.mk(1)
      if (expected.size == 1) {
        val p = list(inst, df, 10, Keyset.Desc)
        assert(p.rows.size == 1 && p.next.isEmpty && p.prev.isEmpty)
      }
    }

    test(s"${inst.name}: asc returns oldest first, desc newest first") {
      val (df, expected) = inst.mk(5)
      assert(ids(list(inst, df, 10, Keyset.Asc), inst) == expected)
      assert(ids(list(inst, df, 10, Keyset.Desc), inst) == expected.reverse)
    }

    test(s"${inst.name}: forward traversal covers all items (asc)") {
      val (df, expected) = inst.mk(10)
      val collected = walkForward(inst, df, 3, Keyset.Asc).flatMap(p => ids(p, inst))
      assert(collected == expected)
    }
  }

  test("invalid sort values fall back to the default (desc)") {
    assert(Keyset.Order.parse("asc") == Keyset.Asc)
    assert(Keyset.Order.parse("ASC") == Keyset.Asc)
    assert(Keyset.Order.parse("desc") == Keyset.Desc)
    assert(Keyset.Order.parse("sideways") == Keyset.Desc)
    assert(Keyset.Order.parse(null) == Keyset.Desc)
  }

  // ─── TimeFilterWithCursor (drivertest/pagination.go:387-780) ──────────

  /** 20 attempts: 0-4 far past, 5-14 inside a ±10 min window at 2-min
    * spacing, 15-19 far future; attempt time = event time + 1 s. */
  private def timeFilterData(): (DataFrame, Instant, Instant) = {
    val spark2 = spark
    import spark2.implicits._
    val winStart = base.minusSeconds(600)
    val winEnd = base.plusSeconds(600)
    val rows = (0 until 20).map { i =>
      val eventTime =
        if (i < 5) winStart.minusSeconds((5 - i) * 3600L)
        else if (i < 15) winStart.plusSeconds((i - 5) * 120L)
        else winEnd.plusSeconds((i - 14) * 3600L)
      (f"att_$i%03d", f"evt_$i%03d", "d1", "t1",
        Timestamp.from(eventTime.plusSeconds(1)), "success", "200")
    }
    (rows.toDF("attempt_id", "event_id", "destination_id", "tenant_id",
      "ts", "status", "code"),
      winStart.plusSeconds(1), winEnd.plusSeconds(1))
  }

  private val attInst = instances.head

  test("time filter: pagination stays inside the GTE/LTE window") {
    val (df, s, e) = timeFilterData()
    var next: Option[String] = None
    var collected = Seq.empty[String]
    var guard = 0
    var done = false
    while (!done && guard < 20) {
      val p = list(attInst, df, 3, Keyset.Desc, next = next,
        time = Seq(Gte -> s, Lte -> e))
      collected ++= ids(p, attInst)
      if (p.next.isEmpty) done = true else next = p.next
      guard += 1
    }
    assert(collected == (14 to 5 by -1).map(i => f"att_$i%03d"),
      "only the 10 in-window attempts, newest first, nothing outside")
  }

  test("time filter: GT/LT exclude the exact boundary timestamps") {
    val (df, s, e) = timeFilterData()
    // att_005 sits exactly at window start (+1s), att_014 at +18 min
    val t5 = s
    val t14 = s.plusSeconds(9 * 120L)
    val p = list(attInst, df, 20, Keyset.Asc,
      time = Seq(Gt -> t5, Lt -> t14))
    assert(ids(p, attInst) == (6 to 13).map(i => f"att_$i%03d"))
    // sanity: GTE/LTE at the same bounds include both endpoints
    val incl = list(attInst, df, 20, Keyset.Asc,
      time = Seq(Gte -> t5, Lte -> t14))
    assert(ids(incl, attInst) == (5 to 14).map(i => f"att_$i%03d"))
  }

  test("time filter: prev cursor respects the window") {
    val (df, s, e) = timeFilterData()
    val w = Seq(Gte -> s, Lte -> e)
    val p1 = list(attInst, df, 3, Keyset.Desc, time = w)
    val p2 = list(attInst, df, 3, Keyset.Desc, next = p1.next, time = w)
    val back = list(attInst, df, 3, Keyset.Desc, prev = p2.prev, time = w)
    assert(ids(back, attInst) == ids(p1, attInst))
    assert(back.rows.forall { r =>
      val t = r.getAs[Timestamp]("ts").toInstant
      !t.isBefore(s) && !t.isAfter(e)
    })
  }

  test("time filter: ListEvent walk with window + cursor") {
    val spark2 = spark
    import spark2.implicits._
    val winStart = base.minusSeconds(600)
    val winEnd = base.plusSeconds(600)
    val rows = (0 until 20).map { i =>
      val t =
        if (i < 5) winStart.minusSeconds((5 - i) * 3600L)
        else if (i < 15) winStart.plusSeconds((i - 5) * 120L)
        else winEnd.plusSeconds((i - 14) * 3600L)
      (f"evt_$i%03d", "t1", "d1", "test.topic", Timestamp.from(t))
    }
    val df = rows.toDF("event_id", "tenant_id", "destination_id", "topic", "ts")
    val evInst = instances(1)
    var next: Option[String] = None
    var collected = Seq.empty[String]
    var guard = 0
    var done = false
    while (!done && guard < 20) {
      val p = list(evInst, df, 4, Keyset.Asc, next = next,
        time = Seq(Gte -> winStart, Lte -> winEnd))
      collected ++= ids(p, evInst)
      if (p.next.isEmpty) done = true else next = p.next
      guard += 1
    }
    assert(collected == (5 to 14).map(i => f"evt_$i%03d"))
  }
}
