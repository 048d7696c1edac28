package graft

import graft.core.{Cursor, Tables}
import graft.operators.Keyset
import scala.util.Random

class CursorKeysetSpec extends GraftSuite {

  test("cursor roundtrip (500 random keys)") {
    val rnd = new Random(7)
    (1 to 500).foreach { _ =>
      val k = Cursor.Key(math.abs(rnd.nextLong()) % (1L << 60), s"id_${rnd.nextInt(1000000)}")
      val enc = Cursor.encode("evt", k)
      assert(Cursor.decode("evt", enc) == Right(k), s"key=$k enc=$enc")
    }
  }

  test("cursor validation fails closed") {
    val enc = Cursor.encode("evt", Cursor.Key(123456789L, "x"))
    assert(Cursor.decode("att", enc).isLeft, "wrong resource")
    assert(Cursor.decode("evt", "evtv01:!!!").isLeft, "bad alphabet")
    assert(Cursor.decode("evt", "garbage").isLeft, "no prefix")
  }

  test("forward walk = full sorted scan; backward walk returns the same pages") {
    val df = Tables.events(spark, sf)
    val all = df.orderBy(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"))
      .select("event_id").collect().map(_.getLong(0)).toSeq

    // forward pages of 64
    var next: Option[String] = None
    var seen = Seq.empty[Long]
    var pages = 0
    var done = false
    while (!done) {
      val p = Keyset.page(df, "evt", "ts", "event_id", Keyset.Asc, 64, next = next)
      seen = seen ++ p.rows.map(_.getAs[Long]("event_id"))
      pages += 1
      if (p.next.isEmpty || pages > 50) done = true else next = p.next
    }
    assert(seen == all, "forward walk must equal the sorted scan")

    // one backward step from the third page reproduces the second page
    val p1 = Keyset.page(df, "evt", "ts", "event_id", Keyset.Asc, 64)
    val p2 = Keyset.page(df, "evt", "ts", "event_id", Keyset.Asc, 64, next = p1.next)
    val p3 = Keyset.page(df, "evt", "ts", "event_id", Keyset.Asc, 64, next = p2.next)
    val back = Keyset.page(df, "evt", "ts", "event_id", Keyset.Asc, 64, prev = p3.prev)
    assert(back.rows.map(_.getAs[Long]("event_id")) ==
      p2.rows.map(_.getAs[Long]("event_id")), "backward page must equal page 2")
  }

  test("desc order pagination") {
    val df = Tables.events(spark, sf)
    val p1 = Keyset.page(df, "evt", "ts", "event_id", Keyset.Desc, 10)
    val p2 = Keyset.page(df, "evt", "ts", "event_id", Keyset.Desc, 10, next = p1.next)
    val ids = (p1.rows ++ p2.rows).map(_.getAs[Long]("event_id"))
    val want = df.orderBy(org.apache.spark.sql.functions.col("ts").desc,
        org.apache.spark.sql.functions.col("event_id").desc)
      .select("event_id").limit(20).collect().map(_.getLong(0)).toSeq
    assert(ids == want)
  }
}
