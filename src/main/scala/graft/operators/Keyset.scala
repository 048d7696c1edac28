package graft.operators

import graft.core.Cursor
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Keyset (seek) pagination over a `(time, id)` composite sort key.
  *
  * Reference: hookdeck/outpost `internal/pagination/pagination.go:53-160`
  * (bidirectional driver: n+1 probe, reverse-if-backward, cursor rebuild) and
  * the cursor predicates in `chlogstore.go:309-326` / `pglogstore.go:190-208`.
  *
  * Scale notes: the cursor predicate is a plain Column conjunction, so the
  * time bound pushes into parquet row-group skipping / partition pruning, and
  * `orderBy(...).limit(n+1)` compiles to `TakeOrderedAndProject` — a
  * distributed top-k, never a full sort. No collect of anything but one page.
  */
object Keyset {
  sealed trait Order { def desc: Boolean }
  case object Asc extends Order { val desc = false }
  case object Desc extends Order { val desc = true }

  object Order {
    /** API-layer parse: unknown/absent sort values fall back to the default
      * (desc), as the reference's handlers do (misc drivertest "invalid
      * sort values use defaults"). */
    def parse(s: String): Order = if (s != null && s.equalsIgnoreCase("asc")) Asc else Desc
  }

  final case class Page(rows: Seq[Row], next: Option[String], prev: Option[String])

  /** The composite-key seek predicate: rows strictly after `k` in scan order. */
  def seekPredicate(tsCol: Column, idCol: Column, k: Cursor.Key, scanDesc: Boolean): Column = {
    val t = timestamp_micros(lit(k.micros))
    if (scanDesc) (tsCol < t) || (tsCol === t && idCol < lit(k.id))
    else (tsCol > t) || (tsCol === t && idCol > lit(k.id))
  }

  /** One page of a bidirectional cursor walk.
    *
    * @param df        filtered input (caller applies business filters first)
    * @param tsName    timestamp column name (ms-precision sort key)
    * @param idName    unique id column name (tiebreak)
    * @param order     requested presentation order
    * @param limit     page size
    * @param next/prev at most one of the two opaque cursors
    */
  def page(df: DataFrame, resource: String, tsName: String, idName: String,
           order: Order, limit: Int,
           next: Option[String] = None, prev: Option[String] = None): Page = {
    require(next.isEmpty || prev.isEmpty, "give at most one of next/prev")
    val backward = prev.isDefined
    val cursor = next.orElse(prev)
    // presentation order XOR walk direction = physical scan order
    val scanDesc = order.desc != backward
    val ts = col(tsName); val id = col(idName)

    val key = cursor.map(c => Cursor.decode(resource, c).fold(
      err => throw new IllegalArgumentException(err), identity))
    val seeked = key.fold(df)(k => df.filter(seekPredicate(ts, id, k, scanDesc)))
    val sorted =
      if (scanDesc) seeked.orderBy(ts.desc, id.desc) else seeked.orderBy(ts.asc, id.asc)
    val got = sorted.limit(limit + 1).collect().toSeq
    val hasMore = got.size > limit
    val trimmed = got.take(limit)
    val rows = if (backward) trimmed.reverse else trimmed

    def keyOf(r: Row): Cursor.Key = {
      val i = r.getAs[java.sql.Timestamp](tsName).toInstant
      Cursor.Key(i.getEpochSecond * 1000000L + i.getNano / 1000L,
        r.getAs[Any](idName).toString)
    }
    val (nextCur, prevCur) =
      if (rows.isEmpty) (None, None)
      else {
        val first = keyOf(rows.head); val last = keyOf(rows.last)
        val n = if (backward || hasMore) Some(Cursor.encode(resource, last)) else None
        val p = if (!backward && cursor.isEmpty) None
                else if (backward && !hasMore) None
                else Some(Cursor.encode(resource, first))
        (n, p)
      }
    Page(rows, nextCur, prevCur)
  }
}
