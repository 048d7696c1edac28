package graft.operators

import java.time.Instant
import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The list-query API surface: conjunctive IN-list + time-range filters over
  * a fact table with keyset pagination — the reference's
  * `ListEventRequest`/`ListAttemptRequest` shape
  * (`internal/logstore/driver/driver.go:33-43`, params parsed in
  * `internal/apirouter/log_handlers.go:434-500`).
  *
  * A request composes to ONE Column predicate conjunction → every conjunct
  * is visible to Catalyst (pushdown, pruning); pagination goes through
  * [[Keyset]] so page N never scans more than the seek bound allows.
  */
object ListQuery {

  sealed trait TimeOp
  case object Gte extends TimeOp; case object Lte extends TimeOp
  case object Gt extends TimeOp; case object Lt extends TimeOp

  final case class Request(
      inFilters: Map[String, Seq[Any]] = Map.empty,
      timeFilters: Seq[(TimeOp, Instant)] = Nil,
      order: Keyset.Order = Keyset.Desc,
      limit: Int = 100,
      next: Option[String] = None,
      prev: Option[String] = None) {
    def clampedLimit(max: Int = 1000): Int = math.min(math.max(limit, 1), max)
  }

  /** Build the filter predicate (time filters hit the raw ns column when
    * present — see Tables.events). */
  def predicate(df: DataFrame, req: Request, tsName: String): Column = {
    val hasRawNs = df.columns.contains("ts_ns") && tsName == "ts"
    val inPreds = req.inFilters.map { case (c, vs) => col(c).isin(vs: _*) }
    val timePreds = req.timeFilters.map { case (op, t) =>
      if (hasRawNs) {
        val ns = t.toEpochMilli * 1000000L
        op match {
          case Gte => col("ts_ns") >= ns; case Lt => col("ts_ns") < ns
          // <= / > against the µs-truncated view: floor(ns/1000) <= Tµs
          // ⟺ ns < (Tµs+1)·1000, i.e. bound at the next microsecond
          case Lte => col("ts_ns") < ns + 1000L; case Gt => col("ts_ns") >= ns + 1000L
        }
      } else {
        val ts = timestamp_millis(lit(t.toEpochMilli))
        op match {
          case Gte => col(tsName) >= ts; case Lte => col(tsName) <= ts
          case Gt => col(tsName) > ts; case Lt => col(tsName) < ts
        }
      }
    }
    (inPreds ++ timePreds).foldLeft(lit(true))(_ && _)
  }

  /** One page of results. */
  def list(df: DataFrame, req: Request, resource: String,
           tsName: String, idName: String): Keyset.Page =
    Keyset.page(df.filter(predicate(df, req, tsName)), resource, tsName,
      idName, req.order, req.clampedLimit(), req.next, req.prev)

  /** Point retrieve by unique id. */
  def retrieve(df: DataFrame, idName: String, id: Any): Option[org.apache.spark.sql.Row] =
    df.filter(col(idName) === id).limit(1).collect().headOption
}
