package graft.operators

import java.sql.Timestamp
import graft.functions.{Crypto, TopicMatch}
import graft.streaming.Model
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tenant/destination CRUD store — the control-plane piece the reference
  * keeps in Redis (`internal/tenantstore/redistenantstore/redistenantstore
  * .go:523-667`), re-expressed as a Spark-native CHANGELOG table on
  * [[CommitLog]].
  *
  * Shape: every mutation appends one immutable row stamped with a
  * monotonically increasing `op_seq`; the CURRENT state is the read-side
  * top-1 per (tenant_id, destination_id) by `op_seq`, minus tombstones —
  * the same last-write-wins the reference gets from Redis HSET, with two
  * properties Redis does not give it: full mutation history (time travel
  * via the commit log) and a directly scannable dimension table for the
  * data plane (no point-read fan-in to build the broadcast side).
  *
  * Reference semantics preserved:
  *   - upsert writes the full record and clears any tombstone
  *     (`redistenantstore.go:544-619` — `HDel deleted_at`), so creating
  *     over a soft-deleted id revives it;
  *   - create fails on a LIVE duplicate (`ErrDuplicateDestination`,
  *     `:523-531`) and on the per-tenant cap
  *     (`ErrMaxDestinationsPerTenantReached`, `:533-540`; cap counts live
  *     rows — the summary hash excludes deleted ids);
  *   - delete is a SOFT delete: the record gains `deleted_at` and leaves
  *     the listing (`:622-641`); missing id → `ErrDestinationNotFound`;
  *   - credentials and delivery_metadata encrypt at rest with the
  *     byte-compatible AES-GCM cipher ([[Crypto.Credentials]] ↔
  *     `cipher.go:16-64`): the parquet files never hold plaintext;
  *   - list filters by type (any-of) and topics (destination must match
  *     EVERY requested topic unless it subscribes to `*`;
  *     a `["*"]` filter selects only match-all destinations —
  *     `serialization.go:350-378`), ordered by created_at.
  *
  * Scale: mutations are driver-side row-at-a-time (control plane — the
  * reference's Redis ops are too); reads are one manifest-planned scan +
  * a top-1 window over (tenant, destination) — the dimension stays tiny
  * relative to the fact tables and broadcasts into the fanout join
  * unchanged ([[graft.streaming.Pipeline.matchFanout]] via
  * [[asDestinations]]). Old changelog months compact/retire through the
  * normal [[CommitLog]] operations.
  */
object DestinationStore {

  final class ErrDuplicateDestination(id: String)
    extends RuntimeException(s"destination already exists: $id")
  final class ErrMaxDestinationsPerTenantReached(max: Int)
    extends RuntimeException(s"max destinations per tenant reached: $max")
  final class ErrDestinationNotFound(id: String)
    extends RuntimeException(s"destination not found: $id")
  /** Retrieval of a soft-deleted id — distinct from not-found, as the
    * reference's `ErrDestinationDeleted` (drivertest `crud.go:389-393`). */
  final class ErrDestinationDeleted(id: String)
    extends RuntimeException(s"destination deleted: $id")

  /** Full destination record, plaintext credentials (reference
    * `entities.go:27-40`). */
  final case class DestinationRecord(
      tenant_id: String,
      destination_id: String,
      dest_type: String,
      topics: Seq[String],
      filter_json: Option[String],
      config: Map[String, String],
      credentials: Map[String, String],
      delivery_metadata: Map[String, String],
      metadata: Map[String, String],
      created_at: Timestamp,
      updated_at: Timestamp,
      disabled_at: Option[Timestamp],
      deleted_at: Option[Timestamp])

  /** Stored changelog row: credentials/delivery_metadata as AES-GCM
    * ciphertext of their canonical (sorted-key) JSON rendering. Public
    * only because Catalyst's generated encoder code must instantiate it —
    * treat as internal storage shape. */
  final case class StoredRow(
      op_seq: Long,
      tenant_id: String,
      destination_id: String,
      dest_type: String,
      topics: Seq[String],
      filter_json: Option[String],
      config: Map[String, String],
      credentials_enc: Array[Byte],
      delivery_metadata_enc: Array[Byte],
      metadata: Map[String, String],
      created_at: Timestamp,
      updated_at: Timestamp,
      disabled_at: Option[Timestamp],
      deleted_at: Option[Timestamp])

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Canonical JSON of a string map: keys sorted, so the rendering (and
    * therefore the ciphertext length and the gate query's decrypted
    * output) is deterministic regardless of map iteration order. */
  def mapJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")

  private def toStored(d: DestinationRecord, secret: String, opSeq: Long): StoredRow =
    StoredRow(opSeq, d.tenant_id, d.destination_id, d.dest_type, d.topics,
      d.filter_json, d.config,
      Crypto.Credentials.encryptBytes(mapJson(d.credentials).getBytes("UTF-8"), secret),
      Crypto.Credentials.encryptBytes(mapJson(d.delivery_metadata).getBytes("UTF-8"), secret),
      d.metadata, d.created_at, d.updated_at, d.disabled_at, d.deleted_at)

  /** Append one mutation row. The op_seq must be strictly increasing per
    * (tenant, destination) across calls — callers that mutate concurrently
    * from several processes should derive it from the committed CommitLog
    * version; single-writer control planes (the common case) can use a
    * counter or clock. */
  def upsert(spark: SparkSession, table: String, d: DestinationRecord,
             secret: String, opSeq: Long): Unit = {
    import spark.implicits._
    val row = toStored(d.copy(deleted_at = None), secret, opSeq)
    CommitLog.append(Seq(row).toDS().toDF(), table,
      idCol = "op_seq", tsCol = "updated_at")
    ()
  }

  /** Reference create: duplicate LIVE id → [[ErrDuplicateDestination]];
    * live count at the cap → [[ErrMaxDestinationsPerTenantReached]];
    * otherwise an upsert (which also revives a soft-deleted id). */
  def create(spark: SparkSession, table: String, d: DestinationRecord,
             secret: String, opSeq: Long, maxPerTenant: Int = 100): Unit = {
    val live = latestRows(spark, table)
      .filter(col("tenant_id") === d.tenant_id)
      .select("destination_id").collect().map(_.getString(0))
    if (live.contains(d.destination_id))
      throw new ErrDuplicateDestination(d.destination_id)
    if (live.length >= maxPerTenant)
      throw new ErrMaxDestinationsPerTenantReached(maxPerTenant)
    upsert(spark, table, d, secret, opSeq)
  }

  /** Soft delete: the latest live row gains `deleted_at` (content kept —
    * the reference holds soft-deleted hashes for 7 days). Deleting an
    * already-soft-deleted id is a NO-OP, not an error (drivertest
    * `crud.go:380-382` — the Redis hash still exists); only a
    * never-existed id raises. */
  def delete(spark: SparkSession, table: String, tenantId: String,
             destinationId: String, opSeq: Long, at: Timestamp): Unit = {
    import spark.implicits._
    val cur = latestAnyRows(spark, table)
      .filter(col("tenant_id") === tenantId &&
        col("destination_id") === destinationId)
      .as[StoredRow].collect().headOption
      .getOrElse(throw new ErrDestinationNotFound(destinationId))
    if (cur.deleted_at.isDefined) return // already deleted: no-op
    CommitLog.append(
      Seq(cur.copy(op_seq = opSeq, deleted_at = Some(at))).toDS().toDF(),
      table, idCol = "op_seq", tsCol = "updated_at")
    ()
  }

  /** Latest stored row per (tenant, destination), tombstones INCLUDED. */
  private[graft] def latestAnyRows(spark: SparkSession, table: String): DataFrame = {
    val w = Window.partitionBy(col("tenant_id"), col("destination_id"))
      .orderBy(col("op_seq").desc)
    if (CommitLog.snapshot(table).files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.Encoders.product[StoredRow].schema)
    CommitLog.scan(spark, table)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn", "month")
  }

  /** Latest stored row per (tenant, destination), tombstones excluded. */
  def latestRows(spark: SparkSession, table: String): DataFrame =
    latestAnyRows(spark, table).filter(col("deleted_at").isNull)

  /** Point read with decrypted credentials. A soft-deleted id raises
    * [[ErrDestinationDeleted]] (the reference's distinct error for this
    * case); a never-existed id yields None. */
  def retrieve(spark: SparkSession, table: String, tenantId: String,
               destinationId: String, secret: String): Option[DestinationRecord] = {
    import spark.implicits._
    latestAnyRows(spark, table)
      .filter(col("tenant_id") === tenantId &&
        col("destination_id") === destinationId)
      .as[StoredRow].collect().headOption.map { r =>
        if (r.deleted_at.isDefined) throw new ErrDestinationDeleted(destinationId)
        fromStored(r, secret)
      }
  }

  private def fromStored(r: StoredRow, secret: String): DestinationRecord =
    DestinationRecord(r.tenant_id, r.destination_id, r.dest_type, r.topics,
      r.filter_json, r.config,
      parseFlatJson(new String(
        Crypto.Credentials.decryptBytes(r.credentials_enc, secret), "UTF-8")),
      parseFlatJson(new String(
        Crypto.Credentials.decryptBytes(r.delivery_metadata_enc, secret), "UTF-8")),
      r.metadata, r.created_at, r.updated_at, r.disabled_at, r.deleted_at)

  private def parseFlatJson(json: String): Map[String, String] = {
    val node = graft.functions.JsonMatch.parse(json)
    val it = node.fields()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue.asText) }
    b.result()
  }

  /** List a tenant's live destinations with the reference's filter rules
    * (`serialization.go:350-378`): `types` = any-of on dest_type; `topics`
    * = the destination must match EVERY requested topic unless it
    * subscribes to `*`, and a `["*"]` filter selects only match-all
    * subscriptions. Ordered by created_at (`redistenantstore.go:502-505`). */
  def list(spark: SparkSession, table: String, tenantId: String,
           secret: String, types: Seq[String] = Nil,
           topics: Seq[String] = Nil, ids: Seq[String] = Nil): Seq[DestinationRecord] = {
    import spark.implicits._
    val base = latestRows(spark, table).filter(col("tenant_id") === tenantId)
    // batch-by-IDs (reference HMGET path, redistenantstore.go:441-465):
    // nonexistent ids skip silently, deleted ids stay excluded
    val keyed = if (ids.isEmpty) base
      else base.filter(col("destination_id").isin(ids: _*))
    val typed = if (types.isEmpty) keyed
      else keyed.filter(col("dest_type").isin(types: _*))
    typed.as[StoredRow].collect().toSeq
      .filter { r =>
        topics.isEmpty || r.topics.contains("*") || {
          val filterMatchesAll = topics == Seq("*")
          !filterMatchesAll && topics.forall(t => TopicMatch.matches(r.topics, t))
        }
      }
      .sortBy(r => (r.created_at.getTime, r.destination_id))
      .map(fromStored(_, secret))
  }

  /** The data-plane view: current live destinations as the broadcastable
    * dimension [[graft.streaming.Pipeline.matchFanout]] consumes —
    * credentials stay encrypted (the fanout never needs them; sinks
    * decrypt per destination at publish time). */
  def asDestinations(spark: SparkSession, table: String): Dataset[Model.Destination] = {
    import spark.implicits._
    latestRows(spark, table)
      .select(col("destination_id"), col("tenant_id"), col("dest_type"),
        col("topics"), col("filter_json"),
        col("disabled_at").isNotNull.as("disabled"))
      .as[Model.Destination]
  }

  /** Act on `destination_disabled` alert signals (the reference's alert
    * evaluator only EMITS the auto-disable signal — `alert/evaluator.go:4`
    * "acting on the signals ... is the caller's concern"; this is that
    * caller for the store): every named (tenant, destination) gets its
    * latest live row upserted with `disabled_at = at`. Alerts for unknown
    * or already-deleted destinations are ignored. Returns the number of
    * destinations disabled. */
  def applyDisableAlerts(spark: SparkSession, table: String, alerts: DataFrame,
                         baseOpSeq: Long, at: Timestamp): Int = {
    import spark.implicits._
    val targets = alerts.filter(col("kind") === "destination_disabled")
      .select(col("tenant_id"), col("destination_id")).distinct()
    val rows = latestRows(spark, table)
      .join(targets, Seq("tenant_id", "destination_id"), "left_semi")
      .as[StoredRow].collect()
    if (rows.isEmpty) return 0
    val disabled = rows.sortBy(r => (r.tenant_id, r.destination_id))
      .zipWithIndex.map { case (r, i) =>
        r.copy(op_seq = baseOpSeq + i, disabled_at = Some(at))
      }.toSeq
    CommitLog.append(disabled.toDS().toDF(), table,
      idCol = "op_seq", tsCol = "updated_at")
    disabled.size
  }

  /** Data-plane webhook signing dimension: (destination_id, secret,
    * previous_secret, previous_secret_invalid_at) for live webhook
    * destinations — the three credential fields the reference's webhook
    * provider reads (`destwebhook.go:125-126,455-480`). Decryption happens
    * IN the projection (codegen'd `try_aes_decrypt`): plaintext exists
    * only in flight toward the signer, never at rest, and a destination
    * whose ciphertext doesn't decrypt under this secret yields nulls
    * rather than failing the scan. Broadcast-sized by construction. */
  def webhookCredsDim(spark: SparkSession, table: String,
                      storeSecret: String): DataFrame = {
    val creds = Crypto.Credentials.decrypt(col("credentials_enc"), storeSecret)
    latestRows(spark, table)
      .filter(col("dest_type") === "webhook")
      .select(col("destination_id"),
        get_json_object(creds, "$.secret").as("secret"),
        get_json_object(creds, "$.previous_secret").as("previous_secret"),
        get_json_object(creds, "$.previous_secret_invalid_at")
          .as("previous_secret_invalid_at"))
  }

  // ------------------------------------------------------------- tenants

  final class ErrTenantNotFound(id: String)
    extends RuntimeException(s"tenant not found: $id")

  /** Stored tenant fields (reference `redistenantstore.go:200-240` — only
    * id, metadata and the timestamps persist; counts and topics derive). */
  final case class TenantRecord(
      tenant_id: String,
      metadata: Map[String, String],
      created_at: Timestamp,
      updated_at: Timestamp,
      deleted_at: Option[Timestamp])

  /** Read view (reference `RetrieveTenant`, `:169-198`):
    * `destinations_count` = live destinations (disabled included — only
    * deletion leaves the summary), `topics` = the union of their
    * subscriptions collapsed to `["*"]` when any destination subscribes to
    * everything (`serialization.go:323-348`; sorted here for determinism —
    * the reference's map-iteration order is unspecified). */
  final case class TenantView(
      tenant_id: String,
      destinations_count: Long,
      topics: Seq[String],
      metadata: Map[String, String],
      created_at: Timestamp,
      updated_at: Timestamp)

  /** Internal storage shape; public for Catalyst codegen (see [[StoredRow]]). */
  final case class StoredTenant(
      op_seq: Long,
      tenant_id: String,
      metadata: Map[String, String],
      created_at: Timestamp,
      updated_at: Timestamp,
      deleted_at: Option[Timestamp])

  /** Upsert a tenant row; like the destination form it clears tombstones. */
  def upsertTenant(spark: SparkSession, tenantTable: String, t: TenantRecord,
                   opSeq: Long): Unit = {
    import spark.implicits._
    val row = StoredTenant(opSeq, t.tenant_id, t.metadata,
      t.created_at, t.updated_at, None)
    CommitLog.append(Seq(row).toDS().toDF(), tenantTable,
      idCol = "op_seq", tsCol = "updated_at")
    ()
  }

  /** Highest op_seq present in a changelog table — RAW rows, tombstones
    * included (a deleted key's tombstone carries the table's maximum; a
    * live-rows scan would under-seed and let a restarted writer reuse
    * seqs, making last-write-wins resurrect old state). */
  def highWaterOpSeq(spark: SparkSession, table: String): Long =
    if (CommitLog.snapshot(table).files.isEmpty) 0L
    else {
      val r = CommitLog.scan(spark, table)
        .agg(org.apache.spark.sql.functions.max(col("op_seq"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }

  private def latestTenantRows(spark: SparkSession, tenantTable: String): DataFrame = {
    val w = Window.partitionBy(col("tenant_id")).orderBy(col("op_seq").desc)
    if (CommitLog.snapshot(tenantTable).files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.Encoders.product[StoredTenant].schema)
    CommitLog.scan(spark, tenantTable)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn", "month")
      .filter(col("deleted_at").isNull)
  }

  /** Union of a live-destination set's topics with the reference's `*`
    * collapse (`parseTenantTopics`), sorted. */
  def tenantTopics(destTopics: Seq[Seq[String]]): Seq[String] =
    if (destTopics.exists(_.contains("*"))) Seq("*")
    else destTopics.flatten.distinct.sorted

  /** List all live tenants (optionally id-filtered) with their derived
    * destination summaries, id-ascending — the `GET /tenants` surface
    * (`tenant_handlers.go:103-160`). One pass over each changelog
    * (tenant rows + a grouped topics read), not a per-tenant loop;
    * control-plane-sized collects like the point reads. */
  def listTenants(spark: SparkSession, tenantTable: String,
                  destTable: String, ids: Seq[String] = Nil): Seq[TenantView] = {
    import spark.implicits._
    val base = latestTenantRows(spark, tenantTable)
    val filtered =
      if (ids.nonEmpty) base.filter(col("tenant_id").isin(ids: _*)) else base
    val tenants = filtered.as[StoredTenant].collect().sortBy(_.tenant_id).toSeq
    if (tenants.isEmpty) return Nil
    val topicSets: Map[String, Seq[Seq[String]]] = latestRows(spark, destTable)
      .filter(col("tenant_id").isin(tenants.map(_.tenant_id): _*))
      .select(col("tenant_id"), col("topics")).as[(String, Seq[String])]
      .collect().toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    tenants.map { t =>
      val ts = topicSets.getOrElse(t.tenant_id, Nil)
      TenantView(t.tenant_id, ts.size.toLong, tenantTopics(ts),
        t.metadata, t.created_at, t.updated_at)
    }
  }

  /** Point read with the DERIVED destination summary. */
  def retrieveTenant(spark: SparkSession, tenantTable: String,
                     destTable: String, tenantId: String): Option[TenantView] = {
    import spark.implicits._
    latestTenantRows(spark, tenantTable)
      .filter(col("tenant_id") === tenantId)
      .as[StoredTenant].collect().headOption.map { t =>
        val topicSets = latestRows(spark, destTable)
          .filter(col("tenant_id") === tenantId)
          .select(col("topics")).as[Seq[String]].collect().toSeq
        TenantView(t.tenant_id, topicSets.size.toLong, tenantTopics(topicSets),
          t.metadata, t.created_at, t.updated_at)
      }
  }

  /** Checkpoint the destination changelog to CURRENT STATE: one row per
    * (tenant, destination) — the last-write-wins winner — with tombstones
    * older than `tombstoneGraceMs` dropped entirely (the reference expires
    * soft-deleted hashes after 7 days, `redistenantstore.go:633-637`; an
    * expired tombstone behaves as never-existed, so a later create needs
    * no revive path). Without this the changelog grows with mutation
    * count forever; with it, growth is bounded by live keys + recent
    * tombstones. One conflict-checked commit (adds state files, removes
    * every pre-snapshot file): appends landing after the snapshot stay
    * visible untouched; a racing compact loses the version claim and
    * aborts with [[CommitLog.ConcurrentDelete]] rather than resurrecting
    * or dropping data. */
  def compact(spark: SparkSession, table: String,
              nowMs: Long,
              tombstoneGraceMs: Long = 7L * 24 * 3600 * 1000): Unit =
    compactChangelog(spark, table, Seq("tenant_id", "destination_id"),
      nowMs, tombstoneGraceMs)

  /** [[compact]] for the tenant changelog (key = tenant_id). */
  def compactTenants(spark: SparkSession, tenantTable: String,
                     nowMs: Long,
                     tombstoneGraceMs: Long = 7L * 24 * 3600 * 1000): Unit =
    compactChangelog(spark, tenantTable, Seq("tenant_id"),
      nowMs, tombstoneGraceMs)

  private def compactChangelog(spark: SparkSession, table: String,
                               keyCols: Seq[String], nowMs: Long,
                               tombstoneGraceMs: Long): Unit = {
    val old = CommitLog.snapshot(table).files
    if (old.isEmpty) return
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("op_seq").desc)
    val state = CommitLog.scan(spark, table)
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
      .filter(col("deleted_at").isNull ||
        unix_millis(col("deleted_at")) > nowMs - tombstoneGraceMs)
    val staging = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(table), ".stage-")
    try {
      state.repartition(col("month"))
        .sortWithinPartitions(keyCols.map(col): _*)
        .write.mode("overwrite").partitionBy("month").parquet(staging.toString)
      val adds = CommitLog.moveStaged(staging, table)
      try {
        CommitLog.commit(table, "compact", adds, removes = old.map(_.path))
        ()
      } catch {
        case e: CommitLog.ConcurrentDelete =>
          adds.foreach(a => java.nio.file.Files.deleteIfExists(
            java.nio.file.Paths.get(table).resolve(a.path)))
          throw e
      }
    } finally deleteRecursively(staging)
  }

  private def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import java.nio.file._
    if (Files.exists(dir)) {
      // close the walk stream (it holds directory FDs until GC otherwise —
      // the CommitLog.listDir lesson)
      val st = Files.walk(dir)
      try st.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally st.close()
    }
  }

  /** Cascade soft delete (reference `DeleteTenant`, `:241-270`): every live
    * destination gains a tombstone in ONE changelog append, then the tenant
    * row does. op_seqs are allocated from `baseOpSeq`. */
  def deleteTenant(spark: SparkSession, tenantTable: String, destTable: String,
                   tenantId: String, baseOpSeq: Long, at: Timestamp): Unit = {
    import spark.implicits._
    val cur = latestTenantRows(spark, tenantTable)
      .filter(col("tenant_id") === tenantId)
      .as[StoredTenant].collect().headOption
      .getOrElse(throw new ErrTenantNotFound(tenantId))
    val dests = latestRows(spark, destTable)
      .filter(col("tenant_id") === tenantId).as[StoredRow].collect()
    if (dests.nonEmpty) {
      val tombs = dests.zipWithIndex.map { case (d, i) =>
        d.copy(op_seq = baseOpSeq + i, deleted_at = Some(at))
      }.toSeq
      CommitLog.append(tombs.toDS().toDF(), destTable,
        idCol = "op_seq", tsCol = "updated_at")
    }
    CommitLog.append(
      Seq(cur.copy(op_seq = baseOpSeq + dests.length,
        deleted_at = Some(at))).toDS().toDF(),
      tenantTable, idCol = "op_seq", tsCol = "updated_at")
    ()
  }
}
