package graft.queries

import java.sql.Timestamp
import graft.operators.DestinationStore
import graft.operators.DestinationStore.DestinationRecord
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control-plane store gate: a fixed destination CRUD sequence (create,
  * rotate+disable, soft delete, revive) applied through
  * [[DestinationStore]] into a fresh commit-log table, read back as the
  * current state. The DuckDB oracle REPLAYS the same op sequence as a
  * VALUES changelog and computes the same last-write-wins-minus-tombstones
  * view, so the comparison checks the store's upsert/delete/revive
  * semantics, not a hardcoded answer. Credentials round-trip through the
  * at-rest AES-GCM cipher (driver-side encrypt on write, codegen'd
  * `try_aes_decrypt` on read), so the gate also pins cipher interop. */
object StoreOps {

  private def ts(ms: Long) = new Timestamp(ms)

  private val T0 = 1704067200000L // 2024-01-01T00:00Z
  private val H = 3600000L
  private val D = 86400000L

  private def rec(tenant: String, id: String, typ: String, topics: Seq[String],
                  creds: Map[String, String], createdMs: Long, updatedMs: Long,
                  disabledMs: Option[Long] = None): DestinationRecord =
    DestinationRecord(tenant, id, typ, topics, None, Map.empty, creds,
      Map.empty, Map.empty, ts(createdMs), ts(updatedMs),
      disabledMs.map(ts), None)

  private val secret = "store-secret"

  /** The fixed six-op CRUD fixture both gates replay: create two t1
    * destinations, rotate+disable one, soft-delete the other, add a t2
    * destination, then revive the soft-deleted id (reference
    * `redistenantstore.go:523-531` only rejects LIVE duplicates). */
  private def applyFixture(s: SparkSession): String = {
    val table = java.nio.file.Files
      .createTempDirectory("graft_dest_crud").toString + "/destinations"
    DestinationStore.create(s, table,
      rec("t1", "d1", "webhook", Seq("order.*", "user.created"),
        Map("secret" -> "s1"), T0, T0), secret, opSeq = 1)
    DestinationStore.create(s, table,
      rec("t1", "d2", "kafka", Seq("*"),
        Map("api_key" -> "k2"), T0 + H, T0 + H), secret, opSeq = 2)
    // rotate d1's credentials and disable it (full-row upsert)
    DestinationStore.upsert(s, table,
      rec("t1", "d1", "webhook", Seq("order.*", "user.created"),
        Map("secret" -> "s1b"), T0, T0 + D, disabledMs = Some(T0 + D)),
      secret, opSeq = 3)
    // soft-delete d2 (drops from the listing, content retained)
    DestinationStore.delete(s, table, "t1", "d2", opSeq = 4, at = ts(T0 + 2 * D))
    DestinationStore.create(s, table,
      rec("t2", "d3", "aws_sqs", Seq("order.created"),
        Map("queue" -> "q3"), T0 + D, T0 + D), secret, opSeq = 5)
    DestinationStore.create(s, table,
      rec("t1", "d2", "kafka", Seq("*"),
        Map("api_key" -> "k2b"), T0 + 2 * D, T0 + 2 * D), secret, opSeq = 6)
    table
  }

  /** Shared VALUES changelog: the oracle-side twin of [[applyFixture]]. */
  private def opsCte: String =
    s"""ops(op_seq, tenant_id, destination_id, dest_type, topics, disabled,
       |          credentials, created_ms, updated_ms, deleted) AS (VALUES
       |  (1, 't1', 'd1', 'webhook', 'order.*,user.created', false,
       |      '{"secret":"s1"}', ${T0}, ${T0}, false),
       |  (2, 't1', 'd2', 'kafka', '*', false,
       |      '{"api_key":"k2"}', ${T0 + H}, ${T0 + H}, false),
       |  (3, 't1', 'd1', 'webhook', 'order.*,user.created', true,
       |      '{"secret":"s1b"}', ${T0}, ${T0 + D}, false),
       |  (4, 't1', 'd2', 'kafka', '*', false,
       |      '{"api_key":"k2"}', ${T0 + H}, ${T0 + H}, true),
       |  (5, 't2', 'd3', 'aws_sqs', 'order.created', false,
       |      '{"queue":"q3"}', ${T0 + D}, ${T0 + D}, false),
       |  (6, 't1', 'd2', 'kafka', '*', false,
       |      '{"api_key":"k2b"}', ${T0 + 2 * D}, ${T0 + 2 * D}, false)),
       |latest AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY tenant_id, destination_id ORDER BY op_seq DESC) AS rn
       |  FROM ops),
       |live AS (SELECT * FROM latest WHERE rn = 1 AND NOT deleted)""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "destination_crud" -> ((s, _) => {
      val table = applyFixture(s)
      DestinationStore.latestRows(s, table)
        .select(col("tenant_id"), col("destination_id"), col("dest_type"),
          array_join(col("topics"), ",").as("topics"),
          col("disabled_at").isNotNull.as("disabled"),
          graft.functions.Crypto.Credentials
            .decrypt(col("credentials_enc"), secret).as("credentials"),
          unix_millis(col("created_at")).as("created_ms"),
          unix_millis(col("updated_at")).as("updated_ms"))
        .orderBy(col("tenant_id"), col("destination_id"))
    }),

    // Derived tenant summary over the same fixture (reference
    // RetrieveTenant, redistenantstore.go:169-198): live-destination count
    // (disabled ones included — only deletion leaves the summary) and the
    // topic union collapsed to '*' when any destination subscribes to all.
    "tenant_summary" -> ((s, _) => {
      val table = applyFixture(s)
      val live = DestinationStore.latestRows(s, table)
      val summary = live.groupBy(col("tenant_id"))
        .agg(count(lit(1)).as("destinations_count"),
          max(array_contains(col("topics"), "*").cast("int")).as("has_all"))
      val union = live.select(col("tenant_id"), explode(col("topics")).as("t"))
        .groupBy(col("tenant_id"))
        .agg(array_join(array_sort(collect_set(col("t"))), ",").as("topics_union"))
      summary.join(union, Seq("tenant_id"))
        .select(col("tenant_id"), col("destinations_count"),
          when(col("has_all") === 1, "*").otherwise(col("topics_union")).as("topics"))
        .orderBy(col("tenant_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "destination_crud" ->
      s"""WITH $opsCte
        |SELECT tenant_id, destination_id, dest_type, topics, disabled,
        |  credentials, CAST(created_ms AS BIGINT) AS created_ms,
        |  CAST(updated_ms AS BIGINT) AS updated_ms
        |FROM live
        |ORDER BY tenant_id, destination_id""".stripMargin,
    "tenant_summary" ->
      s"""WITH $opsCte,
        |summary AS (
        |  SELECT tenant_id, count(*) AS destinations_count,
        |    bool_or(list_contains(string_split(topics, ','), '*')) AS has_all
        |  FROM live GROUP BY tenant_id),
        |tops AS (
        |  SELECT tenant_id,
        |    string_agg(DISTINCT topic, ',' ORDER BY topic) AS topics_union
        |  FROM (SELECT tenant_id, unnest(string_split(topics, ',')) AS topic
        |        FROM live)
        |  GROUP BY tenant_id)
        |SELECT s.tenant_id, s.destinations_count,
        |  CASE WHEN s.has_all THEN '*' ELSE t.topics_union END AS topics
        |FROM summary s JOIN tops t USING (tenant_id)
        |ORDER BY s.tenant_id""".stripMargin
  )
}
