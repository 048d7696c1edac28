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

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "destination_crud" -> ((s, _) => {
      val table = java.nio.file.Files
        .createTempDirectory("graft_dest_crud").toString + "/destinations"
      val secret = "store-secret"
      // op 1-2: create two destinations for t1
      DestinationStore.create(s, table,
        rec("t1", "d1", "webhook", Seq("order.*", "user.created"),
          Map("secret" -> "s1"), T0, T0), secret, opSeq = 1)
      DestinationStore.create(s, table,
        rec("t1", "d2", "kafka", Seq("*"),
          Map("api_key" -> "k2"), T0 + H, T0 + H), secret, opSeq = 2)
      // op 3: rotate d1's credentials and disable it (full-row upsert)
      DestinationStore.upsert(s, table,
        rec("t1", "d1", "webhook", Seq("order.*", "user.created"),
          Map("secret" -> "s1b"), T0, T0 + D, disabledMs = Some(T0 + D)),
        secret, opSeq = 3)
      // op 4: soft-delete d2 (drops from the listing, content retained)
      DestinationStore.delete(s, table, "t1", "d2", opSeq = 4, at = ts(T0 + 2 * D))
      // op 5: another tenant's destination
      DestinationStore.create(s, table,
        rec("t2", "d3", "aws_sqs", Seq("order.created"),
          Map("queue" -> "q3"), T0 + D, T0 + D), secret, opSeq = 5)
      // op 6: create over the soft-deleted d2 REVIVES it (reference
      // redistenantstore.go:523-531 only rejects live duplicates)
      DestinationStore.create(s, table,
        rec("t1", "d2", "kafka", Seq("*"),
          Map("api_key" -> "k2b"), T0 + 2 * D, T0 + 2 * D), secret, opSeq = 6)

      DestinationStore.latestRows(s, table)
        .select(col("tenant_id"), col("destination_id"), col("dest_type"),
          array_join(col("topics"), ",").as("topics"),
          col("disabled_at").isNotNull.as("disabled"),
          graft.functions.Crypto.Credentials
            .decrypt(col("credentials_enc"), secret).as("credentials"),
          unix_millis(col("created_at")).as("created_ms"),
          unix_millis(col("updated_at")).as("updated_ms"))
        .orderBy(col("tenant_id"), col("destination_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "destination_crud" ->
      s"""WITH ops(op_seq, tenant_id, destination_id, dest_type, topics, disabled,
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
        |  FROM ops)
        |SELECT tenant_id, destination_id, dest_type, topics, disabled,
        |  credentials, CAST(created_ms AS BIGINT) AS created_ms,
        |  CAST(updated_ms AS BIGINT) AS updated_ms
        |FROM latest WHERE rn = 1 AND NOT deleted
        |ORDER BY tenant_id, destination_id""".stripMargin
  )
}
