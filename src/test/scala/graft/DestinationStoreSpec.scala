package graft

import java.sql.Timestamp
import graft.operators.DestinationStore
import graft.operators.DestinationStore._
import org.apache.spark.sql.functions._

/** CRUD semantics ported from the reference tenant store
  * (`redistenantstore.go:523-667`, `serialization.go:350-378`):
  * last-write-wins upserts, live-duplicate create rejection, per-tenant
  * cap, soft delete + revive, encrypted credentials at rest, filtered
  * listing, and the data-plane dimension view. */
class DestinationStoreSpec extends GraftSuite {

  private val secret = "spec-secret"
  private def ts(ms: Long) = new Timestamp(ms)
  private val t0 = 1704067200000L

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft_dstore").toString + "/destinations"

  private def rec(tenant: String, id: String, typ: String = "webhook",
                  topics: Seq[String] = Seq("*"),
                  creds: Map[String, String] = Map("k" -> "v"),
                  createdMs: Long = t0, updatedMs: Long = t0,
                  disabledMs: Option[Long] = None): DestinationRecord =
    DestinationRecord(tenant, id, typ, topics, None, Map.empty, creds,
      Map.empty, Map.empty, ts(createdMs), ts(updatedMs), disabledMs.map(ts), None)

  test("upsert/retrieve round-trip decrypts credentials; parquet holds no plaintext") {
    val table = freshTable()
    val creds = Map("api_key" -> "super-secret-value", "user" -> "svc")
    DestinationStore.upsert(spark, table,
      rec("t1", "d1", creds = creds), secret, opSeq = 1)
    val got = DestinationStore.retrieve(spark, table, "t1", "d1", secret)
    assert(got.exists(_.credentials == creds))
    // encryption at rest is REAL: no parquet data file contains the secret
    val files = graft.operators.CommitLog.snapshot(table).files
    assert(files.nonEmpty)
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(table).resolve(f.path))
      assert(!new String(bytes, "ISO-8859-1").contains("super-secret-value"),
        s"plaintext credential found in ${f.path}")
    }
    // wrong secret decrypts to nothing rather than failing the scan
    assert(DestinationStore.latestRows(spark, table)
      .select(graft.functions.Crypto.Credentials
        .decrypt(col("credentials_enc"), "wrong").isNull)
      .head().getBoolean(0))
  }

  test("control characters in credential values round-trip (ADVICE r5 #1)") {
    val table = freshTable()
    // newline/tab/CR/low control chars/quote/backslash — the values the
    // reference round-trips via Go json.Marshal; pre-fix these produced
    // invalid JSON inside the ciphertext
    val creds = Map(
      "pem"   -> "-----BEGIN KEY-----\nline1\r\nline2\n-----END KEY-----",
      "weird" -> "tab\there  and \"quotes\" \\slash",
      "secret" -> "s\nvalue")
    val meta = Map("note" -> "multi\nline\tmeta")
    DestinationStore.upsert(spark, table,
      DestinationRecord("t1", "d1", "webhook", Seq("*"), None, Map.empty,
        creds, meta, Map.empty, ts(t0), ts(t0), None, None),
      secret, opSeq = 1)
    val got = DestinationStore.retrieve(spark, table, "t1", "d1", secret).get
    assert(got.credentials == creds)
    assert(got.delivery_metadata == meta)
    // the data-plane signing dim parses the same JSON with
    // get_json_object — control chars must not null it out
    val dim = DestinationStore.webhookCredsDim(spark, table, secret)
      .select("secret").head()
    assert(dim.getString(0) == "s\nvalue")
  }

  test("create: live duplicate rejected, soft-deleted id revives, cap enforced") {
    val table = freshTable()
    DestinationStore.create(spark, table, rec("t1", "d1"), secret, opSeq = 1)
    intercept[ErrDuplicateDestination](
      DestinationStore.create(spark, table, rec("t1", "d1"), secret, opSeq = 2))
    // soft delete, then create again: revived (reference only rejects LIVE)
    DestinationStore.delete(spark, table, "t1", "d1", opSeq = 3, at = ts(t0 + 1))
    // retrieving a deleted id is its own error, distinct from not-found
    intercept[ErrDestinationDeleted](
      DestinationStore.retrieve(spark, table, "t1", "d1", secret))
    assert(DestinationStore.retrieve(spark, table, "t1", "nope", secret).isEmpty)
    DestinationStore.create(spark, table,
      rec("t1", "d1", creds = Map("k" -> "v2")), secret, opSeq = 4)
    assert(DestinationStore.retrieve(spark, table, "t1", "d1", secret)
      .exists(_.credentials == Map("k" -> "v2")))
    // cap counts LIVE rows per tenant
    DestinationStore.create(spark, table, rec("t1", "d2"), secret, opSeq = 5,
      maxPerTenant = 2)
    intercept[ErrMaxDestinationsPerTenantReached](
      DestinationStore.create(spark, table, rec("t1", "d3"), secret, opSeq = 6,
        maxPerTenant = 2))
    // other tenants have their own budget
    DestinationStore.create(spark, table, rec("t2", "d3"), secret, opSeq = 7,
      maxPerTenant = 2)
  }

  test("delete: missing id raises; tombstone leaves listing but keeps history") {
    val table = freshTable()
    DestinationStore.create(spark, table, rec("t1", "d1"), secret, opSeq = 1)
    intercept[ErrDestinationNotFound](
      DestinationStore.delete(spark, table, "t1", "nope", opSeq = 2, at = ts(t0)))
    DestinationStore.delete(spark, table, "t1", "d1", opSeq = 2, at = ts(t0 + 1))
    assert(DestinationStore.list(spark, table, "t1", secret).isEmpty)
    // deleting an already-deleted id is a NO-OP, not an error (crud.go:380)
    DestinationStore.delete(spark, table, "t1", "d1", opSeq = 3, at = ts(t0 + 2))
    // the changelog retains the tombstone (soft delete, not erasure),
    // and the no-op delete appended nothing
    assert(graft.operators.CommitLog.scan(spark, table)
      .filter(col("deleted_at").isNotNull).count() == 1)
  }

  test("list by ids: nonexistent skip silently, deleted stay excluded") {
    val table = freshTable()
    DestinationStore.create(spark, table, rec("t1", "d1", createdMs = t0), secret, 1)
    DestinationStore.create(spark, table, rec("t1", "d2", createdMs = t0 + 1), secret, 2)
    DestinationStore.create(spark, table, rec("t1", "d3", createdMs = t0 + 2), secret, 3)
    DestinationStore.delete(spark, table, "t1", "d2", opSeq = 4, at = ts(t0 + 3))
    val got = DestinationStore.list(spark, table, "t1", secret,
      ids = Seq("d1", "d2", "ghost", "d3")).map(_.destination_id)
    assert(got == Seq("d1", "d3"))
  }

  test("list: type any-of, topics must ALL match unless destination is match-all") {
    val table = freshTable()
    DestinationStore.create(spark, table,
      rec("t1", "d_all", "webhook", Seq("*"), createdMs = t0), secret, 1)
    DestinationStore.create(spark, table,
      rec("t1", "d_orders", "kafka", Seq("order.*"), createdMs = t0 + 1), secret, 2)
    DestinationStore.create(spark, table,
      rec("t1", "d_mixed", "webhook", Seq("order.created", "user.*"),
        createdMs = t0 + 2), secret, 3)
    def ids(types: Seq[String] = Nil, topics: Seq[String] = Nil) =
      DestinationStore.list(spark, table, "t1", secret, types, topics)
        .map(_.destination_id)
    assert(ids() == Seq("d_all", "d_orders", "d_mixed")) // created_at order
    assert(ids(types = Seq("kafka")) == Seq("d_orders"))
    assert(ids(topics = Seq("order.created")) == Seq("d_all", "d_orders", "d_mixed"))
    // ALL requested topics must match (serialization.go:364-376)
    assert(ids(topics = Seq("order.created", "user.deleted")) ==
      Seq("d_all", "d_mixed"))
    // a ["*"] filter selects only match-all subscriptions
    assert(ids(topics = Seq("*")) == Seq("d_all"))
  }

  test("tenant view derives count and topics; delete cascades to destinations") {
    val table = freshTable()
    val tenants = freshTable() + "_tenants"
    DestinationStore.upsertTenant(spark, tenants,
      TenantRecord("t1", Map("plan" -> "pro"), ts(t0), ts(t0), None), opSeq = 1)
    DestinationStore.create(spark, table,
      rec("t1", "d1", topics = Seq("order.*", "user.created")), secret, 1)
    DestinationStore.create(spark, table,
      rec("t1", "d2", topics = Seq("order.created")), secret, 2)
    val v = DestinationStore.retrieveTenant(spark, tenants, table, "t1").get
    assert(v.destinations_count == 2)
    // union of subscriptions, sorted, no '*' collapse yet
    assert(v.topics == Seq("order.*", "order.created", "user.created"))
    assert(v.metadata == Map("plan" -> "pro"))
    // a match-all subscription collapses the summary to ["*"]
    DestinationStore.create(spark, table, rec("t1", "d3", topics = Seq("*")), secret, 3)
    assert(DestinationStore.retrieveTenant(spark, tenants, table, "t1")
      .get.topics == Seq("*"))
    // cascade: deleting the tenant tombstones every live destination too
    intercept[ErrTenantNotFound](
      DestinationStore.deleteTenant(spark, tenants, table, "t9",
        baseOpSeq = 10, at = ts(t0 + 1)))
    DestinationStore.deleteTenant(spark, tenants, table, "t1",
      baseOpSeq = 10, at = ts(t0 + 1))
    assert(DestinationStore.retrieveTenant(spark, tenants, table, "t1").isEmpty)
    assert(DestinationStore.list(spark, table, "t1", secret).isEmpty)
    // upsert revives the tenant (tombstone cleared, reference HDel deleted_at)
    DestinationStore.upsertTenant(spark, tenants,
      TenantRecord("t1", Map.empty, ts(t0), ts(t0 + 2), None), opSeq = 20)
    assert(DestinationStore.retrieveTenant(spark, tenants, table, "t1")
      .exists(_.destinations_count == 0))
  }

  test("compact: changelog shrinks to state, expired tombstones vanish, fresh survive") {
    val day = 86400000L
    val table = freshTable()
    // churn d1 (4 versions), delete d2 long ago, delete d3 recently
    DestinationStore.create(spark, table, rec("t1", "d1"), secret, 1)
    (2 to 4).foreach(i => DestinationStore.upsert(spark, table,
      rec("t1", "d1", creds = Map("k" -> s"v$i")), secret, i))
    DestinationStore.create(spark, table, rec("t1", "d2"), secret, 5)
    DestinationStore.delete(spark, table, "t1", "d2", opSeq = 6, at = ts(t0)) // 8d old at compact
    DestinationStore.create(spark, table, rec("t1", "d3"), secret, 7)
    DestinationStore.delete(spark, table, "t1", "d3", opSeq = 8, at = ts(t0 + 2 * day)) // 6d old
    val before = DestinationStore.list(spark, table, "t1", secret).map(_.destination_id)
    val filesBefore = graft.operators.CommitLog.snapshot(table).files.size

    DestinationStore.compact(spark, table, nowMs = t0 + 8 * day)

    // visible state unchanged; physical changelog collapsed
    assert(DestinationStore.list(spark, table, "t1", secret)
      .map(_.destination_id) == before)
    assert(graft.operators.CommitLog.snapshot(table).files.size < filesBefore)
    val raw = graft.operators.CommitLog.scan(spark, table)
    assert(raw.count() == 2) // d1 live + d3's fresh tombstone
    assert(raw.filter(col("deleted_at").isNotNull).count() == 1)
    // d1 kept its LAST version through the rewrite
    assert(DestinationStore.retrieve(spark, table, "t1", "d1", secret)
      .exists(_.credentials == Map("k" -> "v4")))
    // d2's tombstone expired entirely: a new create is a plain create
    DestinationStore.create(spark, table,
      rec("t1", "d2", creds = Map("k" -> "fresh")), secret, 9)
    assert(DestinationStore.retrieve(spark, table, "t1", "d2", secret)
      .exists(_.credentials == Map("k" -> "fresh")))
    // the tenant changelog compacts through the same machinery
    val tenants = freshTable() + "_tenants"
    DestinationStore.upsertTenant(spark, tenants,
      TenantRecord("t1", Map("v" -> "1"), ts(t0), ts(t0), None), 1)
    DestinationStore.upsertTenant(spark, tenants,
      TenantRecord("t1", Map("v" -> "2"), ts(t0), ts(t0 + 1), None), 2)
    DestinationStore.compactTenants(spark, tenants, nowMs = t0 + 8 * day)
    assert(graft.operators.CommitLog.scan(spark, tenants).count() == 1)
    assert(DestinationStore.retrieveTenant(spark, tenants, table, "t1")
      .exists(_.metadata == Map("v" -> "2")))
  }

  test("destination_disabled alerts flow back into the store") {
    val spark2 = spark
    import spark2.implicits._
    val table = freshTable()
    DestinationStore.create(spark, table, rec("t1", "d1"), secret, 1)
    DestinationStore.create(spark, table, rec("t1", "d2"), secret, 2)
    val alerts = Seq(
      ("t1", "d1", "destination_disabled", 100, 5),
      ("t1", "d2", "consecutive_failure", 50, 3), // below 100%: no disable
      ("t1", "ghost", "destination_disabled", 100, 9)) // unknown: ignored
      .toDF("tenant_id", "destination_id", "kind", "threshold_pct", "failure_count")
    val n = DestinationStore.applyDisableAlerts(spark, table, alerts,
      baseOpSeq = 10, at = ts(t0 + 1))
    assert(n == 1)
    val byId = DestinationStore.list(spark, table, "t1", secret)
      .map(d => d.destination_id -> d.disabled_at.isDefined).toMap
    assert(byId == Map("d1" -> true, "d2" -> false))
    // the data-plane dimension drops the disabled destination
    assert(DestinationStore.asDestinations(spark, table)
      .filter(!col("disabled")).collect().map(_.destination_id).toSeq == Seq("d2"))
  }

  test("store-backed webhook signing: per-destination secrets with rotation") {
    val spark2 = spark
    import spark2.implicits._
    val table = freshTable()
    val root = java.nio.file.Files.createTempDirectory("graft_store_sink").toString
    // d1: single secret; d2: rotated, previous still valid until 2099
    DestinationStore.create(spark, table,
      rec("t1", "d1", creds = Map("secret" -> "sec1")), secret, 1)
    DestinationStore.create(spark, table,
      rec("t1", "d2", creds = Map("secret" -> "sec2",
        "previous_secret" -> "old2",
        "previous_secret_invalid_at" -> "2099-01-01T00:00:00Z")), secret, 2)
    val dim = () => DestinationStore.webhookCredsDim(spark, table, secret)
    val sink = graft.streaming.Sinks.StoreWebhookSink(root, dim)
    val tasks = Seq(
      ("e1", "t1", "d1", 1, false, ts(t0), "a.b", """{"n":1}""", Map.empty[String, String], true, "webhook"),
      ("e2", "t1", "d2", 1, false, ts(t0), "a.b", """{"n":2}""", Map.empty[String, String], true, "webhook"),
      ("e3", "t1", "d9", 1, false, ts(t0), "a.b", """{"n":3}""", Map.empty[String, String], true, "webhook"))
      .toDF("event_id", "tenant_id", "destination_id", "attempt", "manual",
        "event_time", "topic", "data", "metadata", "eligible_for_retry", "dest_type")
    val outcomes = sink.publish(tasks).collect()
      .map(r => r.getAs[String]("destination_id") ->
        ((r.getAs[String]("status"), r.getAs[String]("code")))).toMap
    // signed deliveries succeed; unknown destination = missing creds = failed
    assert(outcomes("d1") == (("success", "200")))
    assert(outcomes("d2") == (("success", "200")))
    assert(outcomes("d9") == (("failed", "500")))
    def sigOf(dest: String): String = {
      val line = spark.read.text(s"$root/destination_id=$dest")
        .head().getString(0)
      graft.functions.JsonMatch.parse(line).get("signature").asText
    }
    def verify(sig: String, key: String, eventId: String, body: String): Boolean =
      new graft.streaming.Signatures.SignatureManager(
        Seq(graft.streaming.Signatures.WebhookSecret(key, java.time.Instant.EPOCH)))
        .verify(sig, key, graft.streaming.Signatures.SignaturePayload(
          eventId, "a.b", ts(t0).toInstant, body))
    // d1: exactly one signature, by sec1
    val s1 = sigOf("d1")
    assert(!s1.contains(",") && verify(s1, "sec1", "e1", """{"n":1}"""))
    // d2: current + still-valid previous, comma-joined, in that order
    val s2 = sigOf("d2").split(',')
    assert(s2.length == 2)
    assert(verify(s2(0), "sec2", "e2", """{"n":2}"""))
    assert(verify(s2(1), "old2", "e2", """{"n":2}"""))
    // no d9 delivery was written
    assert(!new java.io.File(s"$root/destination_id=d9").exists())
  }

  test("randomized op sequence agrees with the last-write-wins model") {
    val table = freshTable()
    val rnd = new scala.util.Random(42) // deterministic walk
    val ids = Seq("a", "b", "c")
    // model: id -> (credsVersion, deleted)
    val model = scala.collection.mutable.Map.empty[String, (Int, Boolean)]
    (1 to 18).foreach { seq =>
      val id = ids(rnd.nextInt(ids.size))
      val cur = model.get(id)
      if (rnd.nextBoolean() || cur.forall(_._2)) {
        DestinationStore.upsert(spark, table,
          rec("t1", id, creds = Map("v" -> seq.toString)), secret, seq)
        model(id) = (seq, false)
      } else {
        DestinationStore.delete(spark, table, "t1", id, seq, ts(t0 + seq))
        model(id) = (cur.get._1, true)
      }
    }
    val got = DestinationStore.list(spark, table, "t1", secret)
      .map(d => d.destination_id -> d.credentials("v")).toMap
    val expect = model.collect { case (id, (v, false)) => id -> v.toString }.toMap
    assert(got == expect, s"model=$model")
  }

  test("asDestinations feeds the fanout join; disabled destinations drop") {
    val spark2 = spark
    import spark2.implicits._
    val table = freshTable()
    DestinationStore.create(spark, table,
      rec("t1", "d_live", "mock", Seq("order.*")), secret, 1)
    DestinationStore.create(spark, table,
      rec("t1", "d_off", "mock", Seq("*"), disabledMs = Some(t0)), secret, 2)
    val dims = DestinationStore.asDestinations(spark, table)
    val events = Seq(
      ("e1", "t1", "order.created", true, ts(t0), Map.empty[String, String], "{}"))
      .toDF("event_id", "tenant_id", "topic", "eligible_for_retry",
        "event_time", "metadata", "data")
    val fanned = graft.streaming.Pipeline.matchFanout(spark, events, dims)
      .select("destination_id").collect().map(_.getString(0)).toSeq
    assert(fanned == Seq("d_live"))
  }
}
