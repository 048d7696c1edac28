package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{JsonMatch, PartitionKey}
import graft.streaming.Signatures
import graft.streaming.Signatures._

/** Signature scheme + partition-key fixtures ported from the reference
  * (`destwebhook/signature_test.go`, `partitionkey/partitionkey.go`). */
class SignaturesSpec extends AnyFunSuite {

  private val ts = Instant.ofEpochSecond(1234567890L)
  private val body = """{"hello":"world"}"""

  test("hmac algorithm vectors (signature_test.go:21-56)") {
    val content = s"""1234567890.$body"""
    val key = "test-secret"
    assert(HmacSha256.sign(key, content, HexEncoder) ==
      "7054f74dae9f73e82b56ca73e8f81450097c698eeda0b00bb8728e89796baf2d")
    assert(HmacSha1.sign(key, content, HexEncoder) ==
      "e2f4423c54f5385099d8e3fbb01237d415ee8fdf")
    assert(HmacMd5.sign(key, content, HexEncoder) ==
      "aa98470ad83d2d02006b1a67d2c3b4eb")
    for (a <- Seq(HmacSha256, HmacSha1, HmacMd5))
      assert(a.verify(key, content, a.sign(key, content, HexEncoder), HexEncoder))
  }

  test("encoders (signature_test.go:172-200)") {
    val in = "test123".getBytes("UTF-8")
    assert(HexEncoder.encode(in) == "74657374313233")
    assert(Base64Encoder.encode(in) == "dGVzdDEyMw==")
  }

  test("signature content templates (signature_test.go:58-101)") {
    def fmt(t: String): String =
      new Template(t).render("test-id", "test-topic", ts, body, Nil)
    assert(fmt("{{.Body}}") == body)
    assert(fmt("ts={{.Timestamp.Unix}};content={{.Body}}") ==
      s"ts=1234567890;content=$body")
    assert(fmt("{{.Timestamp.Unix}}.{{.Body}}") == s"1234567890.$body")
    assert(fmt("ts={{.Timestamp.Unix}};id={{.EventID}};topic={{.Topic}};data={{.Body}}") ==
      s"ts=1234567890;id=test-id;topic=test-topic;data=$body")
  }

  test("header templates (signature_test.go:115-158)") {
    val sigs = Seq("abc123", "def456")
    def fmt(t: String): String =
      new Template(t).render("test-id", "test-topic", ts, "", sigs)
    assert(fmt("""v0={{.Signatures | join ","}}""") == "v0=abc123,def456")
    assert(fmt("""timestamp={{.Timestamp.Unix}};signatures={{.Signatures | join ","}}""") ==
      "timestamp=1234567890;signatures=abc123,def456")
    assert(fmt("""t={{.Timestamp.Unix}},v0={{.Signatures | join ","}}""") ==
      "t=1234567890,v0=abc123,def456")
    assert(fmt("""t={{.Timestamp.Unix}},id={{.EventID}},topic={{.Topic}},v0={{.Signatures | join ","}}""") ==
      "t=1234567890,id=test-id,topic=test-topic,v0=abc123,def456")
  }

  test("templates reject empty and invalid syntax (parse-time, like the reference panic)") {
    intercept[IllegalArgumentException](new Template(""))
    intercept[IllegalArgumentException](new Template("{{.Timestamp.{{.Body}}"))
    intercept[IllegalArgumentException](new Template("{{.Nope}}"))
  }

  private def payload = SignaturePayload("test-id", "test-topic", ts, body)

  test("rotation: no secrets -> no signatures") {
    val m = new SignatureManager(Nil)
    assert(m.generateSignatures(payload).isEmpty)
    assert(m.signatureHeader(payload) == "")
  }

  test("rotation: old latest secret still signs (signature_test.go '48 hours old')") {
    val now = Instant.now
    val m = new SignatureManager(Seq(WebhookSecret("old-latest", now.minusSeconds(48 * 3600))))
    assert(m.generateSignatures(payload, now).size == 1)
  }

  test("rotation: only the newest of several stale secrets signs") {
    val now = Instant.now
    val m = new SignatureManager(Seq(
      WebhookSecret("oldest", now.minusSeconds(96 * 3600)),
      WebhookSecret("older", now.minusSeconds(72 * 3600)),
      WebhookSecret("latest", now.minusSeconds(48 * 3600))))
    val sigs = m.generateSignatures(payload, now)
    assert(sigs.size == 1)
    assert(sigs.head == HmacSha256.sign("latest", body, HexEncoder))
  }

  test("rotation: latest + secrets inside the 24h window (signature_test.go 'multiple valid')") {
    val now = Instant.now
    val m = new SignatureManager(Seq(
      WebhookSecret("latest", now),
      WebhookSecret("recent1", now.minusSeconds(12 * 3600)),
      WebhookSecret("recent2", now.minusSeconds(20 * 3600)),
      WebhookSecret("expired", now.minusSeconds(25 * 3600))))
    val sigs = m.generateSignatures(payload, now)
    assert(sigs.size == 3, "latest + 2 recent, 25h-old dropped")
  }

  test("rotation: explicit invalidAt overrides the 24h window") {
    val now = Instant.now
    val m = new SignatureManager(Seq(
      WebhookSecret("latest", now),
      // 50h old but explicitly valid until tomorrow -> signs
      WebhookSecret("pinned", now.minusSeconds(50 * 3600),
        invalidAt = Some(now.plusSeconds(3600))),
      // 1h old but explicitly invalidated an hour ago -> dropped
      WebhookSecret("revoked", now.minusSeconds(3600),
        invalidAt = Some(now.minusSeconds(3600)))))
    assert(m.generateSignatures(payload, now).size == 2)
  }

  test("rotation: invalidated latest secret does not sign") {
    val now = Instant.now
    val m = new SignatureManager(Seq(
      WebhookSecret("latest", now, invalidAt = Some(now.minusSeconds(1))),
      WebhookSecret("older", now.minusSeconds(3600))))
    val sigs = m.generateSignatures(payload, now)
    assert(sigs == Seq(HmacSha256.sign("older", body, HexEncoder)))
  }

  test("default header renders v0=<sigs> and verify() round-trips") {
    val now = Instant.now
    val m = new SignatureManager(Seq(WebhookSecret("k1", now)))
    val header = m.signatureHeader(payload, now)
    assert(header == s"v0=${HmacSha256.sign("k1", body, HexEncoder)}")
    assert(m.verify(header.stripPrefix("v0="), "k1", payload))
  }

  test("standard webhooks: v1,<base64> over msgId.ts.body with decoded whsec key") {
    // ASCII key bytes so the String-keyed manager cross-check below is
    // byte-identical (whsec keys may be arbitrary bytes in general; the
    // StandardWebhooks object itself always uses the raw decoded bytes)
    val whsec = "whsec_" + java.util.Base64.getEncoder.encodeToString(
      "super-secret-key-bytes".getBytes("UTF-8"))
    val header = StandardWebhooks.signatureHeader(Seq(whsec), "msg_1", ts, body)
    assert(header.startsWith("v1,"))
    // base64 payload decodes to 32 bytes (sha256 mac)
    assert(java.util.Base64.getDecoder.decode(header.stripPrefix("v1,")).length == 32)
    assert(StandardWebhooks.verify(header, whsec, "msg_1", ts, body))
    assert(!StandardWebhooks.verify(header, whsec, "msg_2", ts, body))
    // independent construction: generic SignatureManager with the standard
    // content template + base64 encoding and the RAW DECODED KEY must agree
    val mgr = new SignatureManager(
      Seq(WebhookSecret(new String(StandardWebhooks.secretBytes(whsec), "ISO-8859-1"), ts)),
      HmacSha256, Base64Encoder,
      new Template(StandardWebhooks.ContentTemplate))
    val viaMgr = mgr.generateSignatures(
      SignaturePayload("msg_1", "t", ts, body), ts).head
    assert(header == s"v1,$viaMgr")
    // multiple secrets → space-joined v1 list (rotation window)
    val h2 = StandardWebhooks.signatureHeader(Seq(whsec, whsec), "msg_1", ts, body)
    assert(h2.split(' ').length == 2 && h2.split(' ').forall(_.startsWith("v1,")))
    // delivery headers carry id/timestamp/signature under the prefix
    val hs = StandardWebhooks.headers(Seq(whsec), "msg_1", ts, body)
    assert(hs("webhook-id") == "msg_1" && hs("webhook-timestamp") == "1234567890")
    assert(hs("webhook-signature") == header)
  }

  // ------------------------------------------------------------ partition key

  test("partition key JMESPath subset -> JsonPath") {
    assert(PartitionKey.toJsonPath("a.b") == Some("$.a.b"))
    assert(PartitionKey.toJsonPath("items[0].sku") == Some("$.items[0].sku"))
    assert(PartitionKey.toJsonPath("\"weird-key\".id") == Some("$['weird-key'].id"))
    assert(PartitionKey.toJsonPath("a | b").isEmpty) // pipes out of subset
    assert(PartitionKey.toJsonPath("a[*]").isEmpty) // projections out of subset
    assert(PartitionKey.toJsonPath("").isEmpty)
  }

  test("partition key evaluation: rendering + fallback (partitionkey.go:11-40)") {
    val p = """{"user":{"id":"u7","score":3.5,"n":1234567890,"ok":true,"none":null,"empty":""}}"""
    assert(PartitionKey.evaluate("user.id", p, "fb") == "u7")
    assert(PartitionKey.evaluate("user.score", p, "fb") == "3.5")
    // Go %g: shortest digits, scientific at exponent >= 6
    assert(PartitionKey.evaluate("user.n", p, "fb") == "1.23456789e+09")
    assert(PartitionKey.evaluate("user.ok", p, "fb") == "true")
    assert(PartitionKey.evaluate("user.none", p, "fb") == "fb") // null -> fallback
    assert(PartitionKey.evaluate("user.empty", p, "fb") == "fb") // "" -> fallback
    assert(PartitionKey.evaluate("user.missing", p, "fb") == "fb")
    assert(PartitionKey.evaluate("", p, "fb") == "fb")
    // beyond the fast subset, spec-legal templates run the FULL JMESPath
    // engine (the reference links all of go-jmespath)
    assert(PartitionKey.evaluate("a[*].b", p, "fb") == "fb") // null projection
    assert(PartitionKey.evaluate("user.* | [0]", p, "fb") == "u7")
    assert(PartitionKey.evaluate("user.id || user.missing", p, "fb") == "u7")
    assert(PartitionKey.evaluate("user.missing || user.id", p, "fb") == "u7")
    assert(PartitionKey.evaluate("length(user.id)", p, "fb") == "2")
    // LIBRARY contract (JsonNode form = partitionkey.go): errors THROW
    intercept[IllegalArgumentException](
      PartitionKey.evaluate("user.id[", JsonMatch.parse(p), "fb"))
    // CALLER contract (string form = destawskinesis.go:238-241): ANY
    // failure — syntax, runtime type error, null/unparseable payload —
    // falls back to the event id instead of aborting the query
    assert(PartitionKey.evaluate("user.id[", p, "fb") == "fb")
    assert(PartitionKey.evaluate("abs(user.id)", p, "fb") == "fb") // abs of string: eval-time type error
    assert(PartitionKey.evaluate("user.id", null: String, "fb") == "fb")
    assert(PartitionKey.evaluate("user.id", "not json", "fb") == "fb")
  }

  test("partition key: full-JMESPath templates in evaluate and Column form") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val p =
      """{"items":[{"sku":"a1","qty":2},{"sku":"b2","qty":0},{"sku":"c3","qty":5}],
        |"meta":{"region":"eu","tier":"gold"}}""".stripMargin.replace("\n", "")
    // filter projection + pipe; multiselect hash; sort_by; to_string
    assert(PartitionKey.evaluate("items[?qty>`1`].sku | [0]", p, "fb") == "a1")
    assert(PartitionKey.evaluate("join('-', items[*].sku)", p, "fb") == "a1-b2-c3")
    assert(PartitionKey.evaluate("sort_by(items, &qty)[-1].sku", p, "fb") == "c3")
    assert(PartitionKey.evaluate("meta.[region, tier] | join('_', @)", p, "fb") == "eu_gold")
    // %g rendering applies to full-engine numeric results too
    assert(PartitionKey.evaluate("sum(items[*].qty)", p, "fb") == "7")
    // Column form routes out-of-subset templates through the same engine
    val df = Seq(p, """{"items":[],"meta":{}}""").toDF("j")
    val got = df.select(PartitionKey.column(
      "items[?qty>`1`].sku | [0]", col("j"), lit("FB")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a1", "FB"))
    // syntax errors surface at query build, not per row
    intercept[graft.functions.JmesPath.JmesPathError](
      PartitionKey.column("items[", col("j"), lit("FB")))
    // spec-legal template with a RUNTIME type error (abs of a string) and a
    // null payload row: every row falls back, nothing aborts the query
    // (destawskinesis.go:238-241)
    val df2 = Seq(Some(p), Some("""{"meta":{"region":"eu"}}"""), None).toDF("j")
    val got2 = df2.select(PartitionKey.column("abs(meta.region)", col("j"), lit("FB")))
      .collect().map(_.getString(0)).toSeq
    assert(got2 == Seq("FB", "FB", "FB"))
    val got3 = df2.select(PartitionKey.column("meta.region", col("j"), lit("FB")))
      .collect().map(_.getString(0)).toSeq
    assert(got3 == Seq("eu", "eu", "FB"))
  }

  test("partition key: reference test table ported verbatim (partitionkey_test.go)") {
    // every case from the reference's own TestEvaluate, same expectations
    assert(PartitionKey.evaluate("", """{"key":"value"}""", "fallback-123") == "fallback-123")
    assert(PartitionKey.evaluate("metadata.topic",
      """{"metadata":{"topic":"test-topic"}}""", "fallback") == "test-topic")
    assert(PartitionKey.evaluate("data.user.id",
      """{"data":{"user":{"id":"user-456"}}}""", "fallback") == "user-456")
    // the join expression — a function + multiselect list + quoted identifier
    assert(PartitionKey.evaluate("""join('-', [metadata.topic, metadata."event-id"])""",
      """{"metadata":{"topic":"test-topic","event-id":"event-123"}}""",
      "fallback") == "test-topic-event-123")
    assert(PartitionKey.evaluate("metadata.nonexistent",
      """{"metadata":{"topic":"test"}}""", "fallback-123") == "fallback-123")
    intercept[IllegalArgumentException](
      PartitionKey.evaluate("metadata.topic[", JsonMatch.parse("""{}"""), "fallback"))
    assert(PartitionKey.evaluate("data.count",
      """{"data":{"count":123}}""", "fallback") == "123")
    assert(PartitionKey.evaluate("data.active",
      """{"data":{"active":true}}""", "fallback") == "true")
    assert(PartitionKey.evaluate("data.empty",
      """{"data":{"empty":""}}""", "fallback-123") == "fallback-123")
    // join with a missing/non-string element is an ERROR in go-jmespath
    // (library form throws; the string/caller form maps it to the fallback)
    intercept[IllegalArgumentException](
      PartitionKey.evaluate("join('-', [a, b])", JsonMatch.parse("""{"a":"x"}"""), "fb"))
    assert(PartitionKey.evaluate("join('-', [a, b])", """{"a":"x"}""", "fb") == "fb")
  }

  test("partition key join(): Column form matches the evaluator") {
    val spark2 = SparkTestBase.spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(
      """{"metadata":{"topic":"t1","event-id":"e1"}}""",
      """{"metadata":{"topic":"t2"}}""").toDF("j")
    val tmpl = """join('-', [metadata.topic, metadata."event-id"])"""
    val got = df.select(PartitionKey.column(tmpl, col("j"), lit("FB")))
      .collect().map(_.getString(0)).toSeq
    // row 2's missing element = reference evaluation error; the Kinesis
    // caller falls back to the event id, which the Column form mirrors
    assert(got == Seq("t1-e1", "FB"))
  }

  test("Go %g float rendering corners") {
    assert(PartitionKey.goG(100.0) == "100")
    assert(PartitionKey.goG(123456.0) == "123456")
    assert(PartitionKey.goG(1234567.0) == "1.234567e+06")
    assert(PartitionKey.goG(0.001) == "0.001")
    assert(PartitionKey.goG(0.00001) == "1e-05")
    assert(PartitionKey.goG(-2.5) == "-2.5")
    assert(PartitionKey.goG(3.0) == "3")
  }
}
