package graft

import java.sql.Timestamp
import graft.functions.Crypto
import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

class CryptoTemporalSpec extends GraftSuite {

  test("credentials cipher: Column and JVM forms interoperate, tamper yields NULL") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val secret = "tenant-secret"
    // Column encrypt -> Column decrypt roundtrip
    val df = Seq("api_key_12345", """{"user":"u","pass":"p"}""").toDF("cred")
    val round = df.select(Crypto.Credentials.decrypt(
      Crypto.Credentials.encrypt(col("cred"), secret), secret).as("back"),
      col("cred"))
    assert(round.collect().forall(r => r.getString(0) == r.getString(1)))
    // JVM-encrypted bytes decrypt through the Spark column (nonce‖ct‖tag layout)
    val enc = Crypto.Credentials.encryptBytes("hello".getBytes("UTF-8"), secret)
    val viaSpark = Seq(enc).toDF("e")
      .select(Crypto.Credentials.decrypt(col("e"), secret)).head().getString(0)
    assert(viaSpark == "hello")
    // and Spark-encrypted bytes decrypt in the JVM
    val sparkEnc = Seq("world").toDF("c")
      .select(Crypto.Credentials.encrypt(col("c"), secret)).head().getAs[Array[Byte]](0)
    assert(new String(Crypto.Credentials.decryptBytes(sparkEnc, secret), "UTF-8") == "world")
    // tampered ciphertext and wrong secret both yield NULL, not a scan failure
    val tampered = enc.clone(); tampered(tampered.length - 1) = (tampered.last ^ 1).toByte
    val bad = Seq(tampered).toDF("e")
      .select(Crypto.Credentials.decrypt(col("e"), secret),
        Crypto.Credentials.decrypt(col("e"), "wrong")).head()
    assert(bad.isNullAt(0) && bad.isNullAt(1))
    // key derivation matches the reference (hex md5, 32 ASCII bytes)
    assert(Crypto.Credentials.derivedKey("secret") == "5ebe2294ecd0e0f08eab7690d2a6ee69")
  }

  test("HMAC-SHA256 matches RFC 4231 test case 2") {
    // public vector: key "Jefe", data "what do ya want for nothing?"
    val got = Crypto.hmacHex("HmacSHA256", "Jefe".getBytes("UTF-8"),
      "what do ya want for nothing?".getBytes("UTF-8"))
    assert(got == "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }

  test("HMAC-SHA1 + base64 shapes") {
    val h = Crypto.hmac("HmacSHA1", Array[Byte](1, 2, 3), Array[Byte](4, 5, 6))
    assert(h.length == 20)
    assert(Crypto.hmacBase64("HmacSHA1", Array[Byte](1), Array[Byte](2)).nonEmpty)
  }

  test("hmac column form is deterministic") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq("payload-a", "payload-b").toDF("body")
    val sign = Crypto.hmacSha256Hex("secret")
    val sigs = df.select(sign(col("body"))).collect().map(_.getString(0))
    assert(sigs.distinct.length == 2 && sigs.forall(_.length == 64))
  }

  test("asofJoin: exact-ts match, no-prior-row null, latest-wins") {
    val spark2 = spark
    import spark2.implicits._
    def ts(s: Long) = new Timestamp(1704067200000L + s * 1000)
    val left = Seq((1L, "u1", ts(10)), (2L, "u1", ts(5)), (3L, "u2", ts(10)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", ts(5), 100L), ("u1", ts(8), 101L), ("u3", ts(1), 102L))
      .toDF("user_id", "ts", "click_id")
    val out = TemporalJoins.asofJoin(left, right, Seq("user_id"), "ts", "ts", Seq("click_id"))
      .select("event_id", "asof_click_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(1L) == Some(101L)) // latest at-or-before ts(10)
    assert(out(2L) == Some(100L)) // exact-ts match counts (<=)
    assert(out(3L) == None)       // u2 has no clicks
  }

  test("rangeJoinPairs finds exactly the in-window pairs across bucket edges") {
    val spark2 = spark
    import spark2.implicits._
    def ts(ms: Long) = new Timestamp(1704067200000L + ms)
    // pairs straddling the 60s bucket boundary must still be found
    val df = Seq((1L, "u", ts(0)), (2L, "u", ts(59999)), (3L, "u", ts(60001)),
      (4L, "u", ts(200000)), (5L, "v", ts(100)))
      .toDF("event_id", "user_id", "ts")
    val got = TemporalJoins.rangeJoinPairs(df, "user_id", "ts", "event_id", 60000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2): 59999ms in-window; (2,3): 2ms across the bucket edge;
    // (1,3): 60001ms just out; (4): isolated; (5): other key
    assert(got == Set((1L, 2L), (2L, 3L)))
  }
}
