package graft.functions

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Webhook-signature crypto (reference: hookdeck/outpost
  * `internal/destregistry/providers/destwebhook/signature.go:52-159` —
  * HMAC-SHA256/SHA1 over the delivery body, hex or base64 encoded).
  *
  * UDF-based (JDK `javax.crypto`): signing happens once per delivered
  * message in the sink stage, not in an analytical hot path, so a UDF is the
  * right cost point; `Mac` instances are created per call for thread safety
  * (cheap relative to the network write they accompany).
  */
object Crypto {

  def hmacHex(algorithm: String, key: Array[Byte], content: Array[Byte]): String =
    hmac(algorithm, key, content).map("%02x".format(_)).mkString

  def hmacBase64(algorithm: String, key: Array[Byte], content: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(hmac(algorithm, key, content))

  def hmac(algorithm: String, key: Array[Byte], content: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance(algorithm)
    mac.init(new SecretKeySpec(key, algorithm))
    mac.doFinal(content)
  }

  /** hex(HMAC-SHA256(key, content)) as a Column. */
  def hmacSha256Hex(key: String): Column => Column = {
    val f = udf((content: String) =>
      if (content == null) null
      else hmacHex("HmacSHA256", key.getBytes("UTF-8"), content.getBytes("UTF-8")))
    (c: Column) => f(c)
  }
}
