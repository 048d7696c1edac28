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

  /** Credentials encryption at rest (reference
    * `tenantstore/redistenantstore/cipher.go:16-64`): AES-256-GCM, key
    * derived as the 32 hex chars of md5(secret), ciphertext laid out as
    * nonce ‖ ct ‖ tag. Spark's native `aes_encrypt`/`aes_decrypt` in GCM
    * mode produce EXACTLY that layout, so the Column forms are codegen'd
    * built-ins and the bytes interoperate with the reference store —
    * secrets written by one are readable by the other. */
  object Credentials {
    def derivedKey(secret: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(secret.getBytes("UTF-8")).map("%02x".format(_)).mkString

    /** Encrypt a string column → binary (random nonce per row). */
    def encrypt(c: Column, secret: String): Column =
      org.apache.spark.sql.functions.aes_encrypt(
        c.cast("binary"), org.apache.spark.sql.functions.lit(derivedKey(secret)),
        org.apache.spark.sql.functions.lit("GCM"))

    /** Decrypt back to string; tampered/foreign ciphertexts yield NULL
      * (`try_aes_decrypt`) instead of failing the whole scan. */
    def decrypt(c: Column, secret: String): Column =
      org.apache.spark.sql.functions.try_aes_decrypt(
        c, org.apache.spark.sql.functions.lit(derivedKey(secret)),
        org.apache.spark.sql.functions.lit("GCM")).cast("string")

    /** Driver-side twins (javax.crypto), byte-compatible with the Column
      * forms and the reference cipher. */
    def encryptBytes(plain: Array[Byte], secret: String): Array[Byte] = {
      val key = new javax.crypto.spec.SecretKeySpec(derivedKey(secret).getBytes("UTF-8"), "AES")
      val nonce = new Array[Byte](12)
      new java.security.SecureRandom().nextBytes(nonce)
      val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
      cipher.init(javax.crypto.Cipher.ENCRYPT_MODE, key,
        new javax.crypto.spec.GCMParameterSpec(128, nonce))
      nonce ++ cipher.doFinal(plain)
    }

    def decryptBytes(enc: Array[Byte], secret: String): Array[Byte] = {
      val key = new javax.crypto.spec.SecretKeySpec(derivedKey(secret).getBytes("UTF-8"), "AES")
      val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
      cipher.init(javax.crypto.Cipher.DECRYPT_MODE, key,
        new javax.crypto.spec.GCMParameterSpec(128, enc.take(12)))
      cipher.doFinal(enc.drop(12))
    }
  }
}
