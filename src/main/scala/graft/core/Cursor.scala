package graft.core

import java.math.BigInteger
import java.nio.charset.StandardCharsets

/** Opaque keyset-pagination cursors.
  *
  * Reference: hookdeck/outpost `internal/cursor/cursor.go:22-80` — cursors
  * carry `(epoch-millis, id)` for a `(time, id)` composite sort key, encoded
  * `{resource}v{NN}:{base62(payload)}`. Decoding validates resource and
  * version and fails closed.
  */
object Cursor {
  /** Sort-key payload. The reference stores epoch-millis (its store is
    * ms-precision); our facts carry µs precision, so the cursor does too —
    * otherwise the seek predicate re-admits the boundary row. */
  final case class Key(micros: Long, id: String)

  private val Alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
  private val Base = BigInteger.valueOf(62)
  private val Version = "01"

  private def base62Encode(bytes: Array[Byte]): String = {
    var n = new BigInteger(1, bytes)
    if (n.signum == 0) return "0"
    val sb = new StringBuilder
    while (n.signum > 0) {
      val Array(q, r) = n.divideAndRemainder(Base)
      sb.append(Alphabet.charAt(r.intValue)); n = q
    }
    sb.reverseContents().toString
  }

  private def base62Decode(s: String): Array[Byte] = {
    var n = BigInteger.ZERO
    s.foreach { c =>
      val v = Alphabet.indexOf(c.toInt)
      if (v < 0) throw new IllegalArgumentException(s"bad base62 char: $c")
      n = n.multiply(Base).add(BigInteger.valueOf(v.toLong))
    }
    val raw = n.toByteArray
    if (raw.length > 1 && raw(0) == 0) raw.drop(1) else raw
  }

  def encode(resource: String, key: Key): String = {
    val payload = s"${key.micros}::${key.id}"
    s"${resource}v$Version:${base62Encode(payload.getBytes(StandardCharsets.UTF_8))}"
  }

  def decode(resource: String, cursor: String): Either[String, Key] = {
    val prefix = s"${resource}v$Version:"
    if (!cursor.startsWith(prefix)) Left(s"cursor does not match resource '$resource'")
    else try {
      val payload = new String(base62Decode(cursor.stripPrefix(prefix)), StandardCharsets.UTF_8)
      payload.split("::", 2) match {
        case Array(ms, id) => Right(Key(ms.toLong, id))
        case _ => Left("malformed cursor payload")
      }
    } catch { case e: Exception => Left(s"invalid cursor: ${e.getMessage}") }
  }
}
