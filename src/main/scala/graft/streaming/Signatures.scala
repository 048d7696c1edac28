package graft.streaming

import java.time.Instant
import graft.functions.Crypto

/** Webhook signature scheme: algorithm × encoding × content/header templates
  * × secret rotation (reference: hookdeck/outpost
  * `destwebhook/signature.go:117-275`, defaults `destwebhook.go:28-30`).
  *
  * The reference renders signature content and header through Go
  * `text/template`; here the same surface is a small deterministic template
  * subset (the variables its config documents and tests exercise:
  * `{{.Body}}`, `{{.EventID}}`, `{{.Topic}}`, `{{.Timestamp.Unix}}`,
  * `{{.Signatures | join "SEP"}}`) — validated at construction like the
  * reference's parse-time panic, rendered with plain string substitution.
  * Driver-side objects: signing happens in the sink stage per delivered
  * message (not an analytical hot path), so no Column form is needed beyond
  * [[Crypto]]'s.
  */
object Signatures {

  final case class WebhookSecret(key: String, createdAt: Instant,
                                 invalidAt: Option[Instant] = None)

  final case class SignaturePayload(eventId: String, topic: String,
                                    timestamp: Instant, body: String)

  /** Signature encodings (signature.go:49-61). */
  sealed trait Encoder extends Serializable { def encode(b: Array[Byte]): String }
  case object HexEncoder extends Encoder {
    def encode(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
  }
  case object Base64Encoder extends Encoder {
    def encode(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)
  }

  /** HMAC algorithms (signature.go:117-145): name is the config value. */
  sealed abstract class Algo(val name: String, private[Signatures] val jce: String)
    extends Serializable {
    def sign(key: String, content: String, enc: Encoder): String =
      enc.encode(Crypto.hmac(jce, key.getBytes("UTF-8"), content.getBytes("UTF-8")))
    def verify(key: String, content: String, signature: String, enc: Encoder): Boolean =
      java.security.MessageDigest.isEqual(
        sign(key, content, enc).getBytes("UTF-8"), signature.getBytes("UTF-8"))
  }
  case object HmacSha256 extends Algo("hmac-sha256", "HmacSHA256")
  case object HmacSha1 extends Algo("hmac-sha1", "HmacSHA1")
  case object HmacMd5 extends Algo("hmac-md5", "HmacMD5")

  val Algos: Map[String, Algo] =
    Seq(HmacSha256, HmacSha1, HmacMd5).map(a => a.name -> a).toMap

  /** Reference defaults (destwebhook.go:28-29). */
  val DefaultSignatureContentTemplate = "{{.Body}}"
  val DefaultSignatureHeaderTemplate = """v0={{.Signatures | join ","}}"""

  private val TokenRe =
    """\{\{\.(Body|EventID|Topic|Timestamp\.Unix|Signatures)(\s*\|\s*join\s*"([^"]*)")?\}\}""".r

  /** Template subset: literal text + the tokens above. Invalid syntax (an
    * unterminated or unknown token) throws at construction, mirroring the
    * reference's parse-time panic. */
  final class Template(val templateStr: String) extends Serializable {
    require(templateStr.nonEmpty,
      "signature template is required — config must provide an explicit value")
    // every "{{" must start a recognized token
    private def validate(): Unit = {
      var i = templateStr.indexOf("{{")
      while (i >= 0) {
        TokenRe.findPrefixMatchOf(templateStr.substring(i)) match {
          case Some(m) => i = templateStr.indexOf("{{", i + m.end)
          case None => throw new IllegalArgumentException(
            s"invalid signature template ${templateStr}: bad token at offset $i")
        }
      }
    }
    validate()

    def render(eventId: String, topic: String, timestamp: Instant,
               body: String, signatures: Seq[String]): String =
      TokenRe.replaceAllIn(templateStr, m => java.util.regex.Matcher.quoteReplacement(
        m.group(1) match {
          case "Body" => body
          case "EventID" => eventId
          case "Topic" => topic
          case "Timestamp.Unix" => timestamp.getEpochSecond.toString
          case "Signatures" => signatures.mkString(Option(m.group(3)).getOrElse(""))
        }))
  }

  /** The Standard Webhooks profile (reference `destwebhookstandard/
    * destwebhookstandard.go:220-233`): secrets are `whsec_<base64>` with the
    * DECODED bytes as the HMAC key, signed content is
    * `{msgId}.{unixSeconds}.{body}`, and the header is the space-joined
    * `v1,<base64sig>` list alongside `<prefix>id` / `<prefix>timestamp`
    * headers (prefix `webhook-` in standard mode). */
  object StandardWebhooks {
    val ContentTemplate = "{{.EventID}}.{{.Timestamp.Unix}}.{{.Body}}"
    val DefaultHeaderPrefix = "webhook-"

    def secretBytes(whsec: String): Array[Byte] =
      java.util.Base64.getDecoder.decode(whsec.stripPrefix("whsec_"))

    def sign(whsec: String, msgId: String, timestamp: Instant, body: String): String =
      "v1," + Base64Encoder.encode(Crypto.hmac("HmacSHA256", secretBytes(whsec),
        s"$msgId.${timestamp.getEpochSecond}.$body".getBytes("UTF-8")))

    def signatureHeader(whsecs: Seq[String], msgId: String,
                        timestamp: Instant, body: String): String =
      whsecs.map(sign(_, msgId, timestamp, body)).mkString(" ")

    def verify(signatureHeader: String, whsec: String, msgId: String,
               timestamp: Instant, body: String): Boolean = {
      val expect = sign(whsec, msgId, timestamp, body)
      signatureHeader.split(' ').exists(s =>
        java.security.MessageDigest.isEqual(s.getBytes("UTF-8"), expect.getBytes("UTF-8")))
    }

    /** Delivery headers (`destwebhookstandard.go:595-612`). */
    def headers(whsecs: Seq[String], msgId: String, timestamp: Instant,
                body: String, prefix: String = DefaultHeaderPrefix): Map[String, String] =
      Map(
        s"${prefix}id" -> msgId,
        s"${prefix}timestamp" -> timestamp.getEpochSecond.toString,
        s"${prefix}signature" -> signatureHeader(whsecs, msgId, timestamp, body))
  }

  /** Signing + rotation policy (signature.go:216-275): sign with the newest
    * valid secret, plus any older secret still inside its validity window
    * (explicit `invalidAt`, or a 24 h grace period after rotation). */
  final class SignatureManager(secrets: Seq[WebhookSecret],
                               algo: Algo = HmacSha256,
                               encoder: Encoder = HexEncoder,
                               contentTemplate: Template = new Template(DefaultSignatureContentTemplate),
                               headerTemplate: Template = new Template(DefaultSignatureHeaderTemplate))
    extends Serializable {

    def generateSignatures(p: SignaturePayload, now: Instant = Instant.now): Seq[String] = {
      if (secrets.isEmpty) return Seq.empty
      val sorted = secrets.sortBy(_.createdAt).reverse // newest first
      val content =
        contentTemplate.render(p.eventId, p.topic, p.timestamp, p.body, Nil)
      val latest = sorted.head
      val head =
        if (latest.invalidAt.forall(now.isBefore)) // no invalidAt, or still valid
          Seq(algo.sign(latest.key, content, encoder))
        else Seq.empty
      val rest = sorted.tail.filter { s =>
        s.invalidAt match {
          case Some(inv) => !now.isAfter(inv)
          case None => java.time.Duration.between(s.createdAt, now).toHours < 24
        }
      }.map(s => algo.sign(s.key, content, encoder))
      head ++ rest
    }

    def signatureHeader(p: SignaturePayload, now: Instant = Instant.now): String = {
      val sigs = generateSignatures(p, now)
      if (sigs.isEmpty) ""
      else headerTemplate.render(p.eventId, p.topic, p.timestamp, "", sigs)
    }

    def verify(signature: String, key: String, p: SignaturePayload): Boolean = {
      val content =
        contentTemplate.render(p.eventId, p.topic, p.timestamp, p.body, Nil)
      algo.verify(key, content, signature, encoder)
    }
  }
}
