package graft.api

/** Per-provider destination `config`/`credentials` field schemas — the
  * create-time validation the reference drives from packaged JSON metadata
  * (`internal/destregistry/metadata/loader.go`, field semantics in
  * `baseprovider.go:97-190` Validate/validateField) plus the per-provider
  * value checks layered on top of it (`destkafka.go:51-81` SASL mechanism +
  * TLS literal, `destrabbitmq.go:42-60` TLS literal).
  *
  * Why this exists: without create-time schema validation a malformed
  * webhook URL or a Kafka destination missing `bootstrap` only fails at
  * DELIVERY time — the reference 422s at the API instead, and so do we.
  * The registry is static data (10 providers, ~40 fields): a driver-side
  * map, no Spark involvement — validation must run per API call, not per
  * row.
  *
  * Validation order mirrors the reference exactly: every config field in
  * metadata order, then every credential field; first error per field;
  * error types `required` / `type` / `min` / `max` / `minlength` /
  * `maxlength` / `pattern` from the base validator and `invalid` from the
  * per-provider value checks.
  */
object DestMetadata {

  /** One field of a provider's config or credentials schema
    * (`metadata/types.go:31-47` FieldSchema — the validation-relevant
    * subset; display-only attributes like label/description are kept where
    * they aid the served `GET /destination-types/{type}` payload). */
  final case class FieldSpec(
      key: String,
      ftype: String, // text | number | checkbox | select | key_value_map
      required: Boolean,
      label: String = "",
      default: Option[String] = None,
      sensitive: Boolean = false,
      pattern: Option[String] = None,
      min: Option[Int] = None,
      max: Option[Int] = None,
      minLength: Option[Int] = None,
      maxLength: Option[Int] = None,
      options: Seq[String] = Nil)

  final case class ProviderSpec(
      tpe: String,
      label: String,
      configFields: Seq[FieldSpec],
      credentialFields: Seq[FieldSpec])

  /** field path → error type, in reference order. */
  final case class ValidationError(field: String, errType: String)

  private def url = Some("^https?:\\/\\/[^\\s]+$")

  /** The ten providers packaged with the reference
    * (`metadata/providers/<type>/metadata.json`, one row here per file). */
  val providers: Map[String, ProviderSpec] = Seq(
    ProviderSpec("webhook", "Webhook",
      configFields = Seq(
        FieldSpec("url", "text", required = true, label = "URL", pattern = url),
        FieldSpec("custom_headers", "key_value_map", required = false,
          label = "Custom Headers")),
      credentialFields = Nil),
    // webhook_standard shares webhook's schema (the reference's second
    // webhook flavour differs in signing, not in config shape)
    ProviderSpec("webhook_standard", "Webhook (standard signature)",
      configFields = Seq(
        FieldSpec("url", "text", required = true, label = "URL", pattern = url),
        FieldSpec("custom_headers", "key_value_map", required = false,
          label = "Custom Headers")),
      credentialFields = Nil),
    ProviderSpec("kafka", "Kafka",
      configFields = Seq(
        FieldSpec("brokers", "text", required = true, label = "Brokers"),
        FieldSpec("topic", "text", required = true, label = "Topic"),
        FieldSpec("tls", "checkbox", required = false, label = "TLS",
          default = Some("true")),
        FieldSpec("partition_key_template", "text", required = false,
          label = "Partition Key Template"),
        FieldSpec("sasl_mechanism", "select", required = true,
          label = "SASL Mechanism",
          options = Seq("plain", "scram-sha-256", "scram-sha-512"))),
      credentialFields = Seq(
        FieldSpec("username", "text", required = true, label = "Username"),
        FieldSpec("password", "text", required = true, label = "Password",
          sensitive = true))),
    ProviderSpec("rabbitmq", "RabbitMQ",
      configFields = Seq(
        FieldSpec("server_url", "text", required = true, label = "Server URL",
          pattern = Some("^[^\\s]+$")),
        FieldSpec("exchange", "text", required = false, label = "Exchange"),
        FieldSpec("tls", "checkbox", required = false, label = "TLS",
          default = Some("on"))),
      credentialFields = Seq(
        FieldSpec("username", "text", required = true, label = "Username"),
        FieldSpec("password", "text", required = true, label = "Password",
          sensitive = true))),
    ProviderSpec("aws_sqs", "AWS SQS",
      configFields = Seq(
        FieldSpec("queue_url", "text", required = true, label = "Queue URL",
          pattern = url)),
      credentialFields = Seq(
        FieldSpec("key", "text", required = true, label = "Access Key ID"),
        FieldSpec("secret", "text", required = true, label = "Secret Access Key",
          sensitive = true),
        FieldSpec("session", "text", required = false, label = "Session Token",
          sensitive = true))),
    ProviderSpec("aws_kinesis", "AWS Kinesis",
      configFields = Seq(
        FieldSpec("stream_name", "text", required = true, label = "Stream Name",
          pattern = Some("^[a-zA-Z0-9_.-]+$")),
        FieldSpec("region", "text", required = true, label = "Region",
          pattern = Some("^[a-z]{2}-[a-z]+-[0-9]+$")),
        FieldSpec("endpoint", "text", required = false, label = "Endpoint",
          pattern = url),
        FieldSpec("partition_key_template", "text", required = false,
          label = "Partition Key Template")),
      credentialFields = Seq(
        FieldSpec("key", "text", required = true, label = "Access Key ID"),
        FieldSpec("secret", "text", required = true, label = "Secret Access Key",
          sensitive = true),
        FieldSpec("session", "text", required = false, label = "Session Token",
          sensitive = true))),
    ProviderSpec("aws_s3", "AWS S3",
      configFields = Seq(
        FieldSpec("bucket", "text", required = true, label = "Bucket"),
        FieldSpec("region", "text", required = true, label = "Region",
          pattern = Some("^[a-z]{2}-[a-z]+-[0-9]+$")),
        FieldSpec("key_template", "text", required = false,
          label = "Key Template"),
        FieldSpec("storage_class", "text", required = false,
          label = "Storage Class", default = Some("STANDARD"))),
      credentialFields = Seq(
        FieldSpec("key", "text", required = true, label = "Access Key ID"),
        FieldSpec("secret", "text", required = true, label = "Secret Access Key",
          sensitive = true),
        FieldSpec("session", "text", required = false, label = "Session Token",
          sensitive = true))),
    ProviderSpec("azure_servicebus", "Azure Service Bus",
      configFields = Seq(
        FieldSpec("name", "text", required = true, label = "Queue/Topic Name",
          pattern = Some("^[a-zA-Z0-9]([a-zA-Z0-9._-]*[a-zA-Z0-9])?$"))),
      credentialFields = Seq(
        FieldSpec("connection_string", "text", required = true,
          label = "Connection String", sensitive = true))),
    ProviderSpec("gcp_pubsub", "GCP Pub/Sub",
      configFields = Seq(
        FieldSpec("project_id", "text", required = true, label = "Project ID"),
        FieldSpec("topic", "text", required = true, label = "Topic"),
        FieldSpec("endpoint", "text", required = false, label = "Endpoint")),
      credentialFields = Seq(
        FieldSpec("service_account_json", "text", required = true,
          label = "Service Account JSON", sensitive = true))),
    ProviderSpec("hookdeck", "Hookdeck Event Gateway",
      configFields = Nil,
      credentialFields = Seq(
        FieldSpec("token", "text", required = true, label = "Token",
          sensitive = true)))
  ).map(p => p.tpe -> p).toMap

  /** `baseprovider.go:129-190` validateField: required → number
    * type/min/max → string minlength/maxlength/pattern. Empty string ≡
    * absent (the reference reads the zero value out of the map). */
  private def validateField(f: FieldSpec, value: Option[String],
                            path: String): Option[ValidationError] = {
    val v = value.getOrElse("")
    if (v.isEmpty)
      return if (f.required) Some(ValidationError(path, "required")) else None
    if (f.ftype == "number") {
      val num = v.toIntOption.getOrElse(
        return Some(ValidationError(path, "type")))
      if (f.min.exists(num < _)) return Some(ValidationError(path, "min"))
      if (f.max.exists(num > _)) return Some(ValidationError(path, "max"))
      return None
    }
    if (f.minLength.exists(v.length < _))
      return Some(ValidationError(path, "minlength"))
    if (f.maxLength.exists(v.length > _))
      return Some(ValidationError(path, "maxlength"))
    if (f.pattern.exists(p => !p.r.findFirstIn(v).isDefined))
      return Some(ValidationError(path, "pattern"))
    None
  }

  /** TLS literal check the kafka/rabbitmq providers layer on top of the
    * base validator (`destkafka.go:69-80`, `destrabbitmq.go:47-58`). */
  private def tlsCheck(config: Map[String, String]): Option[ValidationError] =
    config.get("tls").filter(_.nonEmpty) match {
      case Some(v) if v != "on" && v != "true" && v != "false" =>
        Some(ValidationError("config.tls", "invalid"))
      case _ => None
    }

  /** Validate a destination's config+credentials against its provider
    * schema. Returns Nil when valid; unknown provider type yields a single
    * ("type", "invalid_type") error (`baseprovider.go:99-104`). Select
    * fields enforce their option list the way the kafka provider does
    * (`destkafka.go:56-67` — type "invalid"). */
  def validate(tpe: String, config: Map[String, String],
               credentials: Map[String, String]): Seq[ValidationError] =
    providers.get(tpe) match {
      case None => Seq(ValidationError("type", "invalid_type"))
      case Some(p) =>
        val base =
          p.configFields.flatMap(f =>
            validateField(f, config.get(f.key), s"config.${f.key}")) ++
          p.credentialFields.flatMap(f =>
            validateField(f, credentials.get(f.key), s"credentials.${f.key}"))
        if (base.nonEmpty) base
        else {
          val selects = p.configFields.filter(_.ftype == "select").flatMap { f =>
            config.get(f.key).filter(_.nonEmpty) match {
              case Some(v) if !f.options.contains(v) =>
                Some(ValidationError(s"config.${f.key}", "invalid"))
              case _ => None
            }
          }
          val tls =
            if (p.configFields.exists(_.ftype == "checkbox")) tlsCheck(config)
            else None
          selects ++ tls.toSeq
        }
    }
}
