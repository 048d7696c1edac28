package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import org.apache.spark.sql.DataFrame

/** KAFKA WIRE ROUND-TRIP for the Kafka sink — the last member of the
  * wire-mock family ([[SqsWire]], [[CloudWire]], [[AmqpWire]],
  * [[Amqp10Wire]]): the renderer's record rows (reference
  * `destkafka/destkafka.go:209-258` — topic from config, key = evaluated
  * partition key, value = raw event payload, headers = delivery
  * metadata + content-type) are produced over a REAL socket speaking the
  * public Kafka protocol: ApiVersions (key 18 v0) to negotiate,
  * Metadata (key 3 v1) to discover the topic's partitions, then
  * Produce (key 0 v3) carrying a record-batch v2 whose CRC32C the
  * broker VERIFIES — a corrupted batch is rejected with CORRUPT_MESSAGE,
  * proving the integrity check is real (the Kafka analogue of the SQS
  * MD5 echoes).
  *
  * All three API versions are pre-flexible (no compact/tagged-field
  * encodings): fixed big-endian primitives + int16-length strings +
  * int32-count arrays, exactly as published in the Kafka protocol guide.
  *
  * Partition routing matches the reference's `Balancer: &kafka.Hash{}`
  * (destkafka.go:115): FNV-1a 32-bit over the key bytes, positive
  * modulo the partition count — so a keyed workload lands on the same
  * partition here and there.
  *
  * Scale shape: one connection per Spark partition (brokers want few
  * long-lived connections), ONE Produce request per partition carrying
  * one record batch per topic-partition — the request count is
  * O(Spark partitions), not O(records). */
object KafkaWire {

  // ---- varint / zigzag (record-batch v2 interior encoding) ----
  private[graft] def writeVarLong(out: DataOutputStream, v: Long): Unit = {
    var z = (v << 1) ^ (v >> 63) // zigzag
    while ((z & ~0x7FL) != 0L) {
      out.writeByte(((z & 0x7F) | 0x80).toInt); z >>>= 7
    }
    out.writeByte(z.toInt)
  }
  private[streaming] def writeVarInt(out: DataOutputStream, v: Int): Unit =
    writeVarLong(out, v.toLong)
  private[graft] def readVarLong(b: java.nio.ByteBuffer): Long = {
    var z = 0L; var shift = 0
    var cur = 0x80
    while ((cur & 0x80) != 0) {
      cur = b.get() & 0xFF
      z |= (cur & 0x7FL) << shift; shift += 7
    }
    (z >>> 1) ^ -(z & 1) // un-zigzag
  }
  private[streaming] def readVarInt(b: java.nio.ByteBuffer): Int =
    readVarLong(b).toInt

  /** FNV-1a 32-bit — the kafka-go `Hash` balancer's default hash; the
    * reference routes by hash(key) mod partitions (destkafka.go:115). */
  private[graft] def fnv1aPartition(key: Array[Byte], n: Int): Int = {
    var h = 0x811c9dc5
    key.foreach { b => h ^= (b & 0xFF); h *= 0x01000193 }
    if (n <= 1) 0 else (h & 0x7fffffff) % n
  }

  /** One wire record: (key, value, headers). Header values are bytes on
    * the wire (the reference writes metadata strings UTF-8). */
  private[graft] type Rec =
    (Array[Byte], Array[Byte], Seq[(String, Array[Byte])])

  /** Encode a record-batch v2 (magic 2): baseOffset 0, producer fields
    * -1 (idempotence off, like the reference writer), attributes 0
    * (uncompressed, create-time). The CRC32C covers everything AFTER the
    * crc field (attributes → end), per the published format.
    * `corruptCrc` is the test hook proving broker-side verification. */
  private[streaming] def encodeBatch(records: Seq[Rec], baseTimestamp: Long,
                                     corruptCrc: Boolean = false): Array[Byte] = {
    require(records.nonEmpty, "empty record batch")
    // interior: attributes..records (the CRC-covered span)
    val bos = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeShort(0)                   // attributes
    d.writeInt(records.size - 1)      // lastOffsetDelta
    d.writeLong(baseTimestamp)        // baseTimestamp
    d.writeLong(baseTimestamp)        // maxTimestamp (all deltas 0)
    d.writeLong(-1L)                  // producerId
    d.writeShort(-1)                  // producerEpoch
    d.writeInt(-1)                    // baseSequence
    d.writeInt(records.size)
    records.zipWithIndex.foreach { case ((key, value, headers), i) =>
      val rbos = new java.io.ByteArrayOutputStream()
      val r = new DataOutputStream(rbos)
      r.writeByte(0)                  // record attributes
      writeVarLong(r, 0L)             // timestampDelta
      writeVarInt(r, i)               // offsetDelta
      if (key == null) writeVarInt(r, -1)
      else { writeVarInt(r, key.length); r.write(key) }
      if (value == null) writeVarInt(r, -1)
      else { writeVarInt(r, value.length); r.write(value) }
      writeVarInt(r, headers.size)
      headers.foreach { case (hk, hv) =>
        val kb = hk.getBytes("UTF-8")
        writeVarInt(r, kb.length); r.write(kb)
        if (hv == null) writeVarInt(r, -1)
        else { writeVarInt(r, hv.length); r.write(hv) }
      }
      r.flush()
      writeVarInt(d, rbos.size())
      d.write(rbos.toByteArray)
    }
    d.flush()
    val interior = bos.toByteArray
    val crc = new java.util.zip.CRC32C()
    crc.update(interior)
    val crcVal =
      if (corruptCrc) crc.getValue ^ 0xDEADBEEFL else crc.getValue
    // envelope: baseOffset, batchLength, partitionLeaderEpoch, magic, crc
    val out = new java.io.ByteArrayOutputStream()
    val e = new DataOutputStream(out)
    e.writeLong(0L)                              // baseOffset
    e.writeInt(4 + 1 + 4 + interior.length)      // bytes after this field
    e.writeInt(-1)                               // partitionLeaderEpoch
    e.writeByte(2)                               // magic
    e.writeInt(crcVal.toInt)                     // crc (uint32)
    e.write(interior)
    e.flush()
    out.toByteArray
  }

  /** Decode a record-batch v2 and REVERIFY its CRC32C — the broker-side
    * half. Returns (crcOk, records). A structurally unparsable batch
    * throws; a parse-clean batch with a bad digest returns crcOk=false
    * (CORRUPT_MESSAGE territory, not a protocol error). */
  private[streaming] def decodeBatch(bytes: Array[Byte]): (Boolean, Seq[Rec]) = {
    val b = java.nio.ByteBuffer.wrap(bytes)
    b.getLong                                    // baseOffset
    val batchLen = b.getInt
    require(batchLen == bytes.length - 12,
      s"batchLength $batchLen != ${bytes.length - 12}")
    b.getInt                                     // partitionLeaderEpoch
    require(b.get() == 2, "record batch magic must be 2")
    val crcStored = b.getInt.toLong & 0xFFFFFFFFL
    val interior = new Array[Byte](b.remaining())
    b.mark(); b.get(interior); b.reset()
    val crc = new java.util.zip.CRC32C()
    crc.update(interior)
    val crcOk = crc.getValue == crcStored
    b.getShort                                   // attributes
    b.getInt                                     // lastOffsetDelta
    b.getLong; b.getLong                         // base/max timestamp
    b.getLong; b.getShort; b.getInt              // producer id/epoch/seq
    val n = b.getInt
    val recs = (0 until n).map { _ =>
      val len = readVarInt(b)
      val end = b.position() + len
      b.get()                                    // record attributes
      readVarLong(b)                             // timestampDelta
      readVarInt(b)                              // offsetDelta
      def bytesField(): Array[Byte] = {
        val l = readVarInt(b)
        if (l < 0) null
        else { val a = new Array[Byte](l); b.get(a); a }
      }
      val key = bytesField()
      val value = bytesField()
      val hn = readVarInt(b)
      val headers = (0 until hn).map { _ =>
        val kl = readVarInt(b)
        val ka = new Array[Byte](kl); b.get(ka)
        (new String(ka, "UTF-8"), bytesField())
      }
      require(b.position() == end, "record length mismatch")
      (key, value, headers)
    }
    (crcOk, recs)
  }

  /** Split a Fetch record set into its batches: each is baseOffset(8) +
    * batchLength(4) + batchLength bytes. A truncated tail (brokers may
    * cut the last batch at max_bytes) is dropped, per protocol. */
  private[streaming] def splitBatches(set: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    while (set.length - pos >= 12) {
      val len = java.nio.ByteBuffer.wrap(set, pos + 8, 4).getInt
      if (len < 0 || pos + 12 + len > set.length) pos = set.length // truncated
      else {
        out += java.util.Arrays.copyOfRange(set, pos, pos + 12 + len)
        pos += 12 + len
      }
    }
    out.result()
  }

  // ---- request/response framing (pre-flexible versions) ----
  private[streaming] def writeString(d: DataOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8"); d.writeShort(b.length); d.write(b)
  }
  private[streaming] def writeNullableString(d: DataOutputStream,
                                             s: String): Unit =
    if (s == null) d.writeShort(-1) else writeString(d, s)
  private[streaming] def readString(b: java.nio.ByteBuffer): String = {
    val n = b.getShort.toInt
    if (n < 0) null
    else { val a = new Array[Byte](n); b.get(a); new String(a, "UTF-8") }
  }

  /** size ∥ api_key ∥ api_version ∥ correlation_id ∥ client_id ∥ body */
  private def send(out: DataOutputStream, apiKey: Int, version: Int,
                   corrId: Int, body: Array[Byte]): Unit = {
    val h = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(h)
    d.writeShort(apiKey); d.writeShort(version); d.writeInt(corrId)
    writeNullableString(d, "graft")
    d.flush()
    out.writeInt(h.size() + body.length)
    out.write(h.toByteArray); out.write(body); out.flush()
  }

  /** Read one response; require the echoed correlation id. */
  private def recv(in: DataInputStream, corrId: Int): java.nio.ByteBuffer = {
    val size = in.readInt()
    val a = new Array[Byte](size)
    in.readFully(a)
    val b = java.nio.ByteBuffer.wrap(a)
    val got = b.getInt
    require(got == corrId, s"correlation id mismatch: sent $corrId got $got")
    b
  }

  private final class Conn(host: String, port: Int, timeoutMillis: Int) {
    val sock = new java.net.Socket()
    sock.connect(new java.net.InetSocketAddress(host, port), timeoutMillis)
    sock.setSoTimeout(timeoutMillis)
    sock.setTcpNoDelay(true)
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(sock.getOutputStream))
    val in = new DataInputStream(
      new java.io.BufferedInputStream(sock.getInputStream))
    private var corr = 0
    def call(apiKey: Int, version: Int,
             body: Array[Byte]): java.nio.ByteBuffer = {
      corr += 1
      send(out, apiKey, version, corr, body)
      recv(in, corr)
    }
    def close(): Unit = sock.close()
  }

  /** ApiVersions v0 → Map(apiKey → (min, max)); error code must be 0. */
  private def apiVersions(c: Conn): Map[Int, (Int, Int)] = {
    val b = c.call(18, 0, Array.empty)
    require(b.getShort == 0, "ApiVersions errored")
    val n = b.getInt
    (0 until n).map { _ =>
      (b.getShort.toInt, (b.getShort.toInt, b.getShort.toInt))
    }.toMap
  }

  /** Metadata v1 for one topic → partition count (error code 0 required;
    * UNKNOWN_TOPIC_OR_PARTITION and friends throw with the code). */
  private def partitionCount(c: Conn, topic: String): Int = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(1); writeString(d, topic); d.flush()
    val b = c.call(3, 1, body.toByteArray)
    val brokers = b.getInt
    (0 until brokers).foreach { _ =>
      b.getInt; readString(b); b.getInt; readString(b)
    }
    b.getInt // controller id
    val topics = b.getInt
    require(topics == 1, s"expected 1 topic in metadata, got $topics")
    val err = b.getShort
    val name = readString(b)
    require(err == 0, s"metadata error $err for topic $name")
    b.get() // is_internal
    val parts = b.getInt
    (0 until parts).foreach { _ =>
      b.getShort; b.getInt; b.getInt
      val r = b.getInt; (0 until r).foreach(_ => b.getInt)
      val i = b.getInt; (0 until i).foreach(_ => b.getInt)
    }
    parts
  }

  /** Produce v3: one request carrying `sets` (partition → encoded record
    * batch) for one topic; returns per-partition error codes. */
  private def produce(c: Conn, topic: String,
                      sets: Seq[(Int, Array[Byte])]): Map[Int, Int] = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    writeNullableString(d, null)  // transactional_id
    d.writeShort(-1)              // acks = all
    d.writeInt(30000)             // timeout_ms
    d.writeInt(1); writeString(d, topic)
    d.writeInt(sets.size)
    sets.foreach { case (p, batch) =>
      d.writeInt(p); d.writeInt(batch.length); d.write(batch)
    }
    d.flush()
    val b = c.call(0, 3, body.toByteArray)
    val topics = b.getInt
    require(topics == 1, s"expected 1 topic in produce response, got $topics")
    val name = readString(b)
    require(name == topic, s"produce response for wrong topic $name")
    val parts = b.getInt
    val errs = (0 until parts).map { _ =>
      val p = b.getInt; val err = b.getShort.toInt
      b.getLong // base_offset
      b.getLong // log_append_time
      p -> err
    }.toMap
    b.getInt // throttle_time_ms
    errs
  }

  private[streaming] def classify(err: Int): String = err match {
    // mirrors the reference's ClassifyKafkaError (destkafka.go:276-301)
    case 2  => "corrupt_message"
    case 3  => "topic_not_found"
    case 10 => "message_too_large"
    case 7  => "timeout"
    case n  => s"kafka_error_$n"
  }

  /** Produce each rendered Kafka record (topic, key, value, headers map)
    * over one connection per Spark partition: ApiVersions → Metadata →
    * one Produce per topic with one record-batch per topic-partition
    * (hash-routed). Returns records acknowledged; any broker error code
    * or CRC rejection throws — the bulk leg is all-or-nothing per
    * partition, the per-record branching lives in [[KafkaWireSink]]. */
  def deliver(records: DataFrame, host: String, port: Int,
              corruptCrc: Boolean = false): Long = {
    val spark2 = records.sparkSession
    import spark2.implicits._
    val rows = records.select("topic", "key", "value", "headers")
      .as[(String, Array[Byte], Array[Byte], Map[String, String])]
    val (h, p, corrupt) = (host, port, corruptCrc)
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val c = new Conn(h, p, 10000)
        try {
          val versions = apiVersions(c)
          require(versions.get(0).exists(_._2 >= 3),
            "broker does not speak Produce v3")
          require(versions.get(3).exists(_._2 >= 1),
            "broker does not speak Metadata v1")
          val all = it.toSeq
          var n = 0L
          all.groupBy(_._1).foreach { case (topic, ts) =>
            val parts = partitionCount(c, topic)
            val byPart = ts.groupBy { case (_, k, _, _) =>
              fnv1aPartition(if (k == null) Array.empty else k, parts)
            }
            val now = System.currentTimeMillis()
            val sets = byPart.toSeq.map { case (part, rs) =>
              part -> encodeBatch(rs.map { case (_, k, v, hs) =>
                (k, v, hs.toSeq.sortBy(_._1)
                  .map { case (hk, hv) => (hk, hv.getBytes("UTF-8")) })
              }, now, corrupt)
            }
            val errs = produce(c, topic, sets)
            errs.foreach { case (part, err) =>
              require(err == 0,
                s"produce failed on $topic/$part: ${classify(err)}")
            }
            n += ts.size
          }
          Iterator.single(n)
        } finally c.close()
      }
    }.rdd.fold(0L)(_ + _) // fold: empty delivery returns 0, not UnsupportedOperationException
  }
}

/** Kafka as a FIRST-CLASS delivery sink in the streaming loop: renders
  * each task like [[Sinks.KafkaSink]] (key from the JMESPath partition
  * key template with event-id fallback, value = raw payload, headers =
  * metadata + content-type — destkafka.go:209-258) and produces it over
  * the real wire per partition, branching PER-RECORD outcomes on the
  * broker response exactly as [[SqsHttpSink]] does: broker error codes
  * become failed attempts that feed the retry loop, not exceptions.
  *
  * `batchSize > 1` is the batched leg (the [[SqsHttpSink]] pattern for
  * Kafka): each chunk groups hash-routed records into ONE multi-record
  * batch per topic-partition and sends a single Produce — the request
  * count drops by the batch size. Produce results are per PARTITION
  * (the protocol has no per-record results inside a batch), so a failed
  * partition fails exactly its records; other partitions in the same
  * call still succeed. */
final case class KafkaWireSink(topic: String, host: String, port: Int,
                               partitionKeyTemplate: String = "",
                               deliveryMetadata: Map[String, String] = Map.empty,
                               timeoutMillis: Int = 10000,
                               batchSize: Int = 1)
  extends Sinks.Sink {
  require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
  val destType = "kafka"

  override def publish(tasks: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = tasks.sparkSession
    import spark.implicits._
    val (tpc, h, p, timeout, bsz) = (topic, host, port, timeoutMillis, batchSize)
    val rows = tasks
      .withColumn("kafka_key",
        graft.functions.PartitionKey
          .column(partitionKeyTemplate, col("data"), col("event_id")))
      .withColumn("meta_json",
        to_json(Sinks.makeMetadataExpr(deliveryMetadata)))
      .select(col("event_id"), col("tenant_id"), col("destination_id"),
        col("attempt").cast("int").as("attempt"), col("manual"),
        col("event_time"), col("topic"), col("data"), col("metadata"),
        col("eligible_for_retry"), col("kafka_key"), col("meta_json"))
      .as[(String, String, String, Int, Boolean, java.sql.Timestamp,
        String, String, Map[String, String], Boolean, String, String)]
    val outcomes = rows.mapPartitions { it =>
      // one connection + metadata probe per partition, reused across
      // tasks; per-task Produce mirrors the reference's per-delivery
      // WriteMessages (destkafka.go:255)
      var conn: KafkaWireConnHolder = null
      def holder(): KafkaWireConnHolder = {
        if (conn == null) conn = new KafkaWireConnHolder(h, p, timeout)
        conn
      }
      type Task = (String, String, String, Int, Boolean, java.sql.Timestamp,
        String, String, Map[String, String], Boolean, String, String)
      def resFor(t: Task, attemptTime: java.sql.Timestamp)(
          status: String, code: String, body: String) = {
        val (eid, tid, did, attempt, manual, eventTime, evTopic,
          data, metadata, elig, _, _) = t
        Sinks.HttpOutcome(s"att_$eid:$did:$attempt", eid, tid, did,
          "kafka", attempt, manual, status, attemptTime, code,
          eventTime, evTopic, data, metadata, elig, body)
      }
      // headers: merged delivery metadata + content-type, the
      // reference's header layering (destkafka.go:242-246)
      def headersOf(metaJson: String): Seq[(String, Array[Byte])] = {
        val meta = graft.functions.JsonMatch.parse(metaJson)
        val hs = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])](
          "content-type" -> "application/json".getBytes("UTF-8"))
        val fields = meta.fields()
        while (fields.hasNext) {
          val e = fields.next()
          hs += e.getKey -> e.getValue.asText.getBytes("UTF-8")
        }
        hs.toSeq.sortBy(_._1)
      }
      val out: Iterator[Sinks.HttpOutcome] = if (bsz <= 1)
        it.map { t =>
        val attemptTime = new java.sql.Timestamp(System.currentTimeMillis())
        val res = resFor(t, attemptTime) _
        val (_, _, _, _, _, _, _, data, _, _, kafkaKey, metaJson) = t
        try {
          val err = holder().produceOne(tpc,
            kafkaKey.getBytes("UTF-8"), data.getBytes("UTF-8"),
            headersOf(metaJson))
          if (err == 0) res("success", "OK", null)
          else res("failed", KafkaWire.classify(err), null)
        } catch {
          case _: java.net.SocketTimeoutException =>
            if (conn != null) { conn.close(); conn = null }
            res("failed", "timeout", null)
          case _: java.net.ConnectException =>
            res("failed", "connection_refused", null)
          case e: Exception =>
            if (conn != null) { conn.close(); conn = null }
            res("failed", "kafka_error", e.getClass.getSimpleName)
        }
      }
      else it.grouped(bsz).flatMap { chunk =>
        val attemptTime = new java.sql.Timestamp(System.currentTimeMillis())
        try {
          val recs: Seq[KafkaWire.Rec] = chunk.map { t =>
            val (_, _, _, _, _, _, _, data, _, _, kafkaKey, metaJson) = t
            (kafkaKey.getBytes("UTF-8"), data.getBytes("UTF-8"),
              headersOf(metaJson))
          }
          holder().produceMany(tpc, recs) match {
            case Left(err) =>
              // topic-level metadata error: every record in the chunk
              chunk.map(t => resFor(t, attemptTime)(
                "failed", KafkaWire.classify(err), null))
            case Right(perRecord) =>
              chunk.zip(perRecord).map { case (t, err) =>
                if (err == 0) resFor(t, attemptTime)("success", "OK", null)
                else resFor(t, attemptTime)(
                  "failed", KafkaWire.classify(err), null)
              }
          }
        } catch {
          case _: java.net.SocketTimeoutException =>
            if (conn != null) { conn.close(); conn = null }
            chunk.map(t => resFor(t, attemptTime)("failed", "timeout", null))
          case _: java.net.ConnectException =>
            chunk.map(t => resFor(t, attemptTime)(
              "failed", "connection_refused", null))
          case e: Exception =>
            if (conn != null) { conn.close(); conn = null }
            chunk.map(t => resFor(t, attemptTime)(
              "failed", "kafka_error", e.getClass.getSimpleName))
        }
      }
      // close the connection when the partition iterator drains
      new Iterator[Sinks.HttpOutcome] {
        def hasNext: Boolean = {
          val more = out.hasNext
          if (!more && conn != null) { conn.close(); conn = null }
          more
        }
        def next(): Sinks.HttpOutcome = out.next()
      }
    }.toDF()
    outcomes.localCheckpoint(true)
  }
}

/** One broker connection + cached topic partition counts, shared across
  * the tasks of one Spark partition (executor-side only). */
private[graft] final class KafkaWireConnHolder(host: String, port: Int,
                                                   timeoutMillis: Int) {
  private val sock = new java.net.Socket()
  sock.connect(new java.net.InetSocketAddress(host, port), timeoutMillis)
  sock.setSoTimeout(timeoutMillis)
  sock.setTcpNoDelay(true)
  private val out = new DataOutputStream(
    new java.io.BufferedOutputStream(sock.getOutputStream))
  private val in = new DataInputStream(
    new java.io.BufferedInputStream(sock.getInputStream))
  private var corr = 0
  private val partCache = scala.collection.mutable.Map[String, Int]()

  private def call(apiKey: Int, version: Int,
                   body: Array[Byte]): java.nio.ByteBuffer = {
    corr += 1
    val h = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(h)
    d.writeShort(apiKey); d.writeShort(version); d.writeInt(corr)
    d.writeShort(5); d.write("graft".getBytes("UTF-8"))
    d.flush()
    out.writeInt(h.size() + body.length)
    out.write(h.toByteArray); out.write(body); out.flush()
    val size = in.readInt()
    val a = new Array[Byte](size)
    in.readFully(a)
    val b = java.nio.ByteBuffer.wrap(a)
    require(b.getInt == corr, "correlation id mismatch")
    b
  }

  /** Metadata v1 partition count; a metadata-level topic error (e.g.
    * UNKNOWN_TOPIC) surfaces as that error code from produceOne. */
  private def partitions(topic: String): Either[Int, Int] =
    partCache.get(topic).map(Right(_)).getOrElse {
      val body = new java.io.ByteArrayOutputStream()
      val d = new DataOutputStream(body)
      d.writeInt(1); KafkaWire.writeString(d, topic); d.flush()
      val b = call(3, 1, body.toByteArray)
      val brokers = b.getInt
      (0 until brokers).foreach { _ =>
        b.getInt; KafkaWire.readString(b); b.getInt; KafkaWire.readString(b)
      }
      b.getInt // controller
      require(b.getInt == 1, "expected 1 topic in metadata")
      val err = b.getShort.toInt
      KafkaWire.readString(b)
      if (err != 0) Left(err)
      else {
        b.get() // is_internal
        val parts = b.getInt
        (0 until parts).foreach { _ =>
          b.getShort; b.getInt; b.getInt
          val r = b.getInt; (0 until r).foreach(_ => b.getInt)
          val i = b.getInt; (0 until i).foreach(_ => b.getInt)
        }
        partCache(topic) = parts
        Right(parts)
      }
    }

  /** Produce one record; returns the broker's error code (0 = success). */
  def produceOne(topic: String, key: Array[Byte], value: Array[Byte],
                 headers: Seq[(String, Array[Byte])]): Int =
    produceMany(topic, Seq((key, value, headers))) match {
      case Left(err) => err
      case Right(errs) => errs.head
    }

  /** Produce a chunk of records as ONE request: hash-routed into one
    * multi-record batch per topic-partition, a single Produce carrying
    * all the sets. Returns Left(topic metadata error) or Right(one error
    * code per input record, in input order) — Produce results are per
    * PARTITION, so each record takes its partition's code. */
  def produceMany(topic: String,
                  recs: Seq[KafkaWire.Rec]): Either[Int, Seq[Int]] =
    partitions(topic) match {
      case Left(err) => Left(err)
      case Right(parts) =>
        val now = System.currentTimeMillis()
        val partOf = recs.map { case (k, _, _) =>
          KafkaWire.fnv1aPartition(if (k == null) Array.empty[Byte] else k,
            parts)
        }
        val byPart = recs.zip(partOf).groupBy(_._2)
          .map { case (p0, rs) =>
            p0 -> KafkaWire.encodeBatch(rs.map(_._1), now)
          }.toSeq
        val body = new java.io.ByteArrayOutputStream()
        val d = new DataOutputStream(body)
        d.writeShort(-1) // transactional_id null
        d.writeShort(-1) // acks
        d.writeInt(timeoutMillis)
        d.writeInt(1); KafkaWire.writeString(d, topic)
        d.writeInt(byPart.size)
        byPart.foreach { case (p0, batch) =>
          d.writeInt(p0); d.writeInt(batch.length); d.write(batch)
        }
        d.flush()
        val b = call(0, 3, body.toByteArray)
        require(b.getInt == 1, "expected 1 topic in produce response")
        KafkaWire.readString(b)
        val pn = b.getInt
        val errByPart = (0 until pn).map { _ =>
          val p0 = b.getInt
          val err = b.getShort.toInt
          b.getLong; b.getLong // base_offset, log_append_time
          p0 -> err
        }.toMap
        b.getInt // throttle
        Right(partOf.map(p0 => errByPart.getOrElse(p0, 2)))
    }

  /** Fetch v4 from `offset` (r12 — closes the produce-only asymmetry with
    * the reference's consume path, `internal/mqs`): one request, the
    * response's record set split into batches, EVERY batch CRC32C-verified
    * before a record is surfaced (a corrupt batch throws — consuming
    * silently past a bad digest is how data loss hides), records below the
    * fetch position skipped (brokers return whole batches).
    *
    * @return Left(partition error code) or
    *         Right((high watermark, (offset, record) in offset order)) */
  def fetchFrom(topic: String, partition: Int, offset: Long,
                maxBytes: Int = 1 << 22): Either[Int, (Long, Seq[(Long, KafkaWire.Rec)])] = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(-1)          // replica_id: consumer
    d.writeInt(0)           // max_wait_ms
    d.writeInt(1)           // min_bytes
    d.writeInt(maxBytes)
    d.writeByte(0)          // isolation: read_uncommitted
    d.writeInt(1); KafkaWire.writeString(d, topic)
    d.writeInt(1)
    d.writeInt(partition); d.writeLong(offset); d.writeInt(maxBytes)
    d.flush()
    val b = call(1, 4, body.toByteArray)
    b.getInt // throttle
    require(b.getInt == 1, "expected 1 topic in fetch response")
    KafkaWire.readString(b)
    require(b.getInt == 1, "expected 1 partition in fetch response")
    require(b.getInt == partition, "partition mismatch in fetch response")
    val err = b.getShort.toInt
    val hw = b.getLong
    b.getLong // last_stable_offset
    val aborted = b.getInt
    (0 until aborted).foreach(_ => { b.getLong; b.getLong })
    val setLen = b.getInt
    val set = new Array[Byte](math.max(setLen, 0)); b.get(set)
    if (err != 0) Left(err)
    else Right((hw, KafkaWire.splitBatches(set).flatMap { batch =>
      val base = java.nio.ByteBuffer.wrap(batch).getLong
      val (crcOk, recs) = KafkaWire.decodeBatch(batch)
      if (!crcOk)
        throw new IllegalStateException(
          s"fetch: CRC32C mismatch in batch at offset $base")
      recs.zipWithIndex.map { case (r, i) => (base + i, r) }
      // sortBy offset: a broker (real or fake) may serve batches in
      // append-completion order under concurrent producers; the documented
      // "in offset order" contract is enforced here, on one fetch's worth
    }.filter(_._1 >= offset).sortBy(_._1)))
  }

  def close(): Unit = try sock.close() catch { case _: Exception => () }
}

/** The socket-level Kafka broker fake: answers ApiVersions/Metadata and
  * VERIFIES every produced record batch — envelope structure, magic 2,
  * and the CRC32C digest — before storing records. A digest mismatch is
  * answered with CORRUPT_MESSAGE (error 2) and nothing is stored; an
  * unconfigured topic gets UNKNOWN_TOPIC_OR_PARTITION (error 3) from
  * both Metadata and Produce. */
object KafkaMockServer {

  final case class Received(topic: String, partition: Int,
                            key: Array[Byte], value: Array[Byte],
                            headers: Map[String, String], baseOffset: Long)

  final class Server(srv: java.net.ServerSocket,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received],
                     val corruptBatches: java.util.concurrent.atomic.AtomicLong,
                     pool: java.util.concurrent.ExecutorService,
                     val produceRequests: java.util.concurrent.atomic.AtomicLong =
                       new java.util.concurrent.atomic.AtomicLong(0L)) {
    def port: Int = srv.getLocalPort
    def stop(): Unit = { srv.close(); pool.shutdownNow(); () }
  }

  def start(topics: Map[String, Int] = Map("events" -> 1)): Server = {
    val srv = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    val corrupt = new java.util.concurrent.atomic.AtomicLong(0L)
    val produceReqs = new java.util.concurrent.atomic.AtomicLong(0L)
    val offsets = new java.util.concurrent.ConcurrentHashMap[(String, Int),
      java.util.concurrent.atomic.AtomicLong]()
    // the retained log per (topic, partition): (baseOffset, recordCount,
    // raw batch REBASED to its assigned base) — what Fetch serves back.
    // Rebasing rewrites only the first 8 bytes; the batch CRC covers
    // attributes→end, so the stored bytes stay CRC-valid for the consumer.
    val log = new java.util.concurrent.ConcurrentHashMap[(String, Int),
      java.util.concurrent.CopyOnWriteArrayList[(Long, Int, Array[Byte])]]()
    val pool = java.util.concurrent.Executors.newCachedThreadPool()

    def serve(sock: java.net.Socket): Unit = {
      val in = new DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      def respond(corrId: Int, body: Array[Byte]): Unit = {
        out.writeInt(4 + body.length)
        out.writeInt(corrId)
        out.write(body)
        out.flush()
      }
      try {
        while (true) {
          val size = in.readInt()
          val a = new Array[Byte](size)
          in.readFully(a)
          val b = java.nio.ByteBuffer.wrap(a)
          val apiKey = b.getShort.toInt
          val version = b.getShort.toInt
          val corrId = b.getInt
          KafkaWire.readString(b) // client id
          val body = new java.io.ByteArrayOutputStream()
          val d = new DataOutputStream(body)
          apiKey match {
            case 18 => // ApiVersions v0
              require(version == 0, s"ApiVersions v$version unsupported")
              d.writeShort(0)
              d.writeInt(4)
              d.writeShort(0); d.writeShort(0); d.writeShort(8)   // Produce
              d.writeShort(1); d.writeShort(4); d.writeShort(11)  // Fetch
              d.writeShort(3); d.writeShort(0); d.writeShort(8)   // Metadata
              d.writeShort(18); d.writeShort(0); d.writeShort(2)  // ApiVersions
            case 3 => // Metadata v1
              require(version == 1, s"Metadata v$version unsupported")
              val n = b.getInt
              val requested =
                if (n < 0) topics.keys.toSeq.sorted
                else (0 until n).map(_ => KafkaWire.readString(b))
              d.writeInt(1) // one broker: this fake
              d.writeInt(0); KafkaWire.writeString(d, "127.0.0.1")
              d.writeInt(srv.getLocalPort); d.writeShort(-1) // null rack
              d.writeInt(0) // controller id
              d.writeInt(requested.size)
              requested.foreach { t =>
                topics.get(t) match {
                  case Some(parts) =>
                    d.writeShort(0); KafkaWire.writeString(d, t)
                    d.writeByte(0) // is_internal
                    d.writeInt(parts)
                    (0 until parts).foreach { pid =>
                      d.writeShort(0); d.writeInt(pid); d.writeInt(0)
                      d.writeInt(1); d.writeInt(0) // replicas [0]
                      d.writeInt(1); d.writeInt(0) // isr [0]
                    }
                  case None =>
                    d.writeShort(3) // UNKNOWN_TOPIC_OR_PARTITION
                    KafkaWire.writeString(d, t)
                    d.writeByte(0)
                    d.writeInt(0)
                }
              }
            case 0 => // Produce v3
              require(version == 3, s"Produce v$version unsupported")
              produceReqs.incrementAndGet()
              KafkaWire.readString(b) // transactional_id
              b.getShort              // acks
              b.getInt                // timeout
              val tn = b.getInt
              val resp = (0 until tn).map { _ =>
                val topic = KafkaWire.readString(b)
                val pn = b.getInt
                val parts = (0 until pn).map { _ =>
                  val pid = b.getInt
                  val setLen = b.getInt
                  val set = new Array[Byte](setLen); b.get(set)
                  val err =
                    if (!topics.contains(topic)) 3
                    else if (pid < 0 || pid >= topics(topic)) 3
                    else {
                      val (crcOk, recs) = KafkaWire.decodeBatch(set)
                      if (!crcOk) { corrupt.incrementAndGet(); 2 }
                      else {
                        val ctr = offsets.computeIfAbsent((topic, pid),
                          _ => new java.util.concurrent.atomic.AtomicLong(0L))
                        val base = ctr.getAndAdd(recs.size.toLong)
                        recs.zipWithIndex.foreach { case ((k, v, hs), i) =>
                          received.add(Received(topic, pid, k, v,
                            hs.map { case (hk, hv) =>
                              hk -> (if (hv == null) null
                                     else new String(hv, "UTF-8"))
                            }.toMap, base + i))
                        }
                        // retain for Fetch, rebased to the assigned base
                        val stored = set.clone()
                        java.nio.ByteBuffer.wrap(stored).putLong(0, base)
                        log.computeIfAbsent((topic, pid), _ =>
                            new java.util.concurrent.CopyOnWriteArrayList())
                          .add((base, recs.size, stored))
                        0
                      }
                    }
                  (pid, err)
                }
                (topic, parts)
              }
              d.writeInt(resp.size)
              resp.foreach { case (topic, parts) =>
                KafkaWire.writeString(d, topic)
                d.writeInt(parts.size)
                parts.foreach { case (pid, err) =>
                  d.writeInt(pid); d.writeShort(err)
                  d.writeLong(if (err == 0) 0L else -1L) // base_offset
                  d.writeLong(-1L)                       // log_append_time
                }
              }
              d.writeInt(0) // throttle_time_ms
            case 1 => // Fetch v4 (first pre-flexible version serving
              // record-batch v2 — the same format Produce v3 writes)
              require(version == 4, s"Fetch v$version unsupported")
              b.getInt                // replica_id
              b.getInt; b.getInt      // max_wait_ms, min_bytes
              b.getInt                // max_bytes
              b.get()                 // isolation_level
              val tn = b.getInt
              val resp = (0 until tn).map { _ =>
                val topic = KafkaWire.readString(b)
                val pn = b.getInt
                val parts = (0 until pn).map { _ =>
                  val pid = b.getInt
                  val fetchOffset = b.getLong
                  b.getInt            // partition_max_bytes
                  if (!topics.contains(topic) || pid < 0 || pid >= topics(topic))
                    (pid, 3, 0L, Array.empty[Byte]) // UNKNOWN_TOPIC_OR_PARTITION
                  else {
                    val hw = Option(offsets.get((topic, pid)))
                      .map(_.get()).getOrElse(0L)
                    // serve every retained batch whose LAST offset is at or
                    // past the fetch position (a mid-batch fetch returns the
                    // whole batch; the consumer skips below-position records
                    // — real broker semantics)
                    val batches = Option(log.get((topic, pid)))
                      .map(l => {
                        import scala.jdk.CollectionConverters._
                        l.asScala.filter { case (base, n, _) =>
                          base + n - 1 >= fetchOffset
                        }.map(_._3).toSeq
                      }).getOrElse(Seq.empty)
                    val set = new java.io.ByteArrayOutputStream()
                    batches.foreach(set.write)
                    (pid, 0, hw, set.toByteArray)
                  }
                }
                (topic, parts)
              }
              d.writeInt(0) // throttle_time_ms
              d.writeInt(resp.size)
              resp.foreach { case (topic, parts) =>
                KafkaWire.writeString(d, topic)
                d.writeInt(parts.size)
                parts.foreach { case (pid, err, hw, set) =>
                  d.writeInt(pid); d.writeShort(err)
                  d.writeLong(hw)   // high_watermark
                  d.writeLong(hw)   // last_stable_offset (no transactions)
                  d.writeInt(0)     // aborted_transactions: none
                  d.writeInt(set.length); d.write(set)
                }
              }
            case other =>
              throw new IllegalArgumentException(s"unsupported api $other")
          }
          d.flush()
          respond(corrId, body.toByteArray)
        }
      } catch { case _: Exception => () } finally sock.close()
    }
    pool.submit(new Runnable {
      def run(): Unit =
        try while (true) {
          val s = srv.accept()
          pool.submit(new Runnable { def run(): Unit = serve(s) })
          ()
        } catch { case _: Exception => () }
    })
    new Server(srv, received, corrupt, pool, produceReqs)
  }
}
