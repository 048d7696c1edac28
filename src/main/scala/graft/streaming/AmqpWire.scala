package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import org.apache.spark.sql.DataFrame

/** AMQP 0-9-1 WIRE ROUND-TRIP for the RabbitMQ sink — the binary-framing
  * member of the wire-mock family ([[SqsWire]], [[CloudWire]]): the
  * renderer's spool rows (reference
  * `destrabbitmq/destrabbitmq.go:134-170` — exchange, topic routing key,
  * application/json content type, metadata headers, raw body) are
  * published over a REAL socket speaking the public AMQP 0-9-1 protocol
  * — protocol header, Connection.Start/Tune/Open handshake,
  * Channel.Open, then per message the Basic.Publish method frame, the
  * content-header frame (property flags, content-type shortstr, headers
  * field table) and the body frame, closing with Connection.Close/
  * CloseOk. The mock broker parses the actual frames (no tolerance
  * shortcuts on the publish path), so the spec asserts the exact bytes
  * that landed: routing key, content type, header table entries, body.
  *
  * Scale shape: one connection per partition (brokers want few
  * long-lived connections, not one per message), messages streamed down
  * it in partition order. */
object AmqpWire {

  // ---- primitive encoders (AMQP is network byte order — DataOutput) ----
  private def shortStr(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    require(b.length < 256, s"shortstr too long: ${b.length}")
    out.writeByte(b.length); out.write(b)
  }
  private def longStr(out: DataOutputStream, b: Array[Byte]): Unit = {
    out.writeInt(b.length); out.write(b)
  }
  /** Field table of longstr ('S') values — the shape amqp091-go writes
    * for string headers. */
  private def table(out: DataOutputStream, m: Seq[(String, String)]): Unit = {
    val bos = new java.io.ByteArrayOutputStream()
    val t = new DataOutputStream(bos)
    m.foreach { case (k, v) =>
      shortStr(t, k); t.writeByte('S'); longStr(t, v.getBytes("UTF-8"))
    }
    t.flush()
    out.writeInt(bos.size()); out.write(bos.toByteArray)
  }
  private def frame(out: DataOutputStream, ftype: Int, channel: Int,
                    payload: Array[Byte]): Unit = {
    out.writeByte(ftype); out.writeShort(channel)
    out.writeInt(payload.length); out.write(payload)
    out.writeByte(0xCE)
  }
  private def method(classId: Int, methodId: Int)
                    (body: DataOutputStream => Unit): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.writeShort(classId); d.writeShort(methodId); body(d); d.flush()
    bos.toByteArray
  }

  private[streaming] final case class Frame(ftype: Int, channel: Int,
                                            payload: Array[Byte])
  private[streaming] def readFrame(in: DataInputStream): Frame = {
    val t = in.readUnsignedByte()
    val ch = in.readUnsignedShort()
    val len = in.readInt()
    val p = new Array[Byte](len)
    in.readFully(p)
    require(in.readUnsignedByte() == 0xCE, "missing frame-end octet")
    Frame(t, ch, p)
  }
  private def methodOf(f: Frame): (Int, Int) = {
    val b = java.nio.ByteBuffer.wrap(f.payload)
    (b.getShort & 0xFFFF, b.getShort & 0xFFFF)
  }
  private def expectMethod(in: DataInputStream, cls: Int, mth: Int): Frame = {
    val f = readFrame(in)
    val (c, m) = methodOf(f)
    require(f.ftype == 1 && c == cls && m == mth,
      s"expected method $cls.$mth, got frame type ${f.ftype} method $c.$m")
    f
  }

  /** Publish each rendered RabbitMQ record (exchange, routing_key,
    * content_type, headers, body) over one AMQP connection per
    * partition. Returns messages published; any protocol violation from
    * the broker side throws. */
  def deliver(records: DataFrame, host: String, port: Int): Long = {
    val spark2 = records.sparkSession
    import spark2.implicits._
    val rows = records
      .select("exchange", "routing_key", "content_type", "headers", "body")
      .as[(String, String, String, Map[String, String], Array[Byte])]
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val sock = new java.net.Socket(host, port)
        sock.setSoTimeout(10000)
        val out = new DataOutputStream(
          new java.io.BufferedOutputStream(sock.getOutputStream))
        val in = new DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        var n = 0L
        try {
          out.write("AMQP".getBytes("US-ASCII"))
          out.write(Array[Byte](0, 0, 9, 1)); out.flush()
          expectMethod(in, 10, 10) // Connection.Start
          frame(out, 1, 0, method(10, 11) { d => // StartOk
            table(d, Seq("product" -> "graft"))
            shortStr(d, "PLAIN")
            // SASL PLAIN response: NUL authzid NUL authcid NUL passwd
            longStr(d, Array[Byte](0) ++ "guest".getBytes("UTF-8") ++
              Array[Byte](0) ++ "guest".getBytes("UTF-8"))
            shortStr(d, "en_US")
          }); out.flush()
          expectMethod(in, 10, 30) // Tune
          frame(out, 1, 0, method(10, 31) { d => // TuneOk
            d.writeShort(0); d.writeInt(131072); d.writeShort(0)
          })
          frame(out, 1, 0, method(10, 40) { d => // Connection.Open
            shortStr(d, "/"); shortStr(d, ""); d.writeByte(0)
          }); out.flush()
          expectMethod(in, 10, 41) // OpenOk
          frame(out, 1, 1, method(20, 10)(shortStr(_, ""))) // Channel.Open
          out.flush()
          expectMethod(in, 20, 11) // Channel.OpenOk
          it.foreach { case (exchange, rkey, ctype, headers, body) =>
            frame(out, 1, 1, method(60, 40) { d => // Basic.Publish
              d.writeShort(0); shortStr(d, exchange); shortStr(d, rkey)
              d.writeByte(0) // mandatory=0, immediate=0
            })
            // content header: class 60, weight 0, body size, flags
            // 0xA000 = content-type (0x8000) + headers (0x2000)
            val hdr = {
              val bos = new java.io.ByteArrayOutputStream()
              val d = new DataOutputStream(bos)
              d.writeShort(60); d.writeShort(0)
              d.writeLong(body.length.toLong)
              d.writeShort(0xA000)
              shortStr(d, ctype)
              table(d, headers.toSeq.sortBy(_._1))
              d.flush(); bos.toByteArray
            }
            frame(out, 2, 1, hdr)
            // a zero-length body sends NO body frame (the content is
            // complete when received bytes == header body-size)
            if (body.nonEmpty) frame(out, 3, 1, body)
            n += 1
          }
          frame(out, 1, 0, method(10, 50) { d => // Connection.Close
            d.writeShort(200); shortStr(d, "OK")
            d.writeShort(0); d.writeShort(0)
          }); out.flush()
          expectMethod(in, 10, 51) // CloseOk
        } finally sock.close()
        Iterator.single(n)
      }
    }.rdd.fold(0L)(_ + _) // fold: empty delivery returns 0, not UnsupportedOperationException
  }
}

/** The socket-level AMQP 0-9-1 fake broker: performs the real handshake,
  * parses method/header/body frames strictly on the publish path, and
  * stores what was published. */
object AmqpMockServer {
  final case class Received(exchange: String, routingKey: String,
                            contentType: String,
                            headers: Map[String, String], body: Array[Byte])

  final class Server(srv: java.net.ServerSocket,
                     val received: java.util.concurrent.CopyOnWriteArrayList[Received]) {
    def port: Int = srv.getLocalPort
    def stop(): Unit = srv.close()
  }

  private def shortStr(b: java.nio.ByteBuffer): String = {
    val n = b.get() & 0xFF
    val a = new Array[Byte](n); b.get(a); new String(a, "UTF-8")
  }
  private def longStrBytes(b: java.nio.ByteBuffer): Array[Byte] = {
    val n = b.getInt(); val a = new Array[Byte](n); b.get(a); a
  }
  private def readTable(b: java.nio.ByteBuffer): Map[String, String] = {
    val len = b.getInt()
    val end = b.position() + len
    val m = Map.newBuilder[String, String]
    while (b.position() < end) {
      val k = shortStr(b)
      (b.get() & 0xFF).toChar match {
        case 'S' => m += k -> new String(longStrBytes(b), "UTF-8")
        case 't' => m += k -> (b.get() != 0).toString
        case other => throw new IllegalArgumentException(
          s"unsupported field type '$other' in mock table")
      }
    }
    m.result()
  }

  def start(): Server = {
    val srv = new java.net.ServerSocket(0, 16,
      java.net.InetAddress.getByName("127.0.0.1"))
    val received = new java.util.concurrent.CopyOnWriteArrayList[Received]()
    val pool = java.util.concurrent.Executors.newCachedThreadPool()
    def serve(sock: java.net.Socket): Unit = {
      val in = new DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      def frame(ftype: Int, channel: Int, payload: Array[Byte]): Unit = {
        out.writeByte(ftype); out.writeShort(channel)
        out.writeInt(payload.length); out.write(payload); out.writeByte(0xCE)
        out.flush()
      }
      def method(classId: Int, methodId: Int)
                (body: DataOutputStream => Unit): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val d = new DataOutputStream(bos)
        d.writeShort(classId); d.writeShort(methodId); body(d); d.flush()
        bos.toByteArray
      }
      def wshortStr(d: DataOutputStream, s: String): Unit = {
        val b = s.getBytes("UTF-8"); d.writeByte(b.length); d.write(b)
      }
      try {
        val hdr = new Array[Byte](8); in.readFully(hdr)
        require(new String(hdr, 0, 4, "US-ASCII") == "AMQP",
          "not an AMQP client")
        frame(1, 0, method(10, 10) { d => // Connection.Start
          d.writeByte(0); d.writeByte(9)
          d.writeInt(0) // empty server-properties table
          val mech = "PLAIN".getBytes; d.writeInt(mech.length); d.write(mech)
          val loc = "en_US".getBytes; d.writeInt(loc.length); d.write(loc)
        })
        // pending publish state: (exchange, rkey) → header → body bytes
        var pending: Option[(String, String)] = None
        var pendingHdr: Option[(String, Map[String, String], Long)] = None
        var bodyBuf = new java.io.ByteArrayOutputStream()
        var open = true
        while (open) {
          val f = AmqpWire.readFrame(in)
          f.ftype match {
            case 1 =>
              val b = java.nio.ByteBuffer.wrap(f.payload)
              val cls = b.getShort & 0xFFFF; val mth = b.getShort & 0xFFFF
              (cls, mth) match {
                case (10, 11) => // StartOk: mechanism must be PLAIN
                  readTable(b)
                  require(shortStr(b) == "PLAIN", "unsupported mechanism")
                  frame(1, 0, method(10, 30) { d => // Tune
                    d.writeShort(0); d.writeInt(131072); d.writeShort(0)
                  })
                case (10, 31) => () // TuneOk
                case (10, 40) => // Connection.Open
                  frame(1, 0, method(10, 41)(wshortStr(_, "")))
                case (10, 50) => // Connection.Close
                  frame(1, 0, method(10, 51)(_ => ()))
                  open = false
                case (20, 10) => // Channel.Open → OpenOk (longstr reserved)
                  frame(1, f.channel, method(20, 11)(_.writeInt(0)))
                case (60, 40) => // Basic.Publish
                  b.getShort // reserved
                  val exchange = shortStr(b)
                  val rkey = shortStr(b)
                  pending = Some((exchange, rkey))
                case other =>
                  throw new IllegalArgumentException(s"unexpected method $other")
              }
            case 2 => // content header
              val b = java.nio.ByteBuffer.wrap(f.payload)
              require(b.getShort == 60, "header class must be basic")
              b.getShort // weight
              val size = b.getLong
              val flags = b.getShort & 0xFFFF
              val ctype = if ((flags & 0x8000) != 0) shortStr(b) else ""
              val headers =
                if ((flags & 0x2000) != 0) readTable(b)
                else Map.empty[String, String]
              pendingHdr = Some((ctype, headers, size))
              bodyBuf = new java.io.ByteArrayOutputStream()
              if (size == 0L) { // zero-length body: no body frame follows
                val (ex0, rk) = pending.get
                received.add(Received(ex0, rk, ctype, headers, Array.empty))
                pending = None; pendingHdr = None
              }
            case 3 => // body
              if (f.payload.isEmpty && pendingHdr.isEmpty) ()
              else {
              bodyBuf.write(f.payload)
              val (ctype, headers, size) = pendingHdr.get
              if (bodyBuf.size() >= size) {
                val (ex0, rk) = pending.get
                received.add(
                  Received(ex0, rk, ctype, headers, bodyBuf.toByteArray))
                pending = None; pendingHdr = None
              }
              }
            case 8 => () // heartbeat
            case other =>
              throw new IllegalArgumentException(s"unexpected frame type $other")
          }
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
    new Server(srv, received)
  }
}
