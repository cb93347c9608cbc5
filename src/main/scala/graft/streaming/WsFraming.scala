package graft.streaming

import java.nio.charset.StandardCharsets

/** RFC 6455 WebSocket client framing — the wire-protocol layer under the
  * reference's push-feed subscriptions (collector/node_conn.go:87-101
  * reads messages off an established `*websocket.Conn`; this is the
  * protocol that connection speaks, implemented from the public spec).
  * Pure byte-level codec: [[FeedConnector]] owns the socket and the
  * reconnect policy, this object owns handshake strings, frame
  * encode/decode, masking, fragmentation and control frames — so specs
  * can drive both the client and a loopback server from the same code.
  *
  * Scope (a feed CLIENT, per RFC 6455 §5):
  *  - client→server frames are always masked, server→client never;
  *  - text (0x1), binary (0x2) and continuation (0x0) frames carry data —
  *    fragments accumulate until FIN;
  *  - ping (0x9) must be answered with a pong (0xA) echoing the payload;
  *  - close (0x8) is confirmed and ends the connection;
  *  - control frames may interleave between fragments and are never
  *    themselves fragmented.
  */
object WsFraming {

  /** RFC 6455 §1.3 handshake GUID. */
  private val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** Frame opcodes (§5.2). */
  val OpContinuation = 0x0
  val OpText = 0x1
  val OpBinary = 0x2
  val OpClose = 0x8
  val OpPing = 0x9
  val OpPong = 0xA

  /** Control-frame payloads are capped at 125 bytes by the spec; data
    * frames here are capped defensively — a frame length beyond this is a
    * protocol error and the connection drops (wire loss, like a torn
    * line). */
  val MaxFrameBytes: Long = 16L * 1024 * 1024

  /** Sec-WebSocket-Accept for a given Sec-WebSocket-Key (§4.2.2 step 5.4)
    * — used by the client to validate the 101 response and by loopback
    * test servers to produce it. */
  def acceptKey(key: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest((key + Guid).getBytes(StandardCharsets.US_ASCII))
    java.util.Base64.getEncoder.encodeToString(sha)
  }

  /** A fresh Sec-WebSocket-Key: base64 of 16 random bytes (§4.1). */
  def newKey(): String = {
    val bytes = new Array[Byte](16)
    java.util.concurrent.ThreadLocalRandom.current().nextBytes(bytes)
    java.util.Base64.getEncoder.encodeToString(bytes)
  }

  /** The client opening handshake (§4.1). */
  def handshakeRequest(host: String, port: Int, path: String, key: String): Array[Byte] =
    (s"GET $path HTTP/1.1\r\n" +
      s"Host: $host:$port\r\n" +
      "Upgrade: websocket\r\n" +
      "Connection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(StandardCharsets.US_ASCII)

  /** Validate the server's 101 response for `key`: status line + the
    * exact Sec-WebSocket-Accept (§4.1 client requirements). */
  def validateHandshake(response: String, key: String): Boolean = {
    val lines = response.split("\r\n")
    lines.headOption.exists(_.matches("HTTP/1\\.1 101 .*")) &&
      lines.exists { l =>
        val i = l.indexOf(':')
        i > 0 && l.substring(0, i).equalsIgnoreCase("sec-websocket-accept") &&
          l.substring(i + 1).trim == acceptKey(key)
      }
  }

  /** Encode one frame. Client frames (`masked = true`) get a random mask
    * key; server frames go unmasked (§5.1 — used by loopback spec
    * servers). */
  def encodeFrame(opcode: Int, payload: Array[Byte], masked: Boolean,
      fin: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 14)
    out.write((if (fin) 0x80 else 0x00) | (opcode & 0x0F))
    val maskBit = if (masked) 0x80 else 0x00
    val n = payload.length
    if (n <= 125) out.write(maskBit | n)
    else if (n <= 0xFFFF) {
      out.write(maskBit | 126)
      out.write((n >> 8) & 0xFF); out.write(n & 0xFF)
    } else {
      out.write(maskBit | 127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    if (masked) {
      val mask = new Array[Byte](4)
      java.util.concurrent.ThreadLocalRandom.current().nextBytes(mask)
      out.write(mask)
      var i = 0
      while (i < n) { out.write(payload(i) ^ mask(i % 4)); i += 1 }
    } else out.write(payload)
    out.toByteArray
  }

  /** A complete message or control event surfaced by the decoder. */
  sealed trait Event
  /** One complete text (or binary-as-text) data message, fragments joined. */
  final case class Message(text: String) extends Event
  /** Server ping — the client must answer with a pong echoing `payload`. */
  final case class Ping(payload: Array[Byte]) extends Event
  /** Pong (unsolicited or answering a ping) — ignorable by the client;
    * carries its payload so loopback servers can assert the echo. */
  final case class Pong(payload: Array[Byte]) extends Event
  /** Close frame — confirm and drop the connection. */
  case object Close extends Event

  /** Raised on malformed input (bad opcode, oversized frame, continuation
    * without a start). The connection is torn down — same policy as a
    * line truncated by a drop. */
  final class ProtocolError(msg: String) extends java.io.IOException(msg)

  /** Incremental frame decoder: feed raw socket bytes in whatever chunks
    * the reads produce, get complete events out. Partial frames stay
    * buffered byte-exact across read-timeout ticks, exactly like the
    * line-mode partial buffer. One instance per connection. */
  final class Decoder {
    private var buf = Array.emptyByteArray
    private var used = 0
    private var fragOp = -1
    private val frag = new java.io.ByteArrayOutputStream

    private def append(chunk: Array[Byte], n: Int): Unit = {
      if (used + n > buf.length) {
        val grown = new Array[Byte](math.max(used + n, buf.length * 2 + 64))
        System.arraycopy(buf, 0, grown, 0, used)
        buf = grown
      }
      System.arraycopy(chunk, 0, buf, used, n)
      used += n
    }

    private def consume(n: Int): Unit = {
      System.arraycopy(buf, n, buf, 0, used - n)
      used -= n
    }

    def feed(chunk: Array[Byte], n: Int): Seq[Event] = {
      append(chunk, n)
      val events = Seq.newBuilder[Event]
      var more = true
      while (more) {
        parseOne() match {
          case Some(e) => e.foreach(events += _)
          case None => more = false
        }
      }
      events.result()
    }

    /** Some(event-or-silent) if a complete frame was consumed; None if
      * more bytes are needed. */
    private def parseOne(): Option[Option[Event]] = {
      if (used < 2) return None
      val b0 = buf(0) & 0xFF
      val b1 = buf(1) & 0xFF
      val fin = (b0 & 0x80) != 0
      if ((b0 & 0x70) != 0) throw new ProtocolError("nonzero RSV bits")
      val opcode = b0 & 0x0F
      val masked = (b1 & 0x80) != 0
      var len: Long = b1 & 0x7F
      var idx = 2
      if (len == 126) {
        if (used < 4) return None
        len = ((buf(2) & 0xFF) << 8) | (buf(3) & 0xFF)
        idx = 4
      } else if (len == 127) {
        if (used < 10) return None
        len = 0
        var i = 2
        while (i < 10) { len = (len << 8) | (buf(i) & 0xFF); i += 1 }
        idx = 10
      }
      if (len < 0 || len > MaxFrameBytes) throw new ProtocolError(s"frame too large: $len")
      val maskKey = new Array[Byte](4)
      if (masked) {
        if (used < idx + 4) return None
        System.arraycopy(buf, idx, maskKey, 0, 4)
        idx += 4
      }
      if (used < idx + len.toInt) return None
      val payload = new Array[Byte](len.toInt)
      System.arraycopy(buf, idx, payload, 0, len.toInt)
      if (masked) {
        var i = 0
        while (i < payload.length) { payload(i) = (payload(i) ^ maskKey(i % 4)).toByte; i += 1 }
      }
      consume(idx + len.toInt)

      opcode match {
        case OpText | OpBinary =>
          if (fragOp != -1) throw new ProtocolError("data frame inside fragment")
          if (fin) Some(Some(Message(new String(payload, StandardCharsets.UTF_8))))
          else { fragOp = opcode; frag.reset(); frag.write(payload); Some(None) }
        case OpContinuation =>
          if (fragOp == -1) throw new ProtocolError("continuation without start")
          frag.write(payload)
          if (fin) {
            val whole = frag.toByteArray
            fragOp = -1; frag.reset()
            Some(Some(Message(new String(whole, StandardCharsets.UTF_8))))
          } else Some(None)
        case OpPing =>
          if (!fin) throw new ProtocolError("fragmented control frame")
          Some(Some(Ping(payload)))
        case OpPong => Some(Some(Pong(payload)))
        case OpClose => Some(Some(Close))
        case other => throw new ProtocolError(s"unknown opcode $other")
      }
    }
  }
}
