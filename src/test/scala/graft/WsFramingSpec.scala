package graft

import graft.streaming.WsFraming
import org.scalatest.funsuite.AnyFunSuite

/** RFC 6455 codec unit checks (the loopback client/server behavior rides
  * on these in CollectStreamSpec). */
class WsFramingSpec extends AnyFunSuite {

  private def events(frames: Array[Byte]*): Seq[WsFraming.Event] = {
    val dec = new WsFraming.Decoder
    frames.flatMap(f => dec.feed(f, f.length))
  }

  test("accept key matches the RFC 6455 §1.3 worked example") {
    // the handshake example key/accept pair published in the RFC itself
    assert(WsFraming.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("masked client frame round-trips through the decoder") {
    val msg = """{"timestamp_ms":1,"source":"x","msg":"{}"}"""
    val f = WsFraming.encodeFrame(WsFraming.OpText, msg.getBytes("UTF-8"), masked = true)
    // mask bit set on the wire, payload not in the clear
    assert((f(1) & 0x80) != 0)
    assert(!new String(f, "ISO-8859-1").contains("timestamp_ms"))
    assert(events(f) == Seq(WsFraming.Message(msg)))
  }

  test("16-bit and 64-bit extended lengths round-trip") {
    for (n <- Seq(125, 126, 65535, 65536, 200000)) {
      val payload = Array.fill(n)('a'.toByte)
      val f = WsFraming.encodeFrame(WsFraming.OpText, payload, masked = false)
      events(f) match {
        case Seq(WsFraming.Message(t)) => assert(t.length == n)
        case other => fail(s"n=$n decoded to $other")
      }
    }
  }

  test("fragmented message with interleaved control frames reassembles") {
    val dec = new WsFraming.Decoder
    val f1 = WsFraming.encodeFrame(WsFraming.OpText, "hel".getBytes, masked = false, fin = false)
    val ping = WsFraming.encodeFrame(WsFraming.OpPing, "p".getBytes, masked = false)
    val f2 = WsFraming.encodeFrame(WsFraming.OpContinuation, "lo".getBytes, masked = false)
    val got = dec.feed(f1, f1.length) ++ dec.feed(ping, ping.length) ++ dec.feed(f2, f2.length)
    assert(got.collect { case WsFraming.Ping(p) => new String(p) } == Seq("p"))
    assert(got.collect { case WsFraming.Message(t) => t } == Seq("hello"))
  }

  test("byte-at-a-time delivery never splits a message") {
    val msg = "x" * 300 // forces the 16-bit length path
    val f = WsFraming.encodeFrame(WsFraming.OpText, msg.getBytes, masked = true)
    val dec = new WsFraming.Decoder
    val got = f.flatMap(b => dec.feed(Array(b), 1))
    assert(got.toSeq == Seq(WsFraming.Message(msg)))
  }

  test("protocol errors surface: oversize frame, orphan continuation, RSV bits") {
    // 64-bit length over the cap
    val big = Array[Byte](0x81.toByte, 127, 0, 0, 0, 64, 0, 0, 0, 0)
    intercept[WsFraming.ProtocolError](events(big))
    val orphan = WsFraming.encodeFrame(WsFraming.OpContinuation, "x".getBytes, masked = false)
    intercept[WsFraming.ProtocolError](events(orphan))
    val rsv = WsFraming.encodeFrame(WsFraming.OpText, "x".getBytes, masked = false)
    rsv(0) = (rsv(0) | 0x40).toByte
    intercept[WsFraming.ProtocolError](events(rsv))
  }

  test("handshake validation requires 101 + the exact accept header") {
    val key = WsFraming.newKey()
    val ok = "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      s"Sec-WebSocket-Accept: ${WsFraming.acceptKey(key)}\r\n"
    assert(WsFraming.validateHandshake(ok, key))
    assert(!WsFraming.validateHandshake(ok.replace("101", "200"), key))
    assert(!WsFraming.validateHandshake(
      ok.replace(WsFraming.acceptKey(key), WsFraming.acceptKey(key + "x")), key))
  }
}
