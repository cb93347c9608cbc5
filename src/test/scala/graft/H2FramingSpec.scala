package graft

import graft.streaming.{H2Framing, WsFraming}
import org.scalatest.funsuite.AnyFunSuite

/** HTTP/2 + gRPC codec unit checks (the loopback client/server behavior
  * rides on these in CollectStreamSpec). */
class H2FramingSpec extends AnyFunSuite {

  test("frame header round-trips type, flags, stream id, payload") {
    val payload = Array.tabulate(300)(_.toByte)
    val f = H2Framing.encodeFrame(H2Framing.TData, H2Framing.FlagEndStream, 1, payload)
    val dec = new H2Framing.FrameDecoder
    // byte-at-a-time delivery: the header/payload split never corrupts
    val got = f.flatMap(b => dec.feed(Array(b), 1))
    assert(got.length == 1)
    assert(got.head.tpe == H2Framing.TData)
    assert(got.head.flags == H2Framing.FlagEndStream)
    assert(got.head.streamId == 1)
    assert(got.head.payload.toSeq == payload.toSeq)
  }

  test("grpc deframer handles coalesced and split messages") {
    val a = H2Framing.grpcMessage("alpha".getBytes)
    val b = H2Framing.grpcMessage("beta".getBytes)
    val d = new H2Framing.GrpcDeframer
    val joined = d.feed(a ++ b.take(3)) ++ d.feed(b.drop(3))
    assert(joined.map(new String(_)) == Seq("alpha", "beta"))
  }

  test("protocol errors: compressed grpc message, oversize lengths") {
    val d = new H2Framing.GrpcDeframer
    intercept[WsFraming.ProtocolError](d.feed(Array[Byte](1, 0, 0, 0, 1, 42)))
    val d2 = new H2Framing.GrpcDeframer
    intercept[WsFraming.ProtocolError](
      d2.feed(Array[Byte](0, 0x7F.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)))
  }

  test("hpack literal is the never-indexed new-name encoding") {
    val h = H2Framing.hpackLiteral(":method", "POST")
    assert(h(0) == 0x10)
    assert(h(1) == 7 && new String(h, 2, 7, "US-ASCII") == ":method")
    assert(h(9) == 4 && new String(h, 10, 4, "US-ASCII") == "POST")
  }
}
