package graft

import graft.streaming.Hpack
import org.scalatest.funsuite.AnyFunSuite

/** RFC 7541 conformance checks for the HPACK codec, anchored on the RFC's
  * own Appendix C worked examples. */
class HpackSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("C.1: integer representations") {
    assert(Hpack.encodeInt(5, 0, 10).toSeq == hex("0a").toSeq)
    assert(Hpack.encodeInt(5, 0, 1337).toSeq == hex("1f9a0a").toSeq)
    assert(Hpack.encodeInt(8, 0, 42).toSeq == hex("2a").toSeq)
  }

  test("C.3: request examples without Huffman, dynamic table grows") {
    val d = new Hpack.Decoder
    val h1 = d.decode(hex("8286 8441 0f77 7777 2e65 7861 6d70 6c65 2e63 6f6d"))
    assert(h1 == Seq(":method" -> "GET", ":scheme" -> "http",
      ":path" -> "/", ":authority" -> "www.example.com"))
    // second request references the dynamic entry (index 62) added above
    val h2 = d.decode(hex("8286 84be 5808 6e6f 2d63 6163 6865"))
    assert(h2 == Seq(":method" -> "GET", ":scheme" -> "http",
      ":path" -> "/", ":authority" -> "www.example.com",
      "cache-control" -> "no-cache"))
  }

  test("C.4: request example with Huffman-coded literal") {
    val d = new Hpack.Decoder
    val h = d.decode(hex("8286 8441 8cf1 e3c2 e5f2 3a6b a0ab 90f4 ff"))
    assert(h == Seq(":method" -> "GET", ":scheme" -> "http",
      ":path" -> "/", ":authority" -> "www.example.com"))
  }

  test("huffman codec round-trips arbitrary byte strings") {
    val samples = Seq("", "a", "www.example.com", "no-cache",
      "grpc-status", "application/grpc+proto", "Hellö wörld ¡¿",
      "0123456789", (0 until 256).map(_.toChar).mkString)
    samples.foreach { s =>
      val enc = Hpack.huffmanEncode(s)
      assert(Hpack.huffmanDecode(enc) == s, s"round-trip failed for: $s")
    }
    // the RFC's own worked value: "www.example.com" -> f1e3c2e5f23a6ba0ab90f4ff
    assert(Hpack.huffmanEncode("www.example.com").toSeq ==
      hex("f1e3 c2e5 f23a 6ba0 ab90 f4ff").toSeq)
  }

  test("huffman decode rejects EOS and bad padding") {
    // a full EOS code inside the data is a decode error
    val eos = Array(0xff.toByte, 0xff.toByte, 0xff.toByte, 0xfc.toByte)
    assertThrows[Hpack.HpackError](Hpack.huffmanDecode(eos))
    // padding bits that are not the EOS prefix (0-bits) are an error:
    // '0' = 00000 (5 bits) followed by 000 padding
    assertThrows[Hpack.HpackError](Hpack.huffmanDecode(Array(0x00.toByte)))
  }

  test("encoder helpers round-trip through the decoder incl. indexing") {
    val enc = new java.io.ByteArrayOutputStream
    enc.write(Hpack.encIndexed(8)) // :status 200 (static)
    enc.write(Hpack.encLiteralIndexing("grpc-status", "0", huffman = true))
    enc.write(Hpack.encLiteralIndexingIdx(31, "application/grpc", huffman = false))
    val d = new Hpack.Decoder
    assert(d.decode(enc.toByteArray) == Seq(":status" -> "200",
      "grpc-status" -> "0", "content-type" -> "application/grpc"))
    // the two literals joined the dynamic table: most-recent first
    assert(d.decode(Array(Hpack.encIndexed(62), Hpack.encIndexed(63)).flatten) ==
      Seq("content-type" -> "application/grpc", "grpc-status" -> "0"))
  }

  test("dynamic table size update evicts oldest entries") {
    val d = new Hpack.Decoder
    val block = new java.io.ByteArrayOutputStream
    block.write(Hpack.encLiteralIndexing("aaaa", "1111"))
    block.write(Hpack.encLiteralIndexing("bbbb", "2222"))
    d.decode(block.toByteArray)
    // shrink to one entry's size (4 + 4 + 32 = 40): the older entry evicts
    val upd = new java.io.ByteArrayOutputStream
    upd.write(Hpack.encSizeUpdate(40))
    upd.write(Hpack.encIndexed(62)) // the surviving (newest) entry
    assert(d.decode(upd.toByteArray) == Seq("bbbb" -> "2222"))
    // the evicted entry is gone
    assertThrows[Hpack.HpackError](d.decode(Hpack.encIndexed(63)))
  }

  test("decode errors: index 0, out-of-range, oversize update, truncation") {
    val d = new Hpack.Decoder
    assertThrows[Hpack.HpackError](d.decode(Array(0x80.toByte)))         // index 0
    assertThrows[Hpack.HpackError](d.decode(Hpack.encIndexed(99)))       // out of range
    assertThrows[Hpack.HpackError](d.decode(Hpack.encSizeUpdate(65536))) // above cap
    val trunc = Hpack.encLiteralIndexing("name", "value").dropRight(2)
    assertThrows[Hpack.HpackError](d.decode(trunc))
  }
}
