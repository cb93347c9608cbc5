package io.netty.handler.codec.http2

import graft.streaming.Hpack
import org.scalatest.funsuite.AnyFunSuite

/** Differential validation of the hand-rolled HPACK codec against netty's
  * implementation (on Spark's classpath). Lives in netty's package because
  * HpackEncoder/HpackDecoder are package-private there — test-only
  * placement, no production code depends on netty.
  *
  * Both directions: netty's encoder (static/dynamic indexing + Huffman
  * above its size threshold) produces blocks our decoder must read
  * field-for-field; our encoder's blocks must decode through netty's. */
class HpackDiffSpec extends AnyFunSuite {
  import io.netty.buffer.Unpooled

  private val rnd = new scala.util.Random(7541L)

  private def randomHeaders(n: Int): Seq[(String, String)] = {
    val names = Seq("content-type", "grpc-status", "grpc-message", "date",
      "server", "x-request-id", "cache-control", "grpc-encoding")
    (1 to n).map { _ =>
      if (rnd.nextBoolean()) {
        val v = rnd.alphanumeric.take(rnd.nextInt(40)).mkString.toLowerCase
        names(rnd.nextInt(names.length)) -> v
      } else {
        // long-ish values push netty over its Huffman threshold
        val v = Seq.fill(3 + rnd.nextInt(5))(
          rnd.alphanumeric.take(8).mkString.toLowerCase).mkString("/")
        "x-" + rnd.alphanumeric.take(6).mkString.toLowerCase -> v
      }
    }
  }

  test("netty-encoded blocks (indexing + huffman) decode through our codec") {
    val enc = new HpackEncoder()
    val dec = new Hpack.Decoder
    val sens = Http2HeadersEncoder.NEVER_SENSITIVE
    for (round <- 1 to 30) {
      val hs = (":status" -> "200") +: randomHeaders(1 + rnd.nextInt(8))
      val nettyHeaders = new DefaultHttp2Headers(false)
      hs.foreach { case (k, v) => nettyHeaders.add(k, v) }
      val buf = Unpooled.buffer()
      enc.encodeHeaders(1, buf, nettyHeaders, sens)
      val block = new Array[Byte](buf.readableBytes())
      buf.readBytes(block)
      val got = dec.decode(block)
      // netty may reorder (pseudo-headers first) but here :status already
      // leads; compare as multisets of pairs to stay order-robust
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        hs.groupBy(identity).view.mapValues(_.size).toMap,
        s"round $round: $got vs $hs")
    }
  }

  test("non-ASCII values: octet-counted sizes keep both codecs in sync") {
    // RFC 7541 §4.1 sizes count UTF-8 octets; multi-byte values used to
    // desync our eviction boundary (char-counted) from netty's and emit
    // malformed non-Huffman length prefixes (ADVICE r8). Small table +
    // multi-byte-heavy values force evictions right at the boundary.
    val values = Seq("naïve-café", "διάλεξη-αρχείο", "配信データ", "🚀🚀",
      "mixed-ascii-und-größe", "emoji-✓-done")
    // our encoder (non-Huffman: length must be octets) → netty decoder
    val dec = new HpackDecoder(4096L)
    val block = values.zipWithIndex.flatMap { case (v, i) =>
      Hpack.encLiteralIndexing(s"x-h$i", v, huffman = i % 2 == 0)
    }.toArray
    val out = new DefaultHttp2Headers(false)
    dec.decode(1, Unpooled.wrappedBuffer(block), out, false)
    values.zipWithIndex.foreach { case (v, i) =>
      val got = out.get(s"x-h$i")
      // netty surfaces header values as Latin-1 chars over the raw
      // octets — compare at the octet level
      val gotOctets = got.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(got != null && java.util.Arrays.equals(gotOctets,
        v.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
        s"netty read back x-h$i as $got")
    }
    // netty encoder with a 128-octet table (evicts every entry or two)
    // → our decoder: indexed references stay valid only if both sides
    // compute identical entry sizes
    val enc = new HpackEncoder()
    val ourDec = new Hpack.Decoder
    val sens = Http2HeadersEncoder.NEVER_SENSITIVE
    val sizeBuf = Unpooled.buffer()
    enc.setMaxHeaderTableSize(sizeBuf, 128L)
    ourDec.maxTableSize = 128
    val prefix = new Array[Byte](sizeBuf.readableBytes())
    sizeBuf.readBytes(prefix)
    var first = prefix
    for (round <- 1 to 4; (v, i) <- values.zipWithIndex) {
      // netty encodes CharSequence chars as single octets (Latin-1), so
      // hand it the UTF-8 octets re-read as Latin-1; our decoder reads
      // the octets back as UTF-8 and must recover the original value —
      // which only works if both sides' entry sizes count those octets
      val wire = new String(
        v.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val nettyHeaders = new DefaultHttp2Headers(false)
      nettyHeaders.add(s"x-h$i", wire)
      nettyHeaders.add(s"x-h$i", wire)
      val buf = Unpooled.buffer()
      enc.encodeHeaders(1, buf, nettyHeaders, sens)
      val block = new Array[Byte](buf.readableBytes())
      buf.readBytes(block)
      val got = ourDec.decode(first ++ block)
      first = Array.emptyByteArray
      assert(got == Seq(s"x-h$i" -> v, s"x-h$i" -> v),
        s"round $round: $got vs $v")
    }
  }

  test("our encoded blocks decode through netty's decoder") {
    val dec = new HpackDecoder(4096L)
    for (round <- 1 to 30) {
      val hs = randomHeaders(1 + rnd.nextInt(8))
      val block = hs.flatMap { case (k, v) =>
        Hpack.encLiteralIndexing(k, v, huffman = rnd.nextBoolean())
      }.toArray
      val out = new DefaultHttp2Headers(false)
      dec.decode(1, Unpooled.wrappedBuffer(block), out, false)
      val got = {
        val it = out.iterator()
        val b = Seq.newBuilder[(String, String)]
        while (it.hasNext) { val e = it.next(); b += (e.getKey.toString -> e.getValue.toString) }
        b.result()
      }
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        hs.groupBy(identity).view.mapValues(_.size).toMap,
        s"round $round: $got vs $hs")
    }
  }
}
