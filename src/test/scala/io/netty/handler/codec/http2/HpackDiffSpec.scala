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
