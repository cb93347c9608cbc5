package graft.streaming

import java.nio.charset.StandardCharsets

/** HPACK (RFC 7541) header-block codec — the response-header half of the
  * gRPC-over-HTTP/2 client (request headers were already encoded as
  * literal-never-indexed fields in [[H2Framing.hpackLiteral]]; this adds
  * the DECODER the client needs to read response HEADERS and trailers —
  * `:status`, and the `grpc-status`/`grpc-message` trailer pair that
  * carries the RPC outcome, per the public gRPC-over-HTTP2 wire spec).
  *
  * Implements the full decode surface a conformant server may emit:
  * indexed fields (static + dynamic table), the three literal forms,
  * dynamic-table size updates with eviction, and Huffman-coded string
  * literals (Appendix B canonical code; the table below is the RFC's own
  * data). Decode errors are connection-level per RFC 9113 §4.3 — the
  * caller tears the connection down and redials.
  *
  * The encoder half covers what the loopback test servers need to
  * exercise the decoder: indexed fields, incremental-indexing literals,
  * optional Huffman string coding, size updates.
  */
object Hpack {

  final class HpackError(msg: String) extends RuntimeException(msg)

  // ---- RFC 7541 Appendix A: the 61-entry static table
  private[graft] val StaticTable: Vector[(String, String)] = Vector(
    ":authority" -> "", ":method" -> "GET", ":method" -> "POST",
    ":path" -> "/", ":path" -> "/index.html", ":scheme" -> "http",
    ":scheme" -> "https", ":status" -> "200", ":status" -> "204",
    ":status" -> "206", ":status" -> "304", ":status" -> "400",
    ":status" -> "404", ":status" -> "500", "accept-charset" -> "",
    "accept-encoding" -> "gzip, deflate", "accept-language" -> "",
    "accept-ranges" -> "", "accept" -> "", "access-control-allow-origin" -> "",
    "age" -> "", "allow" -> "", "authorization" -> "", "cache-control" -> "",
    "content-disposition" -> "", "content-encoding" -> "",
    "content-language" -> "", "content-length" -> "", "content-location" -> "",
    "content-range" -> "", "content-type" -> "", "cookie" -> "", "date" -> "",
    "etag" -> "", "expect" -> "", "expires" -> "", "from" -> "", "host" -> "",
    "if-match" -> "", "if-modified-since" -> "", "if-none-match" -> "",
    "if-range" -> "", "if-unmodified-since" -> "", "last-modified" -> "",
    "link" -> "", "location" -> "", "max-forwards" -> "",
    "proxy-authenticate" -> "", "proxy-authorization" -> "", "range" -> "",
    "referer" -> "", "refresh" -> "", "retry-after" -> "", "server" -> "",
    "set-cookie" -> "", "strict-transport-security" -> "",
    "transfer-encoding" -> "", "user-agent" -> "", "vary" -> "", "via" -> "",
    "www-authenticate" -> "")

  // ---- RFC 7541 Appendix B: (code, bit-length) per symbol 0..255 + EOS
  private val HuffmanTable: String =
    """8184:13,8388568:23,268435426:28,268435427:28,268435428:28,268435429:28,268435430:28,268435431:28,
      |268435432:28,16777194:24,1073741820:30,268435433:28,268435434:28,1073741821:30,268435435:28,268435436:28,
      |268435437:28,268435438:28,268435439:28,268435440:28,268435441:28,268435442:28,1073741822:30,268435443:28,
      |268435444:28,268435445:28,268435446:28,268435447:28,268435448:28,268435449:28,268435450:28,268435451:28,
      |20:6,1016:10,1017:10,4090:12,8185:13,21:6,248:8,2042:11,
      |1018:10,1019:10,249:8,2043:11,250:8,22:6,23:6,24:6,
      |0:5,1:5,2:5,25:6,26:6,27:6,28:6,29:6,
      |30:6,31:6,92:7,251:8,32764:15,32:6,4091:12,1020:10,
      |8186:13,33:6,93:7,94:7,95:7,96:7,97:7,98:7,
      |99:7,100:7,101:7,102:7,103:7,104:7,105:7,106:7,
      |107:7,108:7,109:7,110:7,111:7,112:7,113:7,114:7,
      |252:8,115:7,253:8,8187:13,524272:19,8188:13,16380:14,34:6,
      |32765:15,3:5,35:6,4:5,36:6,5:5,37:6,38:6,
      |39:6,6:5,116:7,117:7,40:6,41:6,42:6,7:5,
      |43:6,118:7,44:6,8:5,9:5,45:6,119:7,120:7,
      |121:7,122:7,123:7,32766:15,2044:11,16381:14,8189:13,268435452:28,
      |1048550:20,4194258:22,1048551:20,1048552:20,4194259:22,4194260:22,4194261:22,8388569:23,
      |4194262:22,8388570:23,8388571:23,8388572:23,8388573:23,8388574:23,16777195:24,8388575:23,
      |16777196:24,16777197:24,4194263:22,8388576:23,16777198:24,8388577:23,8388578:23,8388579:23,
      |8388580:23,2097116:21,4194264:22,8388581:23,4194265:22,8388582:23,8388583:23,16777199:24,
      |4194266:22,2097117:21,1048553:20,4194267:22,4194268:22,8388584:23,8388585:23,2097118:21,
      |8388586:23,4194269:22,4194270:22,16777200:24,2097119:21,4194271:22,8388587:23,8388588:23,
      |2097120:21,2097121:21,4194272:22,2097122:21,8388589:23,4194273:22,8388590:23,8388591:23,
      |1048554:20,4194274:22,4194275:22,4194276:22,8388592:23,4194277:22,4194278:22,8388593:23,
      |67108832:26,67108833:26,1048555:20,524273:19,4194279:22,8388594:23,4194280:22,33554412:25,
      |67108834:26,67108835:26,67108836:26,134217694:27,134217695:27,67108837:26,16777201:24,33554413:25,
      |524274:19,2097123:21,67108838:26,134217696:27,134217697:27,67108839:26,134217698:27,16777202:24,
      |2097124:21,2097125:21,67108840:26,67108841:26,268435453:28,134217699:27,134217700:27,134217701:27,
      |1048556:20,16777203:24,1048557:20,2097126:21,4194281:22,2097127:21,2097128:21,8388595:23,
      |4194282:22,4194283:22,33554414:25,33554415:25,16777204:24,16777205:24,67108842:26,8388596:23,
      |67108843:26,134217702:27,67108844:26,67108845:26,134217703:27,134217704:27,134217705:27,134217706:27,
      |134217707:27,268435454:28,134217708:27,134217709:27,134217710:27,134217711:27,134217712:27,67108846:26,
      |1073741823:30""".stripMargin

  private val huffCodes = new Array[Int](257)
  private val huffLens = new Array[Int](257)
  locally {
    val entries = HuffmanTable.replace("\n", "").split(",")
    require(entries.length == 257)
    entries.zipWithIndex.foreach { case (e, i) =>
      val Array(c, l) = e.split(":")
      huffCodes(i) = java.lang.Integer.parseUnsignedInt(c)
      huffLens(i) = l.toInt
    }
  }

  /** Huffman decode trie: flat arrays, node 0 = root, -1 = absent;
    * `sym` holds the decoded symbol at leaf nodes. */
  private val trieLeft = scala.collection.mutable.ArrayBuffer(-1)
  private val trieRight = scala.collection.mutable.ArrayBuffer(-1)
  private val trieSym = scala.collection.mutable.ArrayBuffer(-1)
  locally {
    def newNode(): Int = { trieLeft += -1; trieRight += -1; trieSym += -1; trieLeft.length - 1 }
    for (s <- 0 until 257) {
      var node = 0
      var bit = huffLens(s) - 1
      while (bit >= 0) {
        val one = ((huffCodes(s) >>> bit) & 1) == 1
        val next = if (one) trieRight(node) else trieLeft(node)
        val child = if (next == -1) {
          val c = newNode()
          if (one) trieRight(node) = c else trieLeft(node) = c
          c
        } else next
        node = child
        bit -= 1
      }
      trieSym(node) = s
    }
  }

  private[graft] def huffmanDecode(data: Array[Byte]): String = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var node = 0
    var depth = 0 // bits since the last emitted symbol
    var i = 0
    while (i < data.length) {
      var bit = 7
      while (bit >= 0) {
        val one = ((data(i) >>> bit) & 1) == 1
        node = if (one) trieRight(node) else trieLeft(node)
        depth += 1
        if (node == -1) throw new HpackError("invalid huffman code")
        if (trieSym(node) >= 0) {
          if (trieSym(node) == 256) throw new HpackError("EOS in huffman data")
          out.write(trieSym(node))
          node = 0
          depth = 0
        }
        bit -= 1
      }
      i += 1
    }
    // RFC 7541 §5.2: padding must be the EOS prefix (all 1-bits), < 8 bits
    if (depth >= 8) throw new HpackError("huffman padding too long")
    if (depth > 0) {
      // the partial code must be a prefix of EOS = all ones
      // walking `depth` one-bits from the root must land exactly on `node`
      var n = 0
      var k = 0
      var ok = true
      while (k < depth && ok) {
        n = trieRight(n)
        ok = n != -1
        k += 1
      }
      if (!ok || n != node) throw new HpackError("huffman padding not EOS prefix")
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }

  private[graft] def huffmanEncode(s: String): Array[Byte] = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream
    var acc = 0L
    var nbits = 0
    bytes.foreach { b =>
      val sym = b & 0xff
      acc = (acc << huffLens(sym)) | (huffCodes(sym) & 0xffffffffL)
      nbits += huffLens(sym)
      while (nbits >= 8) {
        out.write(((acc >>> (nbits - 8)) & 0xff).toInt)
        nbits -= 8
      }
    }
    if (nbits > 0) { // pad with EOS prefix (1-bits)
      val pad = 8 - nbits
      out.write((((acc << pad) | ((1 << pad) - 1)) & 0xff).toInt)
    }
    out.toByteArray
  }

  // ---- RFC 7541 §5.1 integers
  private[graft] def encodeInt(prefixBits: Int, firstByteHigh: Int, v: Int): Array[Byte] = {
    val max = (1 << prefixBits) - 1
    if (v < max) Array((firstByteHigh | v).toByte)
    else {
      val out = new java.io.ByteArrayOutputStream
      out.write(firstByteHigh | max)
      var rest = v - max
      while (rest >= 128) { out.write((rest & 0x7f) | 0x80); rest >>= 7 }
      out.write(rest)
      out.toByteArray
    }
  }

  /** Streaming cursor over one header block. */
  private final class Cursor(buf: Array[Byte]) {
    var pos = 0
    def hasNext: Boolean = pos < buf.length
    def byte(): Int = {
      if (pos >= buf.length) throw new HpackError("truncated header block")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    def int(prefixBits: Int, first: Int): Int = {
      val max = (1 << prefixBits) - 1
      var v = first & max
      if (v < max) v
      else {
        var shift = 0
        var more = true
        while (more) {
          val b = byte()
          v += (b & 0x7f) << shift
          shift += 7
          if (shift > 28) throw new HpackError("integer overflow")
          more = (b & 0x80) != 0
        }
        v
      }
    }
    def string(): String = {
      val first = byte()
      val huff = (first & 0x80) != 0
      val len = int(7, first)
      if (pos + len > buf.length) throw new HpackError("truncated string literal")
      val data = java.util.Arrays.copyOfRange(buf, pos, pos + len)
      pos += len
      if (huff) huffmanDecode(data)
      else new String(data, StandardCharsets.UTF_8)
    }
  }

  /** Per-connection decoder: owns the dynamic table (RFC 7541 §2.3.2,
    * default max 4096 octets; entry size = name + value + 32). */
  final class Decoder(var maxTableSize: Int = 4096) {
    private val dynamic = scala.collection.mutable.ArrayDeque.empty[(String, String)]
    private var tableSize = 0
    private var sizeLimit = maxTableSize

    // RFC 7541 §4.1: entry size counts UTF-8 OCTETS, not UTF-16 chars —
    // a char-count desyncs the eviction boundary from a conformant peer
    // on any non-ASCII header value
    private def entrySize(e: (String, String)): Int =
      e._1.getBytes(StandardCharsets.UTF_8).length +
        e._2.getBytes(StandardCharsets.UTF_8).length + 32

    private def evict(): Unit =
      while (tableSize > sizeLimit && dynamic.nonEmpty) {
        tableSize -= entrySize(dynamic.removeLast())
      }

    private def add(e: (String, String)): Unit = {
      tableSize += entrySize(e)
      dynamic.prepend(e)
      evict()
    }

    private def lookup(idx: Int): (String, String) =
      if (idx == 0) throw new HpackError("indexed field with index 0")
      else if (idx <= StaticTable.length) StaticTable(idx - 1)
      else {
        val d = idx - StaticTable.length - 1
        if (d >= dynamic.length) throw new HpackError(s"dynamic index $idx out of range")
        dynamic(d)
      }

    /** Decode one complete header block into fields in order. */
    def decode(block: Array[Byte]): Seq[(String, String)] = {
      val cur = new Cursor(block)
      val out = Seq.newBuilder[(String, String)]
      while (cur.hasNext) {
        val first = cur.byte()
        if ((first & 0x80) != 0) { // §6.1 indexed
          out += lookup(cur.int(7, first))
        } else if ((first & 0xc0) == 0x40) { // §6.2.1 literal, incremental indexing
          val idx = cur.int(6, first)
          val name = if (idx == 0) cur.string() else lookup(idx)._1
          val value = cur.string()
          add(name -> value)
          out += (name -> value)
        } else if ((first & 0xe0) == 0x20) { // §6.3 table size update
          sizeLimit = cur.int(5, first)
          if (sizeLimit > maxTableSize)
            throw new HpackError(s"table size update $sizeLimit above settings cap")
          evict()
        } else { // §6.2.2 / §6.2.3 literal without / never indexed
          val idx = cur.int(4, first)
          val name = if (idx == 0) cur.string() else lookup(idx)._1
          val value = cur.string()
          out += (name -> value)
        }
      }
      out.result()
    }
  }

  // ---- encoder helpers for the loopback servers / specs
  def encString(s: String, huffman: Boolean): Array[Byte] = {
    if (huffman) {
      val h = huffmanEncode(s)
      encodeInt(7, 0x80, h.length) ++ h
    } else {
      // length prefix counts the emitted UTF-8 octets, not UTF-16 chars
      val b = s.getBytes(StandardCharsets.UTF_8)
      encodeInt(7, 0x00, b.length) ++ b
    }
  }

  /** §6.1 indexed field. */
  def encIndexed(idx: Int): Array[Byte] = encodeInt(7, 0x80, idx)

  /** §6.2.1 literal with incremental indexing, literal name. */
  def encLiteralIndexing(name: String, value: String, huffman: Boolean = false): Array[Byte] =
    encodeInt(6, 0x40, 0) ++ encString(name, huffman) ++ encString(value, huffman)

  /** §6.2.1 literal with incremental indexing, indexed name. */
  def encLiteralIndexingIdx(nameIdx: Int, value: String, huffman: Boolean = false): Array[Byte] =
    encodeInt(6, 0x40, nameIdx) ++ encString(value, huffman)

  /** §6.3 dynamic table size update. */
  def encSizeUpdate(size: Int): Array[Byte] = encodeInt(5, 0x20, size)
}
