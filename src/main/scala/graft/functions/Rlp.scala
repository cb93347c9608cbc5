package graft.functions

/** Minimal RLP codec (Ethereum's Recursive Length Prefix encoding —
  * public spec, ethereum.org/en/developers/docs/data-structures-and-encoding/rlp).
  * Needed by the parse_raw_tx projection (SURVEY.md §2.8) for EIP-2718
  * envelope handling (/root/reference/common/utils.go:69-95 behavior).
  */
object Rlp {
  sealed trait Item
  final case class Bytes(value: Array[Byte]) extends Item
  final case class Lst(items: Vector[Item]) extends Item

  final case class RlpException(msg: String) extends Exception(msg)

  /** Decode the item starting at `off`; returns (item, next offset). */
  def decodeAt(b: Array[Byte], off: Int): (Item, Int) = {
    if (off >= b.length) throw RlpException("truncated")
    val prefix = b(off) & 0xff
    if (prefix < 0x80) {
      (Bytes(Array(b(off))), off + 1)
    } else if (prefix <= 0xb7) {
      val len = prefix - 0x80
      checkLen(b, off + 1, len)
      (Bytes(b.slice(off + 1, off + 1 + len)), off + 1 + len)
    } else if (prefix <= 0xbf) {
      val lenOfLen = prefix - 0xb7
      val len = beInt(b, off + 1, lenOfLen)
      checkLen(b, off + 1 + lenOfLen, len)
      (Bytes(b.slice(off + 1 + lenOfLen, off + 1 + lenOfLen + len)), off + 1 + lenOfLen + len)
    } else if (prefix <= 0xf7) {
      val len = prefix - 0xc0
      checkLen(b, off + 1, len)
      (decodeList(b, off + 1, len), off + 1 + len)
    } else {
      val lenOfLen = prefix - 0xf7
      val len = beInt(b, off + 1, lenOfLen)
      checkLen(b, off + 1 + lenOfLen, len)
      (decodeList(b, off + 1 + lenOfLen, len), off + 1 + lenOfLen + len)
    }
  }

  def decode(b: Array[Byte]): Item = {
    val (item, next) = decodeAt(b, 0)
    if (next != b.length) throw RlpException(s"trailing bytes: $next != ${b.length}")
    item
  }

  private def decodeList(b: Array[Byte], start: Int, len: Int): Lst = {
    var off = start
    val end = start + len
    val items = Vector.newBuilder[Item]
    while (off < end) {
      val (item, next) = decodeAt(b, off)
      items += item
      off = next
    }
    if (off != end) throw RlpException("list payload overrun")
    Lst(items.result())
  }

  def encode(item: Item): Array[Byte] = item match {
    case Bytes(v) =>
      if (v.length == 1 && (v(0) & 0xff) < 0x80) v
      else lengthPrefix(v.length, 0x80) ++ v
    case Lst(items) =>
      val payload = items.toArray.flatMap(encode)
      lengthPrefix(payload.length, 0xc0) ++ payload
  }

  private def lengthPrefix(len: Int, base: Int): Array[Byte] =
    if (len <= 55) Array((base + len).toByte)
    else {
      val lenBytes = beBytes(len)
      Array((base + 55 + lenBytes.length).toByte) ++ lenBytes
    }

  private def beBytes(v: Int): Array[Byte] = {
    var n = v
    var out = List.empty[Byte]
    while (n > 0) { out = (n & 0xff).toByte :: out; n >>>= 8 }
    out.toArray
  }

  private def beInt(b: Array[Byte], off: Int, len: Int): Int = {
    if (len > 4) throw RlpException("length too large")
    checkLen(b, off, len)
    var v = 0
    var i = 0
    while (i < len) { v = (v << 8) | (b(off + i) & 0xff); i += 1 }
    if (v < 0) throw RlpException("negative length")
    v
  }

  private def checkLen(b: Array[Byte], off: Int, len: Int): Unit =
    if (off + len > b.length) throw RlpException("truncated payload")

  /** Unsigned big-endian bytes → BigInt (empty = 0). */
  def toBigInt(item: Item): BigInt = item match {
    case Bytes(v) => if (v.isEmpty) BigInt(0) else BigInt(1, v)
    case _        => throw RlpException("expected bytes, got list")
  }

  def toBytes(item: Item): Array[Byte] = item match {
    case Bytes(v) => v
    case _        => throw RlpException("expected bytes, got list")
  }

  def fromBigInt(v: BigInt): Bytes =
    if (v == 0) Bytes(Array.emptyByteArray)
    else {
      val raw = v.toByteArray
      Bytes(if (raw(0) == 0) raw.tail else raw) // strip sign byte
    }
}
