package graft.functions

/** Pure-JVM Keccak-256 (the pre-NIST padding variant used by Ethereum).
  * Standard sponge construction over Keccak-f[1600], rate 1088 bits,
  * multi-rate padding 0x01…0x80. Public algorithm (Keccak reference,
  * keccak.team); no external dependencies so executors need nothing beyond
  * this jar. Behavior validated against the reference's golden tx hashes
  * (/root/reference/common/rlp_test.go:16-35).
  */
object Keccak256 {
  private val RNDC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL,
    0x8000000080008000L, 0x000000000000808bL, 0x0000000080000001L,
    0x8000000080008081L, 0x8000000000008009L, 0x000000000000008aL,
    0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L,
    0x8000000000008003L, 0x8000000000008002L, 0x8000000000000080L,
    0x000000000000800aL, 0x800000008000000aL, 0x8000000080008081L,
    0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)
  private val ROTC: Array[Int] = Array(
    1, 3, 6, 10, 15, 21, 28, 36, 45, 55, 2, 14,
    27, 41, 56, 8, 25, 43, 62, 18, 39, 61, 20, 44)
  private val PILN: Array[Int] = Array(
    10, 7, 11, 17, 18, 3, 5, 16, 8, 21, 24, 4,
    15, 23, 19, 13, 12, 2, 20, 14, 22, 9, 6, 1)

  private val Rate = 136 // bytes; 1600/8 - 2*32

  private def keccakF(st: Array[Long]): Unit = {
    val bc = new Array[Long](5)
    var r = 0
    while (r < 24) {
      // Theta
      var i = 0
      while (i < 5) {
        bc(i) = st(i) ^ st(i + 5) ^ st(i + 10) ^ st(i + 15) ^ st(i + 20)
        i += 1
      }
      i = 0
      while (i < 5) {
        val t = bc((i + 4) % 5) ^ java.lang.Long.rotateLeft(bc((i + 1) % 5), 1)
        var j = 0
        while (j < 25) { st(j + i) ^= t; j += 5 }
        i += 1
      }
      // Rho + Pi
      var t = st(1)
      i = 0
      while (i < 24) {
        val j = PILN(i)
        val tmp = st(j)
        st(j) = java.lang.Long.rotateLeft(t, ROTC(i))
        t = tmp
        i += 1
      }
      // Chi
      var j = 0
      while (j < 25) {
        i = 0
        while (i < 5) { bc(i) = st(j + i); i += 1 }
        i = 0
        while (i < 5) {
          st(j + i) ^= (~bc((i + 1) % 5)) & bc((i + 2) % 5)
          i += 1
        }
        j += 5
      }
      // Iota
      st(0) ^= RNDC(r)
      r += 1
    }
  }

  /** keccak256 digest of `data`, 32 bytes. */
  def hash(data: Array[Byte]): Array[Byte] = {
    val st = new Array[Long](25)
    var off = 0
    // absorb full blocks
    while (data.length - off >= Rate) {
      var i = 0
      while (i < Rate / 8) {
        st(i) ^= leLong(data, off + i * 8)
        i += 1
      }
      keccakF(st)
      off += Rate
    }
    // last (padded) block
    val last = new Array[Byte](Rate)
    System.arraycopy(data, off, last, 0, data.length - off)
    last(data.length - off) = 0x01
    last(Rate - 1) = (last(Rate - 1) | 0x80).toByte
    var i = 0
    while (i < Rate / 8) {
      st(i) ^= leLong(last, i * 8)
      i += 1
    }
    keccakF(st)
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) {
        out(i * 8 + j) = (st(i) >>> (8 * j)).toByte
        j += 1
      }
      i += 1
    }
    out
  }

  private def leLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) {
      v = (v << 8) | (b(off + i) & 0xffL)
      i -= 1
    }
    v
  }

  private val HexChars = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    // nibble lookup, not per-byte format strings — a java.util.Formatter
    // per byte cost ~1 us, which dominated the parse path's row formatting
    // (hash/addresses) and fixture generation
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      out(i * 2) = HexChars(v >>> 4)
      out(i * 2 + 1) = HexChars(v & 15)
      i += 1
    }
    new String(out)
  }
}
