package graft.functions

import java.math.BigInteger

/** Fixed-width arithmetic in the secp256k1 base field — elements are 4
  * little-endian 64-bit limbs, reduction exploits p = 2^256 − c with
  * c = 2^32 + 977 (the standard fast-reduction shape for this prime).
  * Replaces BigInteger.mod in the hot EC ladder; inversion and square
  * roots stay on BigInteger (once per recovery).
  *
  * Carry/borrow use the branch-free bit identities:
  *   carry(a+b = s)  = ((a & b) | ((a | b) & ~s)) >>> 63
  *   borrow(a-b = d) = ((~a & b) | (~(a ^ b) & d)) >>> 63
  */
object Fp256 {
  private val C = 0x1000003D1L // 2^32 + 977 (33 bits)
  val P: Array[Long] = Array(
    0xFFFFFFFEFFFFFC2FL, -1L, -1L, -1L)

  @inline private def umulHi(a: Long, b: Long): Long =
    Math.multiplyHigh(a, b) + ((a >> 63) & b) + ((b >> 63) & a)

  @inline private def carryOf(a: Long, b: Long, s: Long): Long =
    ((a & b) | ((a | b) & ~s)) >>> 63

  @inline private def borrowOf(a: Long, b: Long, d: Long): Long =
    ((~a & b) | (~(a ^ b) & d)) >>> 63

  /** out = a * b mod p. out must not alias a or b. */
  def mul(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    val r = new Array[Long](8)
    var i = 0
    while (i < 4) {
      var carry = 0L
      val ai = a(i)
      var j = 0
      while (j < 4) {
        val lo = ai * b(j)
        val hi = umulHi(ai, b(j))
        val s1 = r(i + j) + lo
        val c1 = carryOf(r(i + j), lo, s1)
        val s2 = s1 + carry
        val c2 = carryOf(s1, carry, s2)
        r(i + j) = s2
        carry = hi + c1 + c2 // hi ≤ 2^64-2, c1+c2 ≤ 2 → no overflow
        j += 1
      }
      r(i + 4) = r(i + 4) + carry
      i += 1
    }
    reduce512(r, out)
  }

  def sqr(a: Array[Long], out: Array[Long]): Unit = mul(a, a, out)

  /** 8 limbs → 4 limbs mod p. */
  private def reduce512(r: Array[Long], out: Array[Long]): Unit = {
    // fold 1: t = low4 + high4 * C  (≤ 5 limbs)
    val t = new Array[Long](4)
    var carry = 0L
    var i = 0
    while (i < 4) {
      val hi = r(i + 4)
      val lo = hi * C
      val up = umulHi(hi, C)
      val s1 = r(i) + lo
      val c1 = carryOf(r(i), lo, s1)
      val s2 = s1 + carry
      val c2 = carryOf(s1, carry, s2)
      t(i) = s2
      carry = up + c1 + c2
      i += 1
    }
    val t4 = carry
    // fold 2: add t4 * C (2-limb value) to t
    val lo2 = t4 * C
    val hi2 = umulHi(t4, C)
    var s = t(0) + lo2
    var c = carryOf(t(0), lo2, s)
    out(0) = s
    val s1 = t(1) + hi2
    val ca = carryOf(t(1), hi2, s1)
    val s2 = s1 + c
    val cb = carryOf(s1, c, s2)
    out(1) = s2
    c = ca + cb
    s = t(2) + c
    c = carryOf(t(2), c, s)
    out(2) = s
    s = t(3) + c
    c = carryOf(t(3), c, s)
    out(3) = s
    if (c != 0) addSmall(out, C) // fold 3 (extremely rare; result < p + small)
    condSubP(out)
  }

  /** x += small (mod 2^256); wrap implies value left the 2^256 range, which
    * our callers use exactly as "+ C ≡ − p". */
  @inline private def addSmall(x: Array[Long], v: Long): Unit = {
    var s = x(0) + v
    var c = carryOf(x(0), v, s)
    x(0) = s
    var i = 1
    while (i < 4 && c != 0) {
      s = x(i) + c
      c = carryOf(x(i), c, s)
      x(i) = s
      i += 1
    }
  }

  @inline private def subSmall(x: Array[Long], v: Long): Unit = {
    var d = x(0) - v
    var b = borrowOf(x(0), v, d)
    x(0) = d
    var i = 1
    while (i < 4 && b != 0) {
      d = x(i) - b
      b = borrowOf(x(i), b, d)
      x(i) = d
      i += 1
    }
  }

  @inline private def geP(x: Array[Long]): Boolean = {
    var i = 3
    while (i >= 0) {
      val cmp = java.lang.Long.compareUnsigned(x(i), P(i))
      if (cmp > 0) return true
      if (cmp < 0) return false
      i -= 1
    }
    true
  }

  @inline private def condSubP(x: Array[Long]): Unit =
    if (geP(x)) addSmall(x, C) // x − p = x + C (mod 2^256)

  /** out = a + b mod p (out may alias a or b). */
  def add(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    var c = 0L
    var i = 0
    while (i < 4) {
      val s1 = a(i) + b(i)
      val c1 = carryOf(a(i), b(i), s1)
      val s2 = s1 + c
      val c2 = carryOf(s1, c, s2)
      out(i) = s2
      c = c1 + c2
      i += 1
    }
    if (c != 0) addSmall(out, C)
    condSubP(out)
  }

  /** out = a - b mod p (out may alias a or b). */
  def sub(a: Array[Long], b: Array[Long], out: Array[Long]): Unit = {
    var bo = 0L
    var i = 0
    while (i < 4) {
      val d1 = a(i) - b(i)
      val b1 = borrowOf(a(i), b(i), d1)
      val d2 = d1 - bo
      val b2 = borrowOf(d1, bo, d2)
      out(i) = d2
      bo = b1 + b2
      i += 1
    }
    if (bo != 0) subSmall(out, C) // x + p = x − C (mod 2^256)
  }

  /** out = 2a mod p. */
  def dbl2(a: Array[Long], out: Array[Long]): Unit = add(a, a, out)

  def isZero(x: Array[Long]): Boolean =
    x(0) == 0 && x(1) == 0 && x(2) == 0 && x(3) == 0

  def equalMod(a: Array[Long], b: Array[Long]): Boolean = {
    val d = new Array[Long](4)
    sub(a, b, d)
    isZero(d)
  }

  // ── conversions ──────────────────────────────────────────────────────

  def fromBigInteger(v: BigInteger): Array[Long] = {
    val out = new Array[Long](4)
    val bytes = v.toByteArray
    var i = 0
    while (i < bytes.length && i < 32) {
      val b = bytes(bytes.length - 1 - i) & 0xffL
      out(i / 8) |= b << (8 * (i % 8))
      i += 1
    }
    out
  }

  def toBigInteger(x: Array[Long]): BigInteger = {
    val bytes = new Array[Byte](33)
    var i = 0
    while (i < 32) {
      bytes(32 - i) = ((x(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    new BigInteger(bytes)
  }

  def copy(x: Array[Long]): Array[Long] = java.util.Arrays.copyOf(x, 4)
}
