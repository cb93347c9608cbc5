package graft.functions

import java.math.BigInteger

/** secp256k1 ECDSA public-key recovery (SEC 1 v2 §4.1.6) in pure JVM —
  * BigInteger Jacobian point arithmetic, no native libraries. Used by
  * parse_raw_tx for sender recovery (the `types.Sender` behavior at
  * /root/reference/common/txsfile.go:166). Public curve parameters.
  */
object Secp256k1 {
  private val P = new BigInteger(
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)
  private val N = new BigInteger(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16)
  private val HalfN = N.shiftRight(1)
  private val Gx = new BigInteger(
    "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798", 16)
  private val Gy = new BigInteger(
    "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8", 16)
  private val Seven = BigInteger.valueOf(7)
  // (p+1)/4 — sqrt exponent, p ≡ 3 (mod 4)
  private val SqrtExp = P.add(BigInteger.ONE).shiftRight(2)

  /** Affine point; null coords = infinity. */
  private final case class Pt(x: BigInteger, y: BigInteger) {
    def isInfinity: Boolean = x == null
  }
  private val Infinity = Pt(null, null)
  private val G = Pt(Gx, Gy)

  private def add(a: Pt, b: Pt): Pt = {
    if (a.isInfinity) return b
    if (b.isInfinity) return a
    if (a.x == b.x) {
      if (a.y.add(b.y).mod(P).signum == 0) return Infinity
      return dbl(a)
    }
    val l = b.y.subtract(a.y).multiply(b.x.subtract(a.x).modInverse(P)).mod(P)
    val x3 = l.multiply(l).subtract(a.x).subtract(b.x).mod(P)
    val y3 = l.multiply(a.x.subtract(x3)).subtract(a.y).mod(P)
    Pt(x3, y3)
  }

  private def dbl(a: Pt): Pt = {
    if (a.isInfinity || a.y.signum == 0) return Infinity
    val l = a.x.multiply(a.x).multiply(BigInteger.valueOf(3))
      .multiply(a.y.shiftLeft(1).modInverse(P)).mod(P)
    val x3 = l.multiply(l).subtract(a.x.shiftLeft(1)).mod(P)
    val y3 = l.multiply(a.x.subtract(x3)).subtract(a.y).mod(P)
    Pt(x3, y3)
  }

  /** Shamir's trick: k1*A + k2*B in one double-and-add ladder. */
  private def shamir(k1: BigInteger, a: Pt, k2: BigInteger, b: Pt): Pt = {
    val ab = add(a, b)
    val bits = math.max(k1.bitLength, k2.bitLength)
    var acc = Infinity
    var i = bits - 1
    while (i >= 0) {
      acc = dbl(acc)
      val t1 = k1.testBit(i)
      val t2 = k2.testBit(i)
      if (t1 && t2) acc = add(acc, ab)
      else if (t1) acc = add(acc, a)
      else if (t2) acc = add(acc, b)
      i -= 1
    }
    acc
  }

  /** Recover the uncompressed public key point from a signature.
    * Enforces go-ethereum's rules for modern signers: r,s ∈ [1, n-1] and
    * s ≤ n/2 (low-s, EIP-2 / homestead).
    * @return 20-byte Ethereum address (keccak(pub)[12..]) or None. */
  def recoverAddress(msgHash: Array[Byte], r: BigInteger, s: BigInteger, recId: Int): Option[Array[Byte]] = {
    if (recId < 0 || recId > 3) return None
    if (r.signum <= 0 || s.signum <= 0) return None
    if (r.compareTo(N) >= 0 || s.compareTo(N) >= 0) return None
    if (s.compareTo(HalfN) > 0) return None // low-s rule
    val x = r.add(BigInteger.valueOf(recId >> 1).multiply(N))
    if (x.compareTo(P) >= 0) return None
    // y² = x³ + 7
    val ySq = x.modPow(BigInteger.valueOf(3), P).add(Seven).mod(P)
    var y = ySq.modPow(SqrtExp, P)
    if (y.multiply(y).mod(P) != ySq) return None // not a quadratic residue
    val wantOdd = (recId & 1) == 1
    if (y.testBit(0) != wantOdd) y = P.subtract(y)
    val rp = Pt(x, y)
    val e = new BigInteger(1, msgHash).mod(N)
    val rInv = r.modInverse(N)
    // Q = r⁻¹ (s·R − e·G)
    val q = shamir(
      s.multiply(rInv).mod(N), rp,
      N.subtract(e).multiply(rInv).mod(N), G)
    if (q.isInfinity) return None
    val pub = new Array[Byte](64)
    copyPadded(q.x, pub, 0)
    copyPadded(q.y, pub, 32)
    Some(Keccak256.hash(pub).slice(12, 32))
  }

  private def copyPadded(v: BigInteger, out: Array[Byte], off: Int): Unit = {
    val raw = v.toByteArray
    val src = if (raw.length > 32) raw.slice(raw.length - 32, raw.length) else raw
    System.arraycopy(src, 0, out, off + 32 - src.length, src.length)
  }
}
