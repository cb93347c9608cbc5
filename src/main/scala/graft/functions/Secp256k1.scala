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

  /** Jacobian point (x = X/Z², y = Y/Z³); Z = 0 ⇒ infinity. Projective
    * coordinates avoid the per-operation modular inversion of affine math
    * (one inversion total, at the end) — the standard EC speedup. */
  private final case class Pt(x: BigInteger, y: BigInteger, z: BigInteger) {
    def isInfinity: Boolean = z.signum == 0
  }
  private val Infinity = Pt(BigInteger.ONE, BigInteger.ONE, BigInteger.ZERO)
  private val G = Pt(Gx, Gy, BigInteger.ONE)

  private def mod(v: BigInteger): BigInteger = {
    val m = v.mod(P); m
  }

  /** 2·A, Jacobian doubling for a = 0 (secp256k1). */
  private def dbl(p: Pt): Pt = {
    if (p.isInfinity || p.y.signum == 0) return Infinity
    val a = mod(p.x.multiply(p.x)) // X²
    val b = mod(p.y.multiply(p.y)) // Y²
    val c = mod(b.multiply(b)) // Y⁴
    val xb = p.x.add(b)
    val d = mod(xb.multiply(xb).subtract(a).subtract(c).shiftLeft(1)) // 2((X+Y²)²−X²−Y⁴)
    val e = mod(a.multiply(BigInteger.valueOf(3))) // 3X²
    val x3 = mod(e.multiply(e).subtract(d.shiftLeft(1)))
    val y3 = mod(e.multiply(d.subtract(x3)).subtract(c.shiftLeft(3)))
    val z3 = mod(p.y.multiply(p.z).shiftLeft(1))
    Pt(x3, y3, z3)
  }

  /** A + B, general Jacobian addition. */
  private def add(p: Pt, q: Pt): Pt = {
    if (p.isInfinity) return q
    if (q.isInfinity) return p
    val z1z1 = mod(p.z.multiply(p.z))
    val z2z2 = mod(q.z.multiply(q.z))
    val u1 = mod(p.x.multiply(z2z2))
    val u2 = mod(q.x.multiply(z1z1))
    val s1 = mod(p.y.multiply(z2z2).multiply(q.z))
    val s2 = mod(q.y.multiply(z1z1).multiply(p.z))
    val h = mod(u2.subtract(u1))
    val r = mod(s2.subtract(s1))
    if (h.signum == 0) {
      if (r.signum == 0) return dbl(p)
      return Infinity
    }
    val h2 = mod(h.multiply(h))
    val h3 = mod(h2.multiply(h))
    val u1h2 = mod(u1.multiply(h2))
    val x3 = mod(r.multiply(r).subtract(h3).subtract(u1h2.shiftLeft(1)))
    val y3 = mod(r.multiply(u1h2.subtract(x3)).subtract(s1.multiply(h3)))
    val z3 = mod(h.multiply(p.z).multiply(q.z))
    Pt(x3, y3, z3)
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

  /** Jacobian → affine (the one inversion). */
  private def toAffine(p: Pt): (BigInteger, BigInteger) = {
    val zInv = p.z.modInverse(P)
    val zInv2 = mod(zInv.multiply(zInv))
    (mod(p.x.multiply(zInv2)), mod(p.y.multiply(zInv2).multiply(zInv)))
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
    val rp = Pt(x, y, BigInteger.ONE)
    val e = new BigInteger(1, msgHash).mod(N)
    val rInv = r.modInverse(N)
    // Q = r⁻¹ (s·R − e·G)
    val q = shamir(
      s.multiply(rInv).mod(N), rp,
      N.subtract(e).multiply(rInv).mod(N), G)
    if (q.isInfinity) return None
    val (qx, qy) = toAffine(q)
    val pub = new Array[Byte](64)
    copyPadded(qx, pub, 0)
    copyPadded(qy, pub, 32)
    Some(Keccak256.hash(pub).slice(12, 32))
  }

  private def copyPadded(v: BigInteger, out: Array[Byte], off: Int): Unit = {
    val raw = v.toByteArray
    val src = if (raw.length > 32) raw.slice(raw.length - 32, raw.length) else raw
    System.arraycopy(src, 0, out, off + 32 - src.length, src.length)
  }
}
