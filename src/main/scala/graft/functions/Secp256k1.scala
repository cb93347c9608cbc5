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

  /** Mixed addition: Jacobian P + affine (x2, y2) — fewer field mults than
    * the general add (the affine point has Z = 1). */
  private def addAffine(p: Pt, x2: BigInteger, y2: BigInteger): Pt = {
    if (p.isInfinity) return Pt(x2, y2, BigInteger.ONE)
    val z1z1 = mod(p.z.multiply(p.z))
    val u2 = mod(x2.multiply(z1z1))
    val s2 = mod(y2.multiply(z1z1).multiply(p.z))
    val h = mod(u2.subtract(p.x))
    val r = mod(s2.subtract(p.y))
    if (h.signum == 0) {
      if (r.signum == 0) return dbl(p)
      return Infinity
    }
    val h2 = mod(h.multiply(h))
    val h3 = mod(h2.multiply(h))
    val u1h2 = mod(p.x.multiply(h2))
    val x3 = mod(r.multiply(r).subtract(h3).subtract(u1h2.shiftLeft(1)))
    val y3 = mod(r.multiply(u1h2.subtract(x3)).subtract(p.y.multiply(h3)))
    Pt(x3, y3, mod(h.multiply(p.z)))
  }

  private def negate(p: Pt): Pt =
    if (p.isInfinity) p else Pt(p.x, P.subtract(p.y), p.z)

  /** Width-4 NAF digits (LSB first): values in {0, ±1, ±3, …, ±15}. */
  private def wnaf4(kIn: BigInteger): Array[Int] = {
    var k = kIn
    val out = new Array[Int](k.bitLength + 1)
    var i = 0
    while (k.signum > 0) {
      if (k.testBit(0)) {
        var d = k.intValue & 15 // k mod 16
        if (d >= 8) d -= 16
        out(i) = d
        k = k.subtract(BigInteger.valueOf(d.toLong))
      }
      k = k.shiftRight(1)
      i += 1
    }
    java.util.Arrays.copyOf(out, i)
  }

  /** Odd multiples 1·G … 15·G normalized to affine, computed once. */
  private lazy val gTable: Array[(BigInteger, BigInteger)] = {
    val pts = new Array[Pt](8)
    pts(0) = G
    val g2 = dbl(G)
    var i = 1
    while (i < 8) { pts(i) = add(pts(i - 1), g2); i += 1 }
    pts.map(toAffine)
  }

  /** k1·R + k2·G via interleaved wNAF-4: ~256 doublings + ~2·(n/5) adds,
    * with G's adds in cheap mixed-affine form (precomputed table). */
  private def shamir(k1: BigInteger, rPoint: Pt, k2: BigInteger, unused: Pt): Pt = {
    // odd multiples of R in Jacobian: 1R, 3R, …, 15R
    val rTab = new Array[Pt](8)
    rTab(0) = rPoint
    val r2 = dbl(rPoint)
    var i = 1
    while (i < 8) { rTab(i) = add(rTab(i - 1), r2); i += 1 }
    val d1 = wnaf4(k1)
    val d2 = wnaf4(k2)
    var acc = Infinity
    var j = math.max(d1.length, d2.length) - 1
    while (j >= 0) {
      acc = dbl(acc)
      if (j < d1.length && d1(j) != 0) {
        val d = d1(j)
        val p = rTab(math.abs(d) >> 1)
        acc = add(acc, if (d > 0) p else negate(p))
      }
      if (j < d2.length && d2(j) != 0) {
        val d = d2(j)
        val (gx, gy) = gTable(math.abs(d) >> 1)
        acc = addAffine(acc, gx, if (d > 0) gy else P.subtract(gy))
      }
      j -= 1
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
