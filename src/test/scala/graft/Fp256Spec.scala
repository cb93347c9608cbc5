package graft

import graft.functions.Fp256
import java.math.BigInteger
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential test of the limb field vs BigInteger over random and
  * adversarial (boundary) inputs. */
class Fp256Spec extends AnyFunSuite {
  private val P = new BigInteger(
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)

  private def samples(n: Int): Seq[BigInteger] = {
    val gen = Gen.listOfN(32, Gen.chooseNum(-128, 127).map(_.toByte))
      .map(bs => new BigInteger(1, bs.toArray).mod(P))
    val rand = (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))
    val edges = Seq(
      BigInteger.ZERO, BigInteger.ONE, BigInteger.TWO,
      P.subtract(BigInteger.ONE), P.subtract(BigInteger.TWO),
      BigInteger.ONE.shiftLeft(255).mod(P),
      BigInteger.ONE.shiftLeft(256).subtract(BigInteger.ONE).mod(P),
      new BigInteger("1000003D0", 16), new BigInteger("1000003D1", 16))
    rand ++ edges
  }

  test("round-trip BigInteger <-> limbs") {
    samples(200).foreach { v =>
      assert(Fp256.toBigInteger(Fp256.fromBigInteger(v)) == v, v)
    }
  }

  test("mul matches BigInteger for random/boundary pairs") {
    val vs = samples(120)
    val out = new Array[Long](4)
    for (a <- vs.take(60); b <- vs.takeRight(60)) {
      Fp256.mul(Fp256.fromBigInteger(a), Fp256.fromBigInteger(b), out)
      assert(Fp256.toBigInteger(out) == a.multiply(b).mod(P),
        s"mul($a, $b)")
    }
  }

  test("add/sub match BigInteger") {
    val vs = samples(120)
    val out = new Array[Long](4)
    for (a <- vs.take(60); b <- vs.takeRight(60)) {
      Fp256.add(Fp256.fromBigInteger(a), Fp256.fromBigInteger(b), out)
      assert(Fp256.toBigInteger(out) == a.add(b).mod(P), s"add($a, $b)")
      Fp256.sub(Fp256.fromBigInteger(a), Fp256.fromBigInteger(b), out)
      assert(Fp256.toBigInteger(out) == a.subtract(b).mod(P), s"sub($a, $b)")
    }
  }

  test("sqr and aliasing-safe add/sub") {
    val vs = samples(100)
    val out = new Array[Long](4)
    vs.foreach { a =>
      Fp256.sqr(Fp256.fromBigInteger(a), out)
      assert(Fp256.toBigInteger(out) == a.multiply(a).mod(P), s"sqr($a)")
      val x = Fp256.fromBigInteger(a)
      Fp256.add(x, x, x) // alias all three
      assert(Fp256.toBigInteger(x) == a.add(a).mod(P), s"dbl($a)")
    }
  }
}
