package graft

import graft.functions.{EthTx, Keccak256, Rlp, TxFixtures}
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5 strategy item 3): RLP codec round-trips and
  * fixture determinism. Uses raw ScalaCheck generators with fixed seeds
  * (the scalatest bridge artifact isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 300).flatMap(n => Gen.listOfN(n, Arbitrary.arbByte.arbitrary).map(_.toArray))

  private lazy val genItem: Gen[Rlp.Item] = Gen.sized { size =>
    if (size <= 1) genBytes.map(Rlp.Bytes)
    else Gen.frequency(
      3 -> genBytes.map(Rlp.Bytes),
      1 -> Gen.chooseNum(0, 4).flatMap(n =>
        Gen.listOfN(n, Gen.resize(size / 2, genItem)).map(l => Rlp.Lst(l.toVector))))
  }

  /** Deterministic sample stream. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def eq(a: Rlp.Item, b: Rlp.Item): Boolean = (a, b) match {
    case (Rlp.Bytes(x), Rlp.Bytes(y)) => java.util.Arrays.equals(x, y)
    case (Rlp.Lst(x), Rlp.Lst(y)) =>
      x.length == y.length && x.zip(y).forall { case (i, j) => eq(i, j) }
    case _ => false
  }

  test("rlp: decode(encode(item)) == item for 300 random items") {
    samples(genItem, 300).foreach { item =>
      assert(eq(Rlp.decode(Rlp.encode(item)), item))
    }
  }

  test("rlp: big-int round trip for unsigned values") {
    samples(Gen.chooseNum(0L, Long.MaxValue), 200).foreach { n =>
      val v = BigInt(n)
      assert(Rlp.toBigInt(Rlp.fromBigInt(v)) == v)
    }
  }

  test("keccak: deterministic, 32 bytes, avalanche on 1-bit flip") {
    samples(genBytes, 200).foreach { b =>
      val h1 = Keccak256.hash(b)
      assert(h1.length == 32)
      assert(java.util.Arrays.equals(h1, Keccak256.hash(b)))
      if (b.nonEmpty) {
        val b2 = b.clone(); b2(0) = (b2(0) ^ 1).toByte
        assert(!java.util.Arrays.equals(h1, Keccak256.hash(b2)))
      }
    }
  }

  test("fixture txs always decode and re-encode canonically") {
    samples(Gen.chooseNum(0L, 5000L), 150).foreach { i =>
      val hex = TxFixtures.rawTxHex(i)
      val p = EthTx.decodeHex(hex)
      assert("0x" + Keccak256.hex(p.rawTx) == hex) // already canonical
      assert(p.txType == 2 && p.chainId == "1")
      assert(p.hash == "0x" + Keccak256.hex(Keccak256.hash(p.rawTx)))
    }
  }

  test("rlp: malformed inputs throw RlpException, never loop or OOM") {
    val bad = Seq(
      Array[Byte](0xb8.toByte), // truncated long-string header
      Array[Byte](0xf8.toByte, 0x7f.toByte), // list payload missing
      Array[Byte](0xbb.toByte, 0x7f.toByte, 0x7f.toByte, 0x7f.toByte, 0x7f.toByte), // huge len
      Array[Byte](0x81.toByte)) // short string missing byte
    bad.foreach(b => intercept[Exception](Rlp.decode(b)))
  }
}
