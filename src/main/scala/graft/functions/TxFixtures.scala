package graft.functions

import java.math.BigInteger

/** Deterministic synthetic mempool transactions for tests/benchmarks.
  * Builds EIP-1559 (type-2) envelopes with fabricated signatures derived
  * from a keccak counter stream: fully reproducible, no RNG, no wall clock.
  * Roughly half the fabricated (r,s) pairs recover a public key (the others
  * fail the quadratic-residue check), giving a realistic mix of
  * fromValid=true/false rows without needing a signer.
  */
object TxFixtures {
  private val N = new BigInteger(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16)
  private val HalfN = N.shiftRight(1)

  private def tag(label: String, i: Long): Array[Byte] =
    Keccak256.hash(s"graft-fixture:$label:$i".getBytes("UTF-8"))

  /** Raw canonical type-2 tx hex (no 0x prefix flexibility — always 0x…). */
  def rawTxHex(i: Long): String = {
    val chainId = BigInt(1)
    val nonce = BigInt(i % 100000)
    val tip = BigInt(1000000000L + (i % 997))
    val feeCap = BigInt(2000000000L + (i % 9973))
    val gas = BigInt(21000 + (i % 1000))
    val to = tag("to", i / 7).take(20) // ~1/7 address reuse for group-bys
    val value = BigInt(i) * BigInt("1000000000000")
    val data: Array[Byte] =
      if (i % 3 == 0) Array.emptyByteArray
      else tag("data", i).take(4 + (i % 28).toInt)
    val r = new BigInteger(1, tag("r", i)).mod(N.subtract(BigInteger.ONE)).add(BigInteger.ONE)
    val s = new BigInteger(1, tag("s", i)).mod(HalfN.subtract(BigInteger.ONE)).add(BigInteger.ONE)
    val yParity = BigInt(i % 2)

    val payload = Rlp.Lst(Vector(
      Rlp.fromBigInt(chainId), Rlp.fromBigInt(nonce), Rlp.fromBigInt(tip),
      Rlp.fromBigInt(feeCap), Rlp.fromBigInt(gas), Rlp.Bytes(to),
      Rlp.fromBigInt(value), Rlp.Bytes(data), Rlp.Lst(Vector.empty),
      Rlp.fromBigInt(yParity), Rlp.fromBigInt(BigInt(r)), Rlp.fromBigInt(BigInt(s))))
    "0x02" + Keccak256.hex(Rlp.encode(payload))
  }

  /** Collector-CSV-shaped row (timestamp_ms, hash, raw_tx_hex). Every 10th
    * row duplicates its block's first tx at a LATER timestamp, so
    * earliest-wins dedup has real work (common/txsfile.go:121-129 fixture
    * requirement, FIXTURES.md §A2). */
  def rawRow(i: Long): (Long, String, String) = {
    val base = if (i % 10 == 9) i - 9 else i
    val raw = rawTxHex(base)
    val hash = "0x" + Keccak256.hex(Keccak256.hash(EthTx.unhex(raw.substring(2))))
    val ts = 1693785600000L + i * 137
    (ts, hash, raw)
  }

  /** geth/alchemy-style push envelope carrying the tx OBJECT (S6 wire
    * shape) for a type-2 fixture raw tx — fields read back out of the
    * fixture's own canonical encoding. */
  def rpcEnvelopeJson(raw: String): String = {
    val bytes = EthTx.unhex(raw.stripPrefix("0x"))
    val l = Rlp.decode(bytes.drop(1)).asInstanceOf[Rlp.Lst].items
    def hx(i: Int) = "0x" + Rlp.toBigInt(l(i)).toString(16)
    def hb(i: Int) = "0x" + Keccak256.hex(Rlp.toBytes(l(i)))
    s"""{"params":{"result":{"type":"0x2","chainId":"${hx(0)}","nonce":"${hx(1)}",""" +
      s""""maxPriorityFeePerGas":"${hx(2)}","maxFeePerGas":"${hx(3)}","gas":"${hx(4)}",""" +
      s""""to":"${hb(5)}","value":"${hx(6)}","input":"${hb(7)}","accessList":[],""" +
      s""""yParity":"${hx(9)}","r":"${hx(10)}","s":"${hx(11)}"}}}"""
  }

  /** Sourcelog rows for tx index i: 1-3 sources with distinct receipt times. */
  def sourcelogRows(i: Long): Seq[(Long, String, String)] = {
    val (ts, hash, _) = rawRow(i)
    val nSrc = 1 + (i % 3).toInt
    (0 until nSrc).map { k =>
      (ts + k * 50 + (i % 7), hash, "src" + ((i + k) % 5))
    }
  }
}
