package graft

import graft.functions.{EthTx, EthTxEncode, Keccak256, Rlp, TxFixtures}
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from the reference's own tests (FIXTURES.md §A1;
  * /root/reference/common/rlp_test.go:16-35, common/common_test.go:15-56). */
class EthTxSpec extends AnyFunSuite {

  test("keccak256 empty-string vector") {
    // public known-answer test for Keccak-256 (pre-NIST padding)
    assert(Keccak256.hex(Keccak256.hash(Array.emptyByteArray)) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(Keccak256.hex(Keccak256.hash("abc".getBytes)) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("typed EIP-1559 envelope round-trip (rlp_test.go case 1)") {
    val rlp = "0x02f868058080808094f0d9b927f64374f0b48cbe56bc6af212d52ee25a880de0b6b3a764000080c080a03b5086c500757105dbb8c61a8aefce8e496451173e1bec27460a4071522aee79a03cea79b45d6946667f914c86899a761a9c2202512203d858079ae0443e6f776d"
    val p = EthTx.decodeHex(rlp)
    assert(p.hash == "0x30c34b78c15f082c75374849677e24c9797004395b77bd88ea01114c4d0ad371")
    assert("0x" + Keccak256.hex(p.rawTx) == rlp)
    assert(p.txType == 2)
  }

  test("legacy-wrapped typed tx normalizes (rlp_test.go cases 2-3)") {
    val wrapped = "0xb87802f875018201088459682f00850a3cc5ac918252089404be5b8576fc23164b9ee69577fe7857dd6be1988802c346682d9a485880c080a08679e43c770c07395663fbb7fa0d2a8ca9b9535e598c25b9794c50e664c5098ca0366a741acdb68a37df66547001cf31e0c630477f78482d3b7a5778f30c6fbfe1"
    val canonical = "0x02f875018201088459682f00850a3cc5ac918252089404be5b8576fc23164b9ee69577fe7857dd6be1988802c346682d9a485880c080a08679e43c770c07395663fbb7fa0d2a8ca9b9535e598c25b9794c50e664c5098ca0366a741acdb68a37df66547001cf31e0c630477f78482d3b7a5778f30c6fbfe1"
    val hash = "0x470273031fc9ed469bf820795fc7528b9f698a5d33a055eab640637880b66c08"
    val p1 = EthTx.decodeHex(wrapped)
    assert(p1.hash == hash)
    assert("0x" + Keccak256.hex(p1.rawTx) == canonical)
    val p2 = EthTx.decodeHex(canonical)
    assert(p2.hash == hash)
    assert("0x" + Keccak256.hex(p2.rawTx) == canonical)
  }

  test("parse_raw_tx golden fields incl. sender recovery (common_test.go)") {
    val rlp = "0x02f873018305643b840f2c19f08503f8bfbbb2832ab980940ed1bcc400acd34593451e76f854992198995f52808498e5b12ac080a051eb99ae13fd1ace55dd93a4b36eefa5d34e115cd7b9fd5d0ffac07300cbaeb2a0782d9ad12490b45af932d8c98cb3c2fd8c02cdd6317edb36bde2df7556fa9132"
    val p = EthTx.decodeHex(rlp)
    assert(p.hash == "0xbb59e550e4730da43af01b7ae6e1d05b1df501baa4119b8ab6a3427d9b3635b1")
    assert(p.from == "0xd8aa8f3be2fb0c790d3579dcf68a04701c1e33db")
    assert(p.fromValid)
    assert("0x" + Keccak256.hex(p.rawTx) == rlp)
    assert(p.chainId == "1")
    assert(p.to == "0x0ed1bcc400acd34593451e76f854992198995f52")
    assert(p.dataSize == 4)
    assert(p.data4Bytes == "0x98e5b12a")
    assert(p.value == "0")
    assert(EthTx.validationReason(p).isEmpty)
  }

  test("double-wrapped incorrect rlp is fixed (common_test.go test2)") {
    val incorrect = "0xb87502f8720101841dcd65008502540be40082520894b2d513b9a54a999912a57b705bcadf7e71ed595c8701bf330f70d20080c001a090f9ab3c4bed558ce05b50b28a92f39d98c8974977dd0ed925d2b5f1c77a2c40a008ea8be2f31edf3467e2553c1fbabff563a4af458716434c354c771501a6168a"
    val correct = "0x02f8720101841dcd65008502540be40082520894b2d513b9a54a999912a57b705bcadf7e71ed595c8701bf330f70d20080c001a090f9ab3c4bed558ce05b50b28a92f39d98c8974977dd0ed925d2b5f1c77a2c40a008ea8be2f31edf3467e2553c1fbabff563a4af458716434c354c771501a6168a"
    val p = EthTx.decodeHex(incorrect)
    assert(p.hash == "0xdd00ae95e4dc13fdf92682137223d697e346852a61c268faa8806b59a8cb2c9b")
    assert("0x" + Keccak256.hex(p.rawTx) == correct)
  }

  test("S6 tx-object envelope re-encodes to the exact canonical raw bytes") {
    // type 2: decode a fixture's fields, rebuild the RPC JSON object, and
    // the encoder must reproduce the identical raw hex
    def rpcJsonOf(raw: String): String = {
      val bytes = EthTx.unhex(raw.stripPrefix("0x"))
      val l = Rlp.decode(bytes.drop(1)).asInstanceOf[Rlp.Lst].items
      def hx(i: Int) = "0x" + Rlp.toBigInt(l(i)).toString(16)
      def hb(i: Int) = "0x" + Rlp.toBytes(l(i)).map("%02x".format(_)).mkString
      s"""{"type":"0x2","chainId":"${hx(0)}","nonce":"${hx(1)}","maxPriorityFeePerGas":"${hx(2)}","maxFeePerGas":"${hx(3)}","gas":"${hx(4)}","to":"${hb(5)}","value":"${hx(6)}","input":"${hb(7)}","accessList":[],"yParity":"${hx(9)}","r":"${hx(10)}","s":"${hx(11)}"}"""
    }
    (0 until 50).foreach { i =>
      val raw = TxFixtures.rawTxHex(i.toLong)
      val env = s"""{"params":{"result":${rpcJsonOf(raw)}}}"""
      assert(EthTxEncode.fromRpcEnvelope(env).contains(raw), s"fixture $i")
    }
    // legacy (type 0) with an EIP-155 v: encoder must reproduce the rlp
    val legacyItems = Vector(
      Rlp.fromBigInt(BigInt(7)), Rlp.fromBigInt(BigInt(30000000000L)),
      Rlp.fromBigInt(BigInt(21000)), Rlp.Bytes(Array.fill[Byte](20)(0x11)),
      Rlp.fromBigInt(BigInt(12345)), Rlp.Bytes(Array.emptyByteArray),
      Rlp.fromBigInt(BigInt(38)), Rlp.fromBigInt(BigInt(99999)),
      Rlp.fromBigInt(BigInt(88888)))
    val legacyRaw = "0x" + Keccak256.hex(Rlp.encode(Rlp.Lst(legacyItems)))
    val legacyJson =
      """{"type":"0x0","nonce":"0x7","gasPrice":"0x6fc23ac00","gas":"0x5208","to":"0x1111111111111111111111111111111111111111","value":"0x3039","input":"0x","v":"0x26","r":"0x1869f","s":"0x15b38"}"""
    assert(EthTxEncode.fromRpcEnvelope(
      s"""{"params":{"result":$legacyJson}}""").contains(legacyRaw))
    // junk and unsupported types are skipped, not thrown
    assert(EthTxEncode.fromRpcEnvelope("not json").isEmpty)
    assert(EthTxEncode.fromRpcEnvelope("""{"params":{"result":{"type":"0x7f"}}}""").isEmpty)

    // type 1 (EIP-2930) with a non-empty access list
    val addr = Array.fill[Byte](20)(0x22)
    val key = Array.fill[Byte](32)(0x33)
    val aclItem = Rlp.Lst(Vector(Rlp.Bytes(addr),
      Rlp.Lst(Vector(Rlp.Bytes(key)))))
    val t1Items = Vector(
      Rlp.fromBigInt(BigInt(1)), Rlp.fromBigInt(BigInt(9)),
      Rlp.fromBigInt(BigInt(5000000000L)), Rlp.fromBigInt(BigInt(30000)),
      Rlp.Bytes(Array.fill[Byte](20)(0x44)), Rlp.fromBigInt(BigInt(0)),
      Rlp.Bytes(EthTx.unhex("deadbeef")), Rlp.Lst(Vector(aclItem)),
      Rlp.fromBigInt(BigInt(1)), Rlp.fromBigInt(BigInt(777)),
      Rlp.fromBigInt(BigInt(888)))
    val t1Raw = "0x01" + Keccak256.hex(Rlp.encode(Rlp.Lst(t1Items)))
    val t1Json =
      """{"type":"0x1","chainId":"0x1","nonce":"0x9","gasPrice":"0x12a05f200","gas":"0x7530","to":"0x4444444444444444444444444444444444444444","value":"0x0","input":"0xdeadbeef","accessList":[{"address":"0x2222222222222222222222222222222222222222","storageKeys":["0x3333333333333333333333333333333333333333333333333333333333333333"]}],"yParity":"0x1","r":"0x309","s":"0x378"}"""
    assert(EthTxEncode.fromRpcEnvelope(
      s"""{"params":{"result":$t1Json}}""").contains(t1Raw))

    // type 3 (EIP-4844) payload-only, with blob hashes
    val blobHash = "01" + "ab" * 31
    val t3Items = Vector(
      Rlp.fromBigInt(BigInt(1)), Rlp.fromBigInt(BigInt(2)),
      Rlp.fromBigInt(BigInt(10)), Rlp.fromBigInt(BigInt(20)),
      Rlp.fromBigInt(BigInt(21000)), Rlp.Bytes(Array.fill[Byte](20)(0x55)),
      Rlp.fromBigInt(BigInt(0)), Rlp.Bytes(Array.emptyByteArray),
      Rlp.Lst(Vector.empty), Rlp.fromBigInt(BigInt(3)),
      Rlp.Lst(Vector(Rlp.Bytes(EthTx.unhex(blobHash)))),
      Rlp.fromBigInt(BigInt(0)), Rlp.fromBigInt(BigInt(11)), Rlp.fromBigInt(BigInt(12)))
    val t3Raw = "0x03" + Keccak256.hex(Rlp.encode(Rlp.Lst(t3Items)))
    val t3Json =
      s"""{"type":"0x3","chainId":"0x1","nonce":"0x2","maxPriorityFeePerGas":"0xa","maxFeePerGas":"0x14","gas":"0x5208","to":"0x5555555555555555555555555555555555555555","value":"0x0","input":"0x","accessList":[],"maxFeePerBlobGas":"0x3","blobVersionedHashes":["0x$blobHash"],"yParity":"0x0","r":"0xb","s":"0xc"}"""
    assert(EthTxEncode.fromRpcEnvelope(
      s"""{"params":{"result":$t3Json}}""").contains(t3Raw))
  }

  test("malformed input throws, not crashes") {
    intercept[Exception](EthTx.decodeHex("0x"))
    intercept[Exception](EthTx.decodeHex("0xdeadbeef"))
    intercept[Exception](EthTx.decodeHex("0x05f8")) // unsupported type
  }
}
