package graft

import graft.streaming.ProtoWire
import org.scalatest.funsuite.AnyFunSuite

/** Wire-level checks for the minimal protobuf codec behind the S8-S10
  * gRPC feed decode. */
class ProtoWireSpec extends AnyFunSuite {
  import ProtoWire._

  test("varint round-trips the boundary values") {
    for (v <- Seq(0L, 1L, 127L, 128L, 300L, 16383L, 16384L,
      Int.MaxValue.toLong, Long.MaxValue, -1L, Long.MinValue)) {
      val enc = varintField(3, v)
      val Seq(f) = fields(enc)
      assert(f.number == 3 && f.wireType == WtVarint && f.varint == v,
        s"varint $v decoded as ${f.varint}")
    }
    // canonical wire bytes for the classic example: 300 = 0xAC 0x02
    assert(varint(300L).map(_ & 0xFF).toSeq == Seq(0xAC, 0x02))
  }

  test("fixed32/fixed64 are little-endian and round-trip") {
    val enc = fixed32Field(1, 0x12345678) ++ fixed64Field(2, 0x1122334455667788L)
    val fs = fields(enc)
    assert(fs(0).varint == 0x12345678L)
    assert(fs(1).varint == 0x1122334455667788L)
    // little-endian on the wire: low byte first
    assert((fixed32Field(1, 0x12345678)(1) & 0xFF) == 0x78)
  }

  test("unknown fields of every wire type are decoded past, not fatal") {
    val payload = "tx-bytes".getBytes("UTF-8")
    val msg = varintField(7, 42L) ++ fixed64Field(8, 1L) ++
      lenField(BlxTxRawTx, payload) ++ fixed32Field(9, 2) ++
      lenField(99, "future-field".getBytes("UTF-8"))
    assert(firstBytes(msg, BlxTxRawTx).map(_.toSeq) == Some(payload.toSeq))
  }

  test("truncation and malformed keys raise WireError, never mis-decode") {
    val good = lenField(1, "abc".getBytes("UTF-8"))
    assertThrows[WireError](fields(good.dropRight(1)))       // truncated bytes
    assertThrows[WireError](fields(Array(0x80.toByte)))      // truncated varint key
    assertThrows[WireError](fields(varintField(1, 1L).dropRight(1))) // truncated value
    assertThrows[WireError](fields(tag(1, 3)))               // group wire type
    assertThrows[WireError](fields(varint(WtVarint.toLong))) // field number 0
  }

  test("bloxroute TxsReply decode matches the reference getter surface") {
    val (_, _, raw1) = graft.functions.TxFixtures.rawRow(1L)
    val (_, _, raw2) = graft.functions.TxFixtures.rawRow(2L)
    def rawBytes(h: String) = graft.functions.EthTx.unhex(h.stripPrefix("0x"))
    def tx(h: String) =
      lenField(BlxTxHash, new Array[Byte](32)) ++ lenField(BlxTxRawTx, rawBytes(h))
    // a reply with two txs + an unknown trailing field
    val reply = lenField(BlxReplyTx, tx(raw1)) ++ lenField(BlxReplyTx, tx(raw2)) ++
      varintField(50, 123L)
    val recs = BloxrouteProto.records(reply, 1700000000123L)
    assert(recs.length == 2, s"expected 2 records, got ${recs.length}")
    assert(recs.head.contains(""""source":"bloxroute""""))
    assert(recs.head.contains(raw1.toLowerCase), "rawTx hex missing from envelope")
    assert(recs.head.contains(""""timestamp_ms":1700000000123"""))
  }

  test("eden and chainbound decode one rlp per message; junk is skipped") {
    val (_, _, raw) = graft.functions.TxFixtures.rawRow(3L)
    val rawB = graft.functions.EthTx.unhex(raw.stripPrefix("0x"))
    assert(EdenProto.records(lenField(EdenRlp, rawB), 1L)
      .exists(r => r.contains(""""source":"eden"""") && r.contains(raw.toLowerCase)))
    assert(ChainboundProto.records(
      lenField(CbRlpTransaction, rawB) ++ lenField(CbSender, new Array[Byte](20)), 1L)
      .exists(r => r.contains(""""source":"chainbound"""") && r.contains(raw.toLowerCase)))
    // skip-on-error: garbage bodies yield zero records, no throw
    val junk = Array[Byte](0x80.toByte, 0x01, 0x02)
    assert(BloxrouteProto.records(junk, 1L).isEmpty)
    assert(EdenProto.records(junk, 1L).isEmpty)
    assert(ChainboundProto.records(junk, 1L).isEmpty)
    // a reply whose fields don't include the payload: zero records
    assert(EdenProto.records(varintField(9, 1L), 1L).isEmpty)
  }

  test("decoded proto envelopes flow through decodeEnvelopes to engine rows") {
    val spark = SparkTestSession.spark
    val raws = (0 until 6).map(i => graft.functions.TxFixtures.rawRow(i.toLong)._3)
    def rawBytes(h: String) = graft.functions.EthTx.unhex(h.stripPrefix("0x"))
    val recs =
      raws.take(2).flatMap(r => BloxrouteProto.records(
        lenField(BlxReplyTx, lenField(BlxTxRawTx, rawBytes(r))), 1700000000000L)) ++
      raws.slice(2, 4).flatMap(r => EdenProto.records(
        lenField(EdenRlp, rawBytes(r)), 1700000000001L)) ++
      raws.drop(4).flatMap(r => ChainboundProto.records(
        lenField(CbRlpTransaction, rawBytes(r)), 1700000000002L))
    assert(recs.length == 6)
    val dir = java.nio.file.Files.createTempDirectory("graft-proto-env").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/envelopes.json"), recs.mkString("\n"))
    val decoded = graft.streaming.Collect.decodeEnvelopes(
      spark.read.schema(graft.streaming.Collect.envelopeFeedSchema).json(dir))
    val got = decoded.collect()
    assert(got.length == 6, "every proto-decoded tx must survive the columnar decode")
    assert(got.map(r => r.getAs[String]("raw_tx_hex")).toSet ==
      raws.map(_.toLowerCase).toSet)
    assert(got.map(r => r.getAs[String]("source")).toSet ==
      Set("bloxroute", "eden", "chainbound"))
    assert(got.forall(r => r.getAs[String]("hash") != null))
  }
}
