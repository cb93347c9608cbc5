package graft

import graft.streaming.ProtoWire
import org.scalatest.funsuite.AnyFunSuite

/** Differential validation of the hand-rolled proto-wire codec against the
  * canonical protobuf runtime (the protobuf-java implementation shaded
  * into orc-core on Spark's classpath — same wire format, authoritative
  * encoder/decoder). Both directions: our decoder reads its bytes, its
  * decoder reads ours. */
class ProtoWireDiffSpec extends AnyFunSuite {
  import org.apache.orc.protobuf.{CodedInputStream, CodedOutputStream}

  private val rnd = new scala.util.Random(20260813L)

  private case class F(number: Int, wireType: Int, varint: Long, bytes: Array[Byte])

  private def randomFields(n: Int): Seq[F] = (1 to n).map { _ =>
    // field numbers across the 1-byte and multi-byte tag ranges
    val num = rnd.nextInt(3) match {
      case 0 => 1 + rnd.nextInt(15)
      case 1 => 16 + rnd.nextInt(2032)
      case _ => 2048 + rnd.nextInt(100000)
    }
    rnd.nextInt(4) match {
      case 0 => F(num, ProtoWire.WtVarint, rnd.nextLong(), null)
      case 1 => F(num, ProtoWire.WtFixed64, rnd.nextLong(), null)
      case 2 => F(num, ProtoWire.WtFixed32, rnd.nextInt() & 0xffffffffL, null)
      case _ =>
        val b = new Array[Byte](rnd.nextInt(64))
        rnd.nextBytes(b)
        F(num, ProtoWire.WtLen, 0L, b)
    }
  }

  test("our decoder reads the canonical encoder's bytes exactly") {
    for (_ <- 1 to 50) {
      val fields = randomFields(1 + rnd.nextInt(12))
      val buf = new Array[Byte](1 << 16)
      val cos = CodedOutputStream.newInstance(buf)
      fields.foreach { f =>
        f.wireType match {
          case ProtoWire.WtVarint => cos.writeUInt64(f.number, f.varint)
          case ProtoWire.WtFixed64 => cos.writeFixed64(f.number, f.varint)
          case ProtoWire.WtFixed32 => cos.writeFixed32(f.number, f.varint.toInt)
          case ProtoWire.WtLen => cos.writeByteArray(f.number, f.bytes)
        }
      }
      cos.flush()
      val msg = java.util.Arrays.copyOf(buf, (1 << 16) - cos.spaceLeft())
      val got = ProtoWire.fields(msg)
      assert(got.length == fields.length)
      got.zip(fields).foreach { case (g, e) =>
        assert(g.number == e.number && g.wireType == e.wireType,
          s"tag mismatch: $g vs $e")
        if (e.wireType == ProtoWire.WtLen)
          assert(g.bytes.toSeq == e.bytes.toSeq, "bytes mismatch")
        else assert(g.varint == e.varint, s"value mismatch: $g vs $e")
      }
    }
  }

  test("the canonical decoder reads our encoder's bytes exactly") {
    for (_ <- 1 to 50) {
      val fields = randomFields(1 + rnd.nextInt(12))
      val msg = fields.flatMap { f =>
        f.wireType match {
          case ProtoWire.WtVarint => ProtoWire.varintField(f.number, f.varint)
          case ProtoWire.WtFixed64 => ProtoWire.fixed64Field(f.number, f.varint)
          case ProtoWire.WtFixed32 => ProtoWire.fixed32Field(f.number, f.varint.toInt)
          case ProtoWire.WtLen => ProtoWire.lenField(f.number, f.bytes)
        }
      }.toArray
      val cis = CodedInputStream.newInstance(msg)
      fields.foreach { e =>
        val tag = cis.readTag()
        assert(tag >>> 3 == e.number && (tag & 7) == e.wireType,
          s"canonical decoder saw tag $tag for $e")
        e.wireType match {
          case ProtoWire.WtVarint => assert(cis.readUInt64() == e.varint)
          case ProtoWire.WtFixed64 => assert(cis.readFixed64() == e.varint)
          case ProtoWire.WtFixed32 =>
            assert((cis.readFixed32().toLong & 0xffffffffL) == e.varint)
          case ProtoWire.WtLen =>
            assert(cis.readByteArray().toSeq == e.bytes.toSeq)
        }
      }
      assert(cis.isAtEnd, "canonical decoder left trailing bytes")
    }
  }
}
