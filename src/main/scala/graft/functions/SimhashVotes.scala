package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom aggregate for the SimHash majority fingerprint:
  * `simhash_chunks(word)` over a doc's word rows → `array<long>(8)` of
  * 16-bit majority chunks of the 128-bit md5-vote fingerprint.
  *
  * Replaces a 129-column `sum` aggregate (one per fingerprint bit plus
  * the row count). That shape is semantically fine but generates a
  * 129-field aggregate class that blows past the whole-stage-codegen
  * field budget and bills multi-second Janino compilation to the first
  * run; a single typed buffer of `long[129]` aggregates the same votes
  * in one tight JIT'd loop with a one-field plan.
  *
  * Bit semantics are IDENTICAL to the column form and to the generated
  * DuckDB twin: word hash = md5 over UTF-8 bytes (Spark's `md5`), chunk
  * j = hex digits 4j+1..4j+4 (= digest bytes 2j, 2j+1 big-endian), vote
  * for bit b of chunk j is the bit's raw 0/1, majority = "2·setBits ≥
  * words" (ties set, matching `SUM(±1) >= 0`).
  */
case class SimhashChunksAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_chunks requires STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_chunks"

  // counts(16*j + b) = set-bit votes for bit b of chunk j; counts(128) = words
  override def createAggregationBuffer(): Array[Long] = new Array[Long](129)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val md = SimhashChunksAgg.digest(v.asInstanceOf[UTF8String].getBytes)
      var j = 0
      while (j < 8) {
        val c = ((md(2 * j) & 0xff) << 8) | (md(2 * j + 1) & 0xff)
        val base = j << 4
        var b = 0
        while (b < 16) { buf(base + b) += (c >> b) & 1; b += 1 }
        j += 1
      }
      buf(128) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 129) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(128) == 0L) return null
    val w = buf(128)
    val out = new Array[Long](8)
    var j = 0
    while (j < 8) {
      var m = 0L
      var b = 0
      while (b < 16) {
        if (buf((j << 4) + b) * 2 >= w) m |= 1L << b
        b += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(129 * 8)
    var i = 0
    while (i < 129) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](129)
    var i = 0
    while (i < 129) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashChunksAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashChunksAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashChunksAgg =
    copy(child = newChild)
}

object SimhashChunksAgg {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val d = md5.get()
    d.reset()
    d.digest(bytes)
  }
}
