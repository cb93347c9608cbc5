package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing selection: `winnow_sel(text, k, w)` → sorted distinct
  * `array<string>` of the MOSS-selected fingerprints — the minimum
  * md5-hex over every window of `w` consecutive char `k`-gram hashes.
  *
  * Replaces a posexplode → md5 → two-window chain that shuffled and
  * sorted one row PER CHARACTER POSITION of the corpus (at 100 TB the
  * window exchange carries ~32 bytes of hex per corpus char — orders of
  * magnitude more than the documents themselves). This expression keeps
  * the whole selection scan-local: one pass per doc, a monotonic deque
  * for the sliding minimum, output bounded by the selected-set size
  * (≈ 2/(w+1) of positions).
  *
  * Value semantics are bit-identical to the replaced chain and to the
  * DuckDB twin: grams are codepoint substrings (`substringSQL`, matching
  * DuckDB `substr`), hashes are md5 hex of the gram's UTF-8 bytes, and
  * window minima compare as hex strings (= unsigned digest order).
  * Docs shorter than k+w−1 chars select nothing (no complete window).
  */
case class WinnowSelExpr(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType && second.dataType == IntegerType &&
      third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_sel requires (string, int, int), got " +
        s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_sel"

  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any =
    WinnowOps.compute(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) =>
      s"${ev.value} = graft.functions.WinnowOps.compute($t, $k, $w);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): WinnowSelExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object WinnowOps {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val HexDigits = "0123456789abcdef".toCharArray

  private def hexOf(dig: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((dig(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(dig(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def compute(str: UTF8String, k: Int, w: Int): GenericArrayData = {
    require(k > 0 && w > 0, s"winnow_sel requires k > 0 and w > 0, got k=$k w=$w")
    val bytes = str.getBytes
    // one pass to index every char's byte offset — substringSQL would
    // rescan from the string head per position (quadratic per doc)
    val offs = new Array[Int](str.numChars() + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      offs(ci) = bi
      ci += 1
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
    }
    offs(ci) = bytes.length
    val n = ci
    val np = n - k + 1 // number of k-gram positions
    if (np < w) return new GenericArrayData(Array.empty[Any])
    val d = md5.get()
    val hashes = new Array[String](np)
    var i = 0
    while (i < np) {
      // gram = chars [i, i+k) — same UTF-8 bytes as substringSQL(i+1, k)
      // in the replaced chain / DuckDB substr
      d.reset()
      d.update(bytes, offs(i), offs(i + k) - offs(i))
      hashes(i) = hexOf(d.digest())
      i += 1
    }
    // sliding-window minimum via monotonic deque (indices, increasing
    // hash order front to back); only the VALUE is consumed so tie
    // handling cannot affect the output
    val selected = new java.util.TreeSet[String]()
    val deque = new Array[Int](np)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < np) {
      while (tail > head && hashes(deque(tail - 1)).compareTo(hashes(i)) >= 0) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) selected.add(hashes(deque(head)))
      i += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}
