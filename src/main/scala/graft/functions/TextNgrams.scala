package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.call_function
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for word n-gram generation:
  * `word_ngrams(str, n)` → `array<string>` of all space-joined n-grams of
  * the whitespace-split input, in order (NOT distinct — bigram repetition
  * counts need the duplicates; wrap in `array_distinct` for set
  * semantics).
  *
  * SURVEY.md §2.8 preference order in action: the equivalent
  * `transform(sequence(…), i => concat_ws(" ", slice(ws, i, n)))` chain
  * runs INTERPRETED per element (higher-order lambdas have no codegen) —
  * measured 5.9 s for one pass over sf0.1 documents vs ~0.3 s for this
  * expression. Token semantics are identical to
  * `split(str, "\\s+")` (Java regex, limit -1), so the DuckDB
  * `string_split_regex` oracles keep hash-matching.
  */
case class WordNgramsExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires (string, int), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(str: Any, n: Any): Any =
    NgramOps.compute(str.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.NgramOps.compute($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgramsExpr =
    copy(left = newLeft, right = newRight)
}

/** Gram builder for [[WordNgramsExpr]] (static so generated code calls
  * straight in, like Keccak256.hash / LshOps.compute). */
object NgramOps {
  // the exact pattern Spark's split(str, "\\s+") compiles — keeping the
  // token semantics (incl. a leading empty token on untrimmed input,
  // limit -1 trailing behavior) bit-identical to the lambda chain this
  // expression replaces and to the string_split_regex DuckDB oracles
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  def computeChars(str: UTF8String, n: Int): GenericArrayData = {
    val len = str.numChars()
    val count = len - n + 1
    if (count <= 0 || n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = str.substringSQL(i + 1, n) // 1-based, codepoint semantics
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct packed-codepoint n-gram codes for
    * [[CharNgramCodesExpr]]: 21 bits per codepoint (covers U+10FFFF), so
    * n ≤ 3 fits a long and long order == codepoint-lexicographic order.
    * Dedup by primitive sort + squash — no boxing, no hash set. */
  def computeCharCodes(str: UTF8String, n: Int): org.apache.spark.sql.catalyst.expressions.UnsafeArrayData = {
    require(n > 0 && n <= 3, s"char_ngram_codes supports n in 1..3, got $n")
    val s = str.toString
    val total = s.codePointCount(0, s.length)
    val count = total - n + 1
    if (count <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val codes = new Array[Long](count)
    // rolling window over codepoints: shift in 21-bit fields, mask to n
    val mask = if (n == 3) (1L << 63) - 1 else (1L << (21 * n)) - 1
    var acc = 0L
    var seen = 0
    var i = 0 // char index into s
    var w = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      acc = ((acc << 21) | cp) & mask
      seen += 1
      if (seen >= n) { codes(w) = acc; w += 1 }
    }
    java.util.Arrays.sort(codes)
    var out = 1
    var k = 1
    while (k < count) {
      if (codes(k) != codes(k - 1)) { codes(out) = codes(k); out += 1 }
      k += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(codes, out))
  }

  def compute(str: UTF8String, n: Int): GenericArrayData = {
    val words = Ws.split(str.toString, -1)
    val count = words.length - n + 1
    if (count <= 0 || n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression for character n-grams:
  * `char_ngrams(str, n)` → `array<string>` of all n-character substrings
  * (codepoint semantics, same as `substr`), in order, not distinct.
  * Replaces the interpreted `transform(sequence(…), i => substr(i, n))`
  * chain; also fixes its `sequence(1, len-2)` descending-range artifact
  * on strings shorter than n (now correctly empty).
  */
case class CharNgramsExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires (string, int), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override protected def nullSafeEval(str: Any, n: Any): Any =
    NgramOps.computeChars(str.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.NgramOps.computeChars($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgramsExpr =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for INT-CODED character n-gram sets:
  * `char_ngram_codes(str, n)` → sorted DISTINCT `array<long>` where each
  * element packs the n-gram's codepoints at 21 bits each (n ≤ 3, so 63
  * bits). Because 21 bits hold any codepoint and UTF-8 byte order equals
  * codepoint order, the packed-long ordering IS the n-gram string
  * ordering — a consumer sorting by (df, code) gets the identical global
  * order the string dict produced. This is the allocation-free shape of
  * `array_distinct(char_ngrams(s, n))` for set consumers (ngram-jaccard):
  * one String materialization per ROW instead of one UTF8String per
  * WINDOW, dedup via primitive sort instead of a boxed hash set —
  * tokenize went from the dominant cost of the jaccard pipeline to noise
  * (r8). */
case class CharNgramCodesExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_ngram_codes requires (string, int), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_ngram_codes"

  override protected def nullSafeEval(str: Any, n: Any): Any =
    NgramOps.computeCharCodes(str.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = graft.functions.NgramOps.computeCharCodes($s, $n);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgramCodesExpr =
    copy(left = newLeft, right = newRight)
}

object TextNgrams {
  /** Column API: all word n-grams of a string column. Requires
    * [[GraftFunctions.register]] (idempotent) on the session. */
  def word_ngrams(s: Column, n: Column): Column = call_function("word_ngrams", s, n)

  /** Column API: all character n-grams of a string column. */
  def char_ngrams(s: Column, n: Column): Column = call_function("char_ngrams", s, n)

  /** Column API: sorted distinct packed-codepoint n-gram codes (n ≤ 3). */
  def char_ngram_codes(s: Column, n: Column): Column =
    call_function("char_ngram_codes", s, n)
}
