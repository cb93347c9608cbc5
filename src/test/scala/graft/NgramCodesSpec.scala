package graft

import graft.functions.{GraftFunctions, TextNgrams, VecOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics of the int-coded shingle expressions feeding the
  * ngram-jaccard production plan (r8): `char_ngram_codes` must be exactly
  * `array_distinct(char_ngrams(s, n))` re-coded (21-bit packed
  * codepoints, sorted), and `sorted_intersect_count` exactly
  * `size(array_intersect(a, b))` on sorted distinct arrays.
  */
class NgramCodesSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GraftFunctions.register(s); s }

  private def packedSet(s: String, n: Int): Set[Long] = {
    val cps = s.codePoints().toArray
    (0 to cps.length - n).map { i =>
      (0 until n).foldLeft(0L)((acc, j) => (acc << 21) | cps(i + j))
    }.toSet
  }

  test("char_ngram_codes == distinct char_ngrams, packed and sorted") {
    val spark2 = spark
    import spark2.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaa",                  // heavy duplication
      "ab",                      // shorter than n → empty
      "",                        // empty
      "naïve café — ωmega",      // multi-byte codepoints
      "emoji 😀😀 pair",  // surrogate pairs
      "mixed ASCII und ümlaut text with punctuation, and more!")
    val df = texts.toDF("text")
    val got = df.select(TextNgrams.char_ngram_codes(col("text"), lit(3)).as("c"))
      .collect().map(_.getSeq[Long](0))
    texts.zip(got).foreach { case (t, codes) =>
      assert(codes == codes.sorted && codes.distinct == codes,
        s"not sorted-distinct for '$t'")
      assert(codes.toSet == packedSet(t, 3), s"code set mismatch for '$t'")
    }
    // n=1 and n=2 paths (different masks)
    for (n <- Seq(1, 2)) {
      val g1 = df.select(TextNgrams.char_ngram_codes(col("text"), lit(n)).as("c"))
        .collect().map(_.getSeq[Long](0))
      texts.zip(g1).foreach { case (t, codes) =>
        assert(codes.toSet == packedSet(t, n), s"n=$n mismatch for '$t'")
      }
    }
  }

  test("packed-long order equals n-gram string order (dict tie-break parity)") {
    val spark2 = spark
    import spark2.implicits._
    // across ASCII and multi-byte: sorting by packed code must equal
    // sorting the 3-gram strings (codepoint-lexicographic)
    val text = "zebra añejo ωmega aardvark 東京都市 mix"
    val codes = Seq(text).toDF("text")
      .select(explode(TextNgrams.char_ngram_codes(col("text"), lit(3))).as("c"))
      .collect().map(_.getLong(0)).toSeq
    val strings = Seq(text).toDF("text")
      .select(explode(array_distinct(
        TextNgrams.char_ngrams(col("text"), lit(3)))).as("s"))
      .collect().map(_.getString(0)).toSeq
    val byCode = codes.sorted
    val byString = strings.sorted.map(s =>
      s.codePoints().toArray.foldLeft(0L)((acc, cp) => (acc << 21) | cp))
    assert(byCode == byString, "packed order diverges from string order")
  }

  test("sorted_intersect_count == size(array_intersect) on sorted sets") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(100)).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(100)).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Int], Seq(1, 2, 3))) :+ ((Seq(5), Seq(5)))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        VecOps.sorted_intersect_count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(df.filter(col("fast") =!= col("ref")).count() == 0)
  }
}
