package graft

import graft.functions.{GraftFunctions, TextNgrams}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Differential semantics of the scan-local winnow_sel and minhash_sig
  * expressions against the exploded chains they replaced (r8), with the
  * byte-offset paths exercised on multi-byte codepoints — the corpus and
  * property fixtures are ASCII, and UTF-8 offset indexing is exactly
  * where a byte/char confusion would hide.
  */
class WinnowExprSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GraftFunctions.register(s); s }

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog and keeps going",
    "añejo café naïve ωmega straße œuvre çedilla — mixed byte widths here",
    "東京都市の中心部で何かが起きている長い文字列のテストです",
    "emoji 😀 inside 🚀 the 🌍 stream of characters to hash",
    "aaaaaaaaaaaaaaaaaaaaaa", // heavy repetition → min ties
    "short", // fewer than k+w-1 chars of grams
    "exactly8" // np = 4 = w: exactly one window
  )

  test("winnow_sel equals the posexplode + window-min chain it replaced") {
    val spark2 = spark
    import spark2.implicits._
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        lower(regexp_replace(trim(col("text")), "\\s+", " ")).as("t"))
    val fast = d.select(col("doc_id"),
        explode(call_function("winnow_sel", col("t"), lit(5), lit(4))).as("mh"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val g = d.select(col("doc_id"), posexplode(
        TextNgrams.char_ngrams(col("t"), lit(5))))
      .select(col("doc_id"), (col("pos") + 1).as("i"), md5(col("col")).as("h"))
    val w = Window.partitionBy("doc_id").orderBy("i")
    val slow = g
      .withColumn("mh", min("h").over(w.rowsBetween(Window.currentRow, 3)))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("doc_id")))
      .filter(col("i") <= col("np") - 3)
      .select("doc_id", "mh")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(fast == slow)
    assert(fast.exists(_._2.nonEmpty))
    // the short doc selects nothing in both forms
    assert(!fast.exists(_._1 == 5L))
  }

  test("minhash_sig equals the explode + md5 + 16-min chain it replaced") {
    val spark2 = spark
    import spark2.implicits._
    val sh = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(
        TextNgrams.word_ngrams(lower(trim(col("text"))), lit(3))).as("sh"))
    val fast = sh
      .select(col("doc_id"), call_function("minhash_sig", col("sh")).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val exploded = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"),
        conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long").as("h"))
    val P = graft.functions.MinhashOps.P
    val minAggs = (0 until 16).map(k =>
      min((lit(graft.functions.MinhashOps.A(k)) * col("h") +
        lit(graft.functions.MinhashOps.B(k))) % P).as(s"mh$k"))
    val slow = exploded.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong(_)).toSeq).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (id, sig) => assert(sig == slow(id), s"doc $id") }
    // docs with <3 words have empty shingle arrays → null signature
    assert(!fast.contains(5L) && !fast.contains(6L))
  }
}
