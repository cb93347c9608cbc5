package graft

import java.security.MessageDigest
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential semantics of the `simhash_chunks` typed aggregate (r8):
  * its majority chunks must equal an independent per-doc computation —
  * MD5 per word, chunk j = digest bytes 2j,2j+1 big-endian, bit b set
  * iff 2·setBitVotes ≥ words (ties set) — across duplicates, non-ASCII
  * words, and partition splits (exercising merge()).
  */
class SimhashChunksSpec extends AnyFunSuite {
  private lazy val spark = { val s = SparkTestSession.spark; GraftFunctions.register(s); s }

  private def refChunks(words: Seq[String]): Seq[Long] = {
    val counts = new Array[Long](128)
    val md = MessageDigest.getInstance("MD5")
    words.foreach { w =>
      md.reset()
      val d = md.digest(w.getBytes("UTF-8"))
      for (j <- 0 until 8; b <- 0 until 16) {
        val c = ((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)
        counts(16 * j + b) += (c >> b) & 1
      }
    }
    (0 until 8).map { j =>
      (0 until 16).foldLeft(0L)((m, b) =>
        if (counts(16 * j + b) * 2 >= words.size) m | (1L << b) else m)
    }
  }

  test("aggregate equals the per-doc reference across partition splits") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("the", "quick", "brown", "fox", "añejo", "東京", "ωmega",
      "a", "of", "data", "model", "token", "😀", "x1", "x2")
    val docs = (0 until 40).map { id =>
      val n = 1 + rnd.nextInt(400)
      id.toLong -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    }
    val rows = docs.flatMap { case (id, ws) => ws.map(id -> _) }
    // 13 partitions on shuffled rows: partial buffers must merge
    val got = rnd.shuffle(rows).toDF("doc_id", "w").repartition(13)
      .groupBy("doc_id").agg(call_function("simhash_chunks", col("w")).as("mc"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    docs.foreach { case (id, ws) =>
      assert(got(id) == refChunks(ws), s"chunk mismatch for doc $id")
    }
  }

  test("matches the 129-column sum formulation it replaced") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog the the",
      2L -> "añejo café naïve ωmega 東京 words words words",
      3L -> "single")
    val words = docs.toDF("doc_id", "text").select(col("doc_id"),
      explode(split(col("text"), " ")).as("w"))
    val fast = words.groupBy("doc_id")
      .agg(call_function("simhash_chunks", col("w")).as("mc"))
      .select(col("doc_id") +: (0 until 8).map(j =>
        element_at(col("mc"), j + 1).as(s"m$j")): _*)
    val chunked = words.select(col("doc_id") +: (0 until 8).map(j =>
      conv(substring(md5(col("w")), 4 * j + 1, 4), 16, 10).cast("int").as(s"c$j")): _*)
    val bitAggs = (for (j <- 0 until 8; b <- 0 until 16) yield
      sum(shiftright(col(s"c$j"), b).bitwiseAND(1).cast("long")).as(s"v${j}_$b")).toSeq
    val slow = chunked.groupBy("doc_id")
      .agg(count(lit(1)).as("w"), bitAggs: _*)
      .select(col("doc_id") +: (0 until 8).map { j =>
        (0 until 16).map(b =>
          when(col(s"v${j}_$b") * 2 >= col("w"), lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as(s"m$j")
      }: _*)
    assert(fast.orderBy("doc_id").collect().toSeq ==
      slow.orderBy("doc_id").collect().toSeq)
  }

  test("null words are skipped; all-null group yields null") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Some("a")), (1L, None), (2L, None))
      .toDF("doc_id", "w")
      .groupBy("doc_id").agg(call_function("simhash_chunks", col("w")).as("mc"))
    val byId = df.collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(byId(1L) != null)
    assert(byId(2L) == null)
  }
}
