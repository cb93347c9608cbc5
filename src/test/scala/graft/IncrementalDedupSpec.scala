package graft

import graft.queries.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine-level equivalence of the incremental pairing path (r8): banding
  * a fresh batch against the standing corpus must find exactly the
  * fresh-touching subset of the full batch pairing — same pairs, same
  * exact-verified Jaccard values — for any split of the corpus.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // planted corpus: every doc has a guaranteed near-copy at +1,000,000
  private def docs = DedupOps.withPlanted(spark, dir)

  test("incremental == batch restricted to fresh-touching pairs") {
    for (mod <- Seq(2L, 5L)) {
      val fresh = docs.filter(col("doc_id") % mod === 0)
      val existing = docs.filter(col("doc_id") % mod =!= 0)
      val inc = DedupOps.minhashPairsIncremental(spark, existing, fresh)
        .orderBy("doc_a", "doc_b").collect().toSeq
      val full = DedupOps.minhashPairsFromDocs(spark, docs)
        .filter(col("doc_a") % mod === 0 || col("doc_b") % mod === 0)
        .orderBy("doc_a", "doc_b").collect().toSeq
      assert(inc == full, s"split mod=$mod diverges")
      assert(inc.nonEmpty, s"split mod=$mod found no pairs — fixture too sparse")
    }
  }

  test("persisted-index variant equals the inline incremental path") {
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val index = DedupOps.minhashIndex(spark, existing)
    val viaIndex = DedupOps
      .minhashPairsAgainstIndex(spark, index, existing, fresh)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val inline = DedupOps.minhashPairsIncremental(spark, existing, fresh)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(viaIndex == inline)
    assert(viaIndex.nonEmpty)
  }

  test("daily loop with compact-every-K matches the full-batch pipeline") {
    // the --compact-every path (VERDICT r13 item 3) at spec scale:
    // 4 days of 5 % batches over 20 k synthetic docs, compacting whenever
    // more than 2 pieces accumulate. dailyRun itself REQUIREs sym_diff==0
    // against the full-batch pipeline, so reaching the end IS the assert;
    // this pins the compaction rewrite into the CI suite rather than only
    // the measured bench runs.
    CorpusScaleBench.dailyRun(spark, 20000L, days = 4, batchPct = 5,
      compactEvery = 2)
  }

  test("pruned verify is result-identical to the unpruned path") {
    // --prune-verify (r17): the candidate-touched semi-join drops only
    // base rows the inner verify join ignores, and hotBucketMembers is
    // EXACTLY the candidate-endpoint set (ids are unique per band, so a
    // doc pairs iff some bucket of its has >= 2 members — plus >= 1
    // fresh member in the incremental regime). Same pairs, same exact
    // jaccard values, both builders.
    val pruned = DedupOps.minhashPairsFromDocs(spark, docs,
        pruneVerify = true)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val unpruned = DedupOps.minhashPairsFromDocs(spark, docs)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(pruned == unpruned)
    assert(pruned.nonEmpty)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val incPruned = DedupOps.minhashPairsIncremental(spark, existing,
        fresh, pruneVerify = true)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val incUnpruned = DedupOps.minhashPairsIncremental(spark, existing, fresh)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(incPruned == incUnpruned)
    assert(incPruned.nonEmpty)
  }

  test("empty fresh batch pairs nothing; everything-fresh equals batch") {
    val none = DedupOps.minhashPairsIncremental(spark, docs, docs.limit(0))
    assert(none.count() == 0)
    val all = DedupOps.minhashPairsIncremental(spark, docs.limit(0), docs)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val full = DedupOps.minhashPairsFromDocs(spark, docs)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(all == full)
  }
}
