package graft

import graft.queries.DedupOps
import org.scalatest.funsuite.AnyFunSuite

/** The MinHash shingle table is the branch point read by the signature
  * pass and both verify joins, and several public entry points build it
  * over the same docs frame within one session (pairs, index, incremental
  * variants). ADVICE r8: repeated calls used to pin a FRESH cached copy
  * each, all held until session end. The fix memoizes on the semantic hash
  * of the input plan — this spec pins that contract.
  */
class MinhashCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("same input plan returns the SAME cached shingle table instance") {
    val a = DedupOps.minhashBase(spark,
      Tables.documents(spark, sf).select("doc_id", "text"))
    // an independently-constructed but semantically identical plan must
    // key to the same memo entry (no second cache pinned)
    val b = DedupOps.minhashBase(spark,
      Tables.documents(spark, sf).select("doc_id", "text"))
    assert(a eq b)
  }

  test("a different input plan gets its own entry") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val a = DedupOps.minhashBase(spark, docs)
    val b = DedupOps.minhashBase(spark, docs.filter("doc_id % 2 = 0"))
    assert(!(a eq b))
  }
}
