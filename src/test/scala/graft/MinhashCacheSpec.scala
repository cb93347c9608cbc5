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

  private def captureErr(body: => Unit): String = {
    val buf = new java.io.ByteArrayOutputStream
    val real = System.err
    System.setErr(new java.io.PrintStream(buf, true))
    try body finally System.setErr(real)
    buf.toString("UTF-8")
  }

  test("releasable index probe frees its candidate checkpoint, silently when materialized") {
    // VERDICT r19 item 4: a library consumer without the daily loop's
    // global sweep needs a per-call release for the probe's internal
    // candidate checkpoint — and a release AFTER materialization must
    // not trip the unmaterialized-checkpoint warning (ADVICE r19).
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val fresh = docs.filter(col("doc_id") % 10 === 0)
    val index = DedupOps.minhashIndex(spark, existing).localCheckpoint(true)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (pairs, release) = DedupOps.minhashPairsAgainstIndexReleasable(
      spark, index, existing, fresh)
    pairs.count() // the consumer materialization the contract requires
    val during = spark.sparkContext.getPersistentRDDs.keySet
    assert((during -- before).nonEmpty, "no candidate checkpoint was pinned")
    val err = captureErr { release(); release() } // idempotent
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(during.size - after.size >= 1,
      s"release freed nothing (before=${before.size}, during=${during.size}, after=${after.size})")
    assert(!err.contains("no completed action ever read"),
      s"materialized release still warned:\n$err")
  }

  test("releasing a checkpoint no action ever read warns loudly") {
    // ADVICE r19: the materialize-before-sweep contract was comment-only
    // — an unpersisted localCheckpoint is unrecoverable, so a sweep
    // between plan construction and materialization must announce
    // itself instead of failing a later job far from the cause.
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 7 =!= 0)
    val fresh = docs.filter(col("doc_id") % 7 === 0)
    val index = DedupOps.minhashIndex(spark, existing).localCheckpoint(true)
    val (_, release) = DedupOps.minhashPairsAgainstIndexReleasable(
      spark, index, existing, fresh)
    // no action on the pairs frame — the contract violation
    val err = captureErr { release() }
    assert(err.contains("no completed action ever read"),
      s"unmaterialized release did not warn:\n$err")
  }
}
