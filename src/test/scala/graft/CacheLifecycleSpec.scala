package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the memoized shared artifacts (VERDICT r7 item 1, ADVICE
  * r8 #3): explicit last-consumer release returns executor storage to
  * baseline mid-sweep, and the session-end sweep releases everything —
  * cached frames AND published temp directories — so memo maps never pin
  * a dead session's storage.
  */
class CacheLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("pair-set release unpersists, and a later call retrains") {
    val pairs = queries.DedupOps.pairsCache(spark, sf)
    pairs.count()
    assert(pairs.storageLevel != StorageLevel.NONE, "pair set not cached")
    queries.DedupOps.releasePairs(spark, sf)
    assert(pairs.storageLevel == StorageLevel.NONE, "release did not unpersist")
    queries.DedupOps.releasePairs(spark, sf) // idempotent
    val again = queries.DedupOps.pairsCache(spark, sf)
    assert(again.count() == pairs.count(), "retrained pair set differs")
    queries.DedupOps.releasePairs(spark, sf)
  }

  test("trained-index releases unpersist the PQ and coarse artifacts") {
    queries.SimilarityOps.warmPqIndex(spark, sf)
    queries.SimilarityOps.warmCoarseKmeans(spark, sf)
    val cached = spark.sparkContext.getPersistentRDDs.size
    assert(cached > 0, "no cached artifacts after warm")
    queries.SimilarityOps.releasePqIndex(spark, sf)
    queries.SimilarityOps.releaseCoarseKmeans(spark, sf)
    assert(spark.sparkContext.getPersistentRDDs.size < cached,
      "releases did not drop any persisted block")
    // a consumer after release simply retrains
    assert(queries.SimilarityOps.warmCoarseKmeans(spark, sf) > 0)
    queries.SimilarityOps.releasePqIndex(spark, sf)
    queries.SimilarityOps.releaseCoarseKmeans(spark, sf)
  }

  test("session-end sweep deletes the published archive temp dir") {
    val path = queries.Core.dailyEventsArchive(spark, sf)
    assert(Files.exists(Paths.get(path)), "archive not published")
    queries.SessionCaches.release(spark, s"layout.archive:$sf")
    assert(!Files.exists(Paths.get(path)), "archive temp dir not deleted")
    // memo evicted with it: the next call re-publishes a fresh layout
    val fresh = queries.Core.dailyEventsArchive(spark, sf)
    assert(fresh != path && Files.exists(Paths.get(fresh)))
  }

  test("warmMergeShape leaves no cached artifacts behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    queries.MempoolParse.warmMergeShape(spark, sf)
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "warm-up merge left persisted blocks")
  }

  test("releaseMerge unpersists the internal parsed cache too") {
    val out = queries.MempoolParse.mergeOutput(spark, sf)
    out.transactions.count()
    assert(out.parsed.storageLevel != StorageLevel.NONE,
      "parsed stage not cached after materialization")
    queries.MempoolParse.releaseMerge(spark, sf)
    assert(out.parsed.storageLevel == StorageLevel.NONE,
      "releaseMerge left the parsed stage cached")
    assert(out.transactions.storageLevel == StorageLevel.NONE,
      "releaseMerge left the archive cached")
  }

  test("releaseAll runs every outstanding finalizer for the session") {
    val pairs = queries.DedupOps.pairsCache(spark, sf)
    pairs.count()
    val archive = queries.Core.dailyEventsArchive(spark, sf)
    queries.SessionCaches.releaseAll(spark)
    assert(pairs.storageLevel == StorageLevel.NONE,
      "releaseAll left the pair set cached")
    assert(!Files.exists(Paths.get(archive)),
      "releaseAll left the archive temp dir")
    // registry is empty now — releasing again is a no-op, and new
    // registrations start a fresh finalizer set
    queries.SessionCaches.releaseAll(spark)
    assert(queries.DedupOps.pairsCache(spark, sf).count() > 0)
    queries.DedupOps.releasePairs(spark, sf)
  }
}
