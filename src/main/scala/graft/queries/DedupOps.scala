package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fuzzy-dedup operators for the training-data pipeline: MinHash+LSH,
  * SimHash, blocked n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every operator is candidate-generation (LSH bands /
  * blocking) followed by exact verification on candidates only — the only
  * all-pairs work happens inside buckets. Everything is Spark built-ins
  * (higher-order array functions + hash), fully codegen'd; no UDFs.
  */
object DedupOps {

  /** Word 3-shingle set of `text` (lowercased, distinct) via the native
    * codegen word_ngrams expression (the interpreted transform/slice
    * lambda chain measured ~15x slower; session must have
    * GraftFunctions.register'd, which every caller does). */
  private def shingles(text: Column): Column =
    array_distinct(graft.functions.TextNgrams.word_ngrams(lower(trim(text)), lit(3)))

  /** One materialized near-dup pair set per (session, dir), shared by the
    * four queries that consume it (cos pairs, both clusterings, apply) —
    * the corpus analog of MempoolParse.mergeOutput: a pipeline computes
    * near-dup pairs once and every downstream stage reads them. Bench
    * materializes this in a timed block billed to q_dedup_embedding_cos
    * so the cost is attributed, not smeared over whichever query runs
    * first. */
  private val pairsMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  def pairsCache(s: SparkSession, dir: String): DataFrame =
    SessionCaches.memoize(pairsMemo, (System.identityHashCode(s), dir), {
      SessionCaches.onRelease(s, s"dedup.pairs:$dir")(() => releasePairs(s, dir))
      embeddingCosPairs(s, dir).cache()
    })

  /** Unpersist + evict the shared pair set — called by Bench after the
    * last pair consumer (q_dedup_embedding_cos/clusters/clusters_star/
    * apply) and by the session-end sweep. Idempotent; a later
    * [[pairsCache]] call simply retrains. */
  def releasePairs(s: SparkSession, dir: String): Unit =
    pairsMemo.remove((System.identityHashCode(s), dir))
      .foreach(_.unpersist(false))

  /** SimHash fingerprints, one row per doc (doc_id + eight 16-bit majority
    * chunks), cached because the band self-join reads it from BOTH sides
    * and Spark does not reuse the exchange across them. Tiny at any scale
    * (9 longs per doc); released after q_dedup_simhash runs. */
  private val simhashFpMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private[graft] def simhashFp(s: SparkSession, dir: String): DataFrame =
    SessionCaches.memoize(simhashFpMemo, (System.identityHashCode(s), dir), {
      SessionCaches.onRelease(s, s"dedup.simhash.fp:$dir")(() =>
        releaseSimhashFp(s, dir))
      graft.functions.GraftFunctions.register(s)
      // explode words once; ALL 128 majority votes run inside ONE custom
      // typed aggregate (long[129] buffer) — the per-bit `sum` column
      // form was semantically identical but its 129-field generated
      // aggregate class billed multi-second Janino compilation to the
      // first run and fell outside the whole-stage-codegen field budget
      val wordRows = withPlanted(s, dir).select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      val fp = wordRows.groupBy("doc_id")
        .agg(call_function("simhash_chunks", col("w")).as("mc"))
        .select(col("doc_id") +: (0 until 8).map(j =>
          element_at(col("mc"), j + 1).as(s"m$j")): _*)
        .cache()
      // materialize NOW: the band self-join reads fp from two concurrent
      // jobs (broadcast build + probe), and a lazily-cached plan gets
      // computed by BOTH before either fills the cache. Unpersist on a
      // FAILED materialization (review r19, the jaccardPerDoc r17 fix's
      // class): a count() that dies mid-job leaves partially-cached
      // blocks pinned with no memo entry for the release hook to find.
      try fp.count()
      catch { case t: Throwable => fp.unpersist(false); throw t }
      fp
    })

  /** Unpersist + evict the fingerprint table — Bench calls this right
    * after q_dedup_simhash (its only consumer); idempotent. */
  def releaseSimhashFp(s: SparkSession, dir: String): Unit =
    simhashFpMemo.remove((System.identityHashCode(s), dir))
      .foreach(_.unpersist(false))

  /** Cached (doc_id, sh[, extra…]) shingle-array table — the one branch
    * point the signature pass and both verify joins read. Memoized on the
    * input plan's identity so repeated calls over the same docs frame
    * (pairs + index + incremental variants within one Verify/Bench
    * session) share ONE cache instead of pinning a fresh copy each; the
    * session-end sweep (or an explicit release) unpersists it once.
    * The key pairs the 32-bit semanticHash with an md5 of the
    * canonicalized plan (review r17): this key controls CACHE IDENTITY —
    * a bare-Int collision between two of the many distinct frames a
    * daily-ingest loop accumulates would silently serve the wrong
    * corpus's shingles to minhashVerify, wrong pairs and no error. */
  private val minhashBaseMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def minhashBaseKey(s: SparkSession, docs: DataFrame): (Int, String) = {
    val analyzed = docs.queryExecution.analyzed
    val md = java.security.MessageDigest.getInstance("MD5")
    val planMd5 = md.digest(analyzed.canonicalized.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    (System.identityHashCode(s), s"${analyzed.semanticHash()}_$planMd5")
  }

  /** MinHash+LSH near-dup pairs over any (doc_id, text) frame — shared by
    * q_dedup_minhash (over the planted corpus) and CorpusScaleBench
    * (over million-doc synthetic corpora); candidates banded and
    * exact-verified. */
  private[graft] def minhashBase(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val key = minhashBaseKey(s, docs)
    SessionCaches.memoize(minhashBaseMemo, key, {
      SessionCaches.onRelease(s, s"dedup.minhash.base:${key._2}")(() =>
        minhashBaseMemo.remove(key).foreach(_.unpersist(false)))
      val extra = docs.columns.filter(c => c != "doc_id" && c != "text").map(col)
      // DISK_ONLY, same measured rule as the merge DAG's parsed stage:
      // the shingle arrays are an O(corpus) fat intermediate read a
      // bounded number of times (both sides of the band join, the warm
      // probes), and in-heap caching made them COMPETE with the band
      // join's execution memory — at 1 M docs the deserialized cache
      // drove 30 % task GC and OOM'd the 8 g heap outright on the warm
      // re-probe (r12, CorpusScaleBench --stages); DISK_ONLY reads come
      // back through the OS page cache at near-memory speed without
      // squeezing the unified pool.
      docs.select(col("doc_id") +: shingles(col("text")).as("sh") +: extra.toSeq: _*)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    })
  }

  /** The same (doc_id, sh[, extra…]) table, NOT persisted and NOT
    * memoized — the disk-bound-regime twin of [[minhashBase]], used by
    * the pruned pair builders: in the regime pruneVerify exists for,
    * the O(corpus) DISK_ONLY shingle cache is itself a leading scratch
    * consumer (~25–30 GB at 10 M docs) that coexists on one local disk
    * with the verify exchanges it feeds, and the base has exactly three
    * bounded consumers there (the spine banding, the hot-bucket
    * banding, the pruned verify) — re-running the scan-local shingle
    * pass three times is minutes of CPU; spilling the cache is the
    * ENOSPC. Below that regime the cached base stays the right trade
    * (the r12 measurements on [[minhashBase]]). */
  private def minhashBaseUncached(s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val extra = docs.columns.filter(c => c != "doc_id" && c != "text").map(col)
    docs.select(col("doc_id") +: shingles(col("text")).as("sh") +: extra.toSeq: _*)
  }

  /** Release the cached shingle base for `docs` (idempotent). Scale
    * benches call this once the near-dup chain is done: several GB of
    * cached shingle arrays otherwise pin the storage pool — and the
    * heap's old generation — through the unrelated stages that follow
    * (measured r12: the 1 M-doc winnow pass ran 1.8× its linear cost
    * with the stale cache resident). */
  private[graft] def releaseMinhashBase(s: SparkSession, docs: DataFrame): Unit =
    SessionCaches.release(s,
      s"dedup.minhash.base:${minhashBaseKey(s, docs)._2}")

  /** Release EVERY memoized shingle base for `s` — for callers that
    * create bases on frames they never see (minhashPairsAgainstIndex
    * shingles an internal `touchedExisting` semi-join; a K-day ingest
    * loop makes K distinct such frames, and without this sweep each
    * day's base stays persisted for the session's lifetime — the r13
    * daily-loop bench OOM'd its full-batch oracle exactly this way). */
  private[graft] def releaseAllMinhashBases(s: SparkSession): Unit = {
    val sid = System.identityHashCode(s)
    minhashBaseMemo.keys.filter(_._1 == sid)
      .foreach(k => SessionCaches.release(s, s"dedup.minhash.base:${k._2}"))
    // the pruned verify's checkpointed touched-id sets ride the same
    // sweep (ADVICE r18): each verifyPruned call pins one localCheckpoint
    // for its size gate + broadcast, and like the internal
    // touchedExisting bases the CALLER never sees the frame to release
    // it — a K-day loop would otherwise retain K checkpoint RDDs for the
    // session's lifetime (the r13 retained-state class).
    //
    // CONTRACT HARDENING (review r19): the DISK_ONLY bases above are
    // recomputable from lineage, so sweeping them early only costs a
    // recompute — but an unpersisted localCheckpoint is UNRECOVERABLE
    // (lineage truncated). Callers must MATERIALIZE every pruned-verify
    // output (count/collect/checkpoint) before calling this sweep; a
    // sweep between plan construction and materialization fails the
    // later job with "Checkpoint block not found" instead of slowing
    // it. Every current call site (the daily loop's per-tick sweep)
    // materializes first.
    touchedCheckpointMemo.keys.filter(_._1 == sid)
      .foreach(k => SessionCaches.release(s, s"dedup.touched:${k._2}"))
  }

  /** The checkpointed candidate-touched id frames [[verifyPruned]] pins
    * for its size gate + static broadcast, tracked so the
    * [[releaseAllMinhashBases]] sweep (and the session-end finalizer)
    * can unpersist them once the verify output is materialized — the
    * frames are internal to verifyPruned, so no caller can name them
    * (ADVICE r18: they previously stayed checkpointed for the session's
    * lifetime). Keyed by a per-call sequence, not a plan hash: two
    * verify passes over identical plans still pin two distinct
    * checkpoints. Each entry carries a MATERIALIZED bit (ADVICE r19):
    * the sweep's materialize-first contract was comment-only, and a
    * caller sweeping between plan construction and consumer
    * materialization would fail far from the cause with "Checkpoint
    * block not found" — the bit is flipped by a per-session
    * QueryExecutionListener when any successful Dataset action's
    * executed plan scans the checkpoint's RDD, and the release path
    * warns LOUDLY when it drops a checkpoint no action ever read. */
  /** `rdd` is the checkpoint's PERSISTED internal RDD (off the analyzed
    * LogicalRDD) — the release path must unpersist THAT, not the
    * Dataset: `Dataset.unpersist` only uncaches CacheManager-registered
    * plans, and a localCheckpoint is never registered there, so the r19
    * sweep's df-level unpersist silently freed nothing (caught by the
    * r20 MinhashCacheSpec release test; [[checkpointReleasable]] had
    * always released at the RDD level for exactly this reason). */
  private case class TrackedCheckpoint(
      rdd: Option[org.apache.spark.rdd.RDD[_]], rddId: Int,
      materialized: java.util.concurrent.atomic.AtomicBoolean,
      session: java.lang.ref.WeakReference[SparkSession])
  private val touchedCheckpointMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, Long), TrackedCheckpoint]
  private val touchedCheckpointSeq =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private val ckptObserverHooked =
    scala.collection.concurrent.TrieMap.empty[Int, Boolean]

  /** RDD ids behind every RDDScanExec in an executed plan, descending
    * into settled adaptive subplans: AdaptiveSparkPlanExec AND the
    * QueryStageExec wrappers it materializes (Result/Shuffle/Broadcast
    * stages) are all LEAF nodes — tree traversal stops at each without
    * the recursion (observed: a count's executed plan reads
    * ADAPTIVE[ResultQueryStageExec] at the top level with every real
    * operator inside the stage's `plan`). Best-effort: a plan shape
    * this misses costs one advisory warning, never correctness. */
  private def rddScanIds(
      p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
    p.collect {
      case r: org.apache.spark.sql.execution.RDDScanExec => Seq(r.rdd.id)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        rddScanIds(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        rddScanIds(q.plan)
    }.flatten

  /** Advisory check on the release path (ADVICE r19): an unpersisted
    * localCheckpoint is UNRECOVERABLE, so dropping one that no action
    * ever read means a later consumer dies with "Checkpoint block not
    * found" far from this cause. QueryExecutionListener callbacks ride
    * the async bus BEHIND the just-finished action's own stage events,
    * so a release right after a heavy materialization can race a bus
    * backlog measured in seconds — the poll gives it up to 10 s to flip
    * the bit before the alarm, and only costs time on the
    * (contract-violating) path the warning exists for. */
  /** Drain the shared listener bus (bounded) so a LATE-but-delivered
    * QueryExecutionListener event can still flip the bit before the
    * alarm: on a contended box the bus backlog was measured exceeding
    * the full 10 s poll (no drops logged — pure delivery latency), which
    * made the advisory below fire on a contract-HONORING release (the
    * ADVICE r20 failure mode, seen live as a MinhashCacheSpec flake).
    * `listenerBus`/`waitUntilEmpty` are package-private — reflection,
    * best-effort; on any failure the wall-clock poll still stands. */
  private def drainListenerBus(s: SparkSession): Unit =
    try {
      val sc = s.sparkContext
      val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
      val bounded =
        try bus.getClass.getMethod("waitUntilEmpty", java.lang.Long.TYPE)
        catch { case _: NoSuchMethodException => null }
      if (bounded != null) bounded.invoke(bus, java.lang.Long.valueOf(30000L))
      else bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      ()
    } catch { case _: Throwable => () }

  private def warnIfUnmaterialized(tc: TrackedCheckpoint): Unit = {
    var i = 0
    // quick poll first (the common case is sub-second delivery), then one
    // deterministic bus drain, then the remainder of the bounded poll
    while (!tc.materialized.get() && i < 10) { Thread.sleep(200); i += 1 }
    if (!tc.materialized.get())
      Option(tc.session.get()).foreach(drainListenerBus)
    while (!tc.materialized.get() && i < 50) { Thread.sleep(200); i += 1 }
    if (!tc.materialized.get())
      System.err.println("[dedup] WARNING: releasing a localCheckpoint " +
        s"(RDD ${tc.rddId}) that no completed action ever read — if a " +
        "plan built on it is materialized later it will fail with " +
        "'Checkpoint block not found'. Materialize every pruned-verify/" +
        "index-probe output before releaseAllMinhashBases (or the " +
        "per-call release thunk) runs.")
  }

  /** Eager localCheckpoint + registry-track a small internal frame so
    * the [[releaseAllMinhashBases]] sweep (or session end) unpersists
    * it — the shared discipline of [[verifyPruned]]'s touched sets and
    * [[minhashPairsAgainstIndex]]'s candidate pairs. Returns the pinned
    * frame and an early-release thunk for callers that drop it sooner
    * (verifyPruned's beyond-ceiling fallback;
    * [[minhashPairsAgainstIndexReleasable]] consumers). Materialize
    * every consumer before the sweep runs — see the sweep's scaladoc;
    * violations are caught by [[warnIfUnmaterialized]]. */
  private def trackCheckpoint(df: DataFrame): (DataFrame, () => Unit) = {
    val s = df.sparkSession
    val t = df.localCheckpoint(true)
    val internalRdd = t.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.headOption
    val tracked = TrackedCheckpoint(internalRdd,
      internalRdd.map(_.id).getOrElse(-1),
      new java.util.concurrent.atomic.AtomicBoolean(false),
      new java.lang.ref.WeakReference(s))
    val key = (System.identityHashCode(s), touchedCheckpointSeq.incrementAndGet())
    touchedCheckpointMemo.put(key, tracked)
    // one materialization observer per session: any successful Dataset
    // action whose executed plan scans a tracked checkpoint RDD flips
    // its bit. Bounded work per action — a plan walk, and only while
    // this session tracks checkpoints.
    val sid = key._1
    if (ckptObserverHooked.putIfAbsent(sid, true).isEmpty)
      s.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit =
            if (touchedCheckpointMemo.keysIterator.exists(_._1 == sid)) {
              val ids =
                try rddScanIds(qe.executedPlan).toSet
                catch { case _: Throwable => Set.empty[Int] }
              if (ids.nonEmpty)
                touchedCheckpointMemo.foreach { case ((s2, _), tc) =>
                  if (s2 == sid && ids.contains(tc.rddId))
                    tc.materialized.set(true)
                }
            }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              error: Exception): Unit = ()
        })
    SessionCaches.onRelease(s, s"dedup.touched:${key._2}")(() =>
      touchedCheckpointMemo.remove(key).foreach { tc =>
        warnIfUnmaterialized(tc)
        tc.rdd.foreach(_.unpersist(false))
      })
    (t, () => SessionCaches.release(s, s"dedup.touched:${key._2}"))
  }

  /** LSH banding rows (doc_id, band, bucket[, extra…]) via the scan-local
    * native signature (md5 + 16 permutation minima in one pass over the
    * shingle array) — the explode → md5 → hex-conv → 16-column min
    * aggregate it replaces materialized one row per shingle; values are
    * bit-identical so the twins stay hash-green. minhash_sig is null for
    * empty shingle arrays, matching docs that produced zero exploded
    * rows. */
  private def minhashBanded(base: DataFrame): DataFrame = {
    val extra = base.columns.filter(c => c != "doc_id" && c != "sh").map(col)
    val sig = base
      .select(col("doc_id") +: call_function("minhash_sig", col("sh")).as("sig")
        +: extra.toSeq: _*)
      .filter(col("sig").isNotNull)
      .select((col("doc_id") +: extra.toSeq) ++ (0 until 16).map(k =>
        element_at(col("sig"), k + 1).as(s"mh$k")): _*)
    sig.select(col("doc_id") +: extra.toSeq :+
      posexplode(array((0 until 4).map(b =>
        concat_ws("_", (b * 4 until b * 4 + 4).map(k =>
          col(s"mh$k").cast("string")): _*)): _*)): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
  }

  /** Exact Jaccard verify of candidate id pairs against the shingle
    * table. Sort-merge hints — the rows carry full shingle arrays, and
    * letting the optimizer broadcast a fat pairs-with-arrays intermediate
    * collects it to the driver (observed: >1 GiB at 300k docs, killed by
    * maxResultSize). SMJ shuffles on the doc ids only and holds at any
    * corpus size. */
  private def minhashVerify(cand: DataFrame, base: DataFrame): DataFrame =
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
        .hint("merge"), Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
        .hint("merge"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard_r"))

  /** Verify-side pruning for the full-batch and inline-incremental pair
    * builders: exact verification only ever reads shingle rows for docs
    * that appear in a candidate, so the corpus-sized base is semi-joined
    * to the candidate-touched id set before [[minhashVerify]]'s
    * sort-merge — the two verify-side exchanges then carry only touched
    * docs' shingle arrays instead of the whole corpus's. This aggregate
    * shuffle volume is what ENOSPC'd the 5 M-doc daily-loop bootstrap on
    * one local disk (README "Measured scale"); on a cluster it is the
    * dominant verify cost at any size. The touched set is bare doc_ids
    * (tens of MB at near-dup rates even at 10 M docs), statically
    * broadcast — see the comment on the join below for why the adaptive
    * shapes don't work here. Inner-join semantics make this a pure
    * pruning: base rows without a candidate partner contribute nothing
    * to the verify output.
    *
    * The touched set comes from [[hotBucketMembers]], NOT from the
    * candidate pairs' endpoints: a `cand`-derived id set re-evaluates
    * the bucket self-join inside both verify branches — measured 2.5×
    * the WHOLE pipeline's wall at 1 M docs (boot 48.5 → 123.7 s, full
    * re-pair 59.6 → 154.0 s) before this was caught. */
  /** Ceiling on the broadcast-able touched-id set (ADVICE r17): the
    * "tens of MB" bound on `touched` holds at the near-dup rates of
    * every measured corpus, but it is a RATE assumption, not a law — a
    * pathological corpus where most docs collide pushes the touched set
    * toward corpus size, and an unbounded `broadcast()` there dies as a
    * driver/executor OOM or the 8 GiB broadcast hard limit instead of a
    * clean decision. 64 M bare long ids ≈ 0.5 GiB raw, ~1–2 GiB as a
    * built broadcast relation — comfortably inside the limit and a
    * typical driver heap, and far above any measured touched set
    * (10 M docs: ~1.9 M ids). Past it [[verifyPruned]] falls back to
    * the unpruned sort-merge verify (result-identical; the pruning is
    * pointless anyway once most of the base is touched). */
  private[graft] val TouchedBroadcastMaxIds = 64000000L

  /** Driver-collect budget per broadcast id (ADVICE r18): building the
    * static broadcast COLLECTS the id rows to the driver, and that
    * collect is gated by `spark.driver.maxResultSize` (1g default) —
    * none of the launchers raise it, so a set well under the 64 M
    * static ceiling could still abort there, making the planned
    * fallback unreachable before the failure it exists to prevent.
    * [[touchedBroadcastCeiling]] therefore derives the effective
    * ceiling from the session's OWN maxResultSize at 24 bytes/id — a
    * deliberate over-estimate of the serialized single-long UnsafeRow
    * (16 B data + block bookkeeping, pre-compression), so the guard
    * fires strictly BEFORE the collect can die (1g default → ~44.7 M
    * ids, under the static ceiling). */
  private[graft] val TouchedBroadcastBytesPerId = 24L

  /** Effective broadcast ceiling: the static [[TouchedBroadcastMaxIds]]
    * bound (heap/8 GiB-limit driven) capped by what the session's
    * `spark.driver.maxResultSize` can actually collect. `maxResultSize
    * <= 0` means unlimited (Spark's own convention) — only the static
    * ceiling applies. Spec-pinned (IncrementalDedupSpec). */
  private[graft] def touchedBroadcastCeiling(maxResultSizeBytes: Long,
      staticCeiling: Long = TouchedBroadcastMaxIds): Long =
    if (maxResultSizeBytes <= 0) staticCeiling
    else math.min(staticCeiling,
      maxResultSizeBytes / TouchedBroadcastBytesPerId)

  private[graft] def verifyPruned(cand: DataFrame, base: DataFrame,
      touched: DataFrame,
      maxBroadcastIds: Long = TouchedBroadcastMaxIds): DataFrame = {
    // STATIC broadcast of the id set, not a shuffled semi: past the
    // auto-broadcast threshold (~10 MB of ids, reached between 3 M and
    // 5 M docs) the planner's sort-merge semi SORTS the full
    // array-carrying base, and even a shuffle_hash hint still lands the
    // base's full map-side shuffle on disk before AQE can act — the 5 M
    // oracle stage ENOSPC'd on each in turn with the pruning otherwise
    // in place. Broadcasting touched is the only shape where the
    // corpus-sized base never exchanges for the semi at all. The
    // broadcast is bare doc_ids of candidate-touched docs — bounded by
    // the near-dup candidate rate, tens of MB at 5 M docs.
    //
    // The id set is checkpointed BEFORE the size gate counts it, so the
    // count and the broadcast read the same materialization (one
    // banding-aggregate evaluation either way, no second corpus pass)
    // and a beyond-ceiling set is detected before any broadcast build
    // starts (ADVICE r17 — the guard turns a mid-broadcast OOM into a
    // planned fallback). The eager checkpoint is also why plan
    // CONSTRUCTION through this path runs Spark jobs (a banding pass) —
    // inherent to deciding broadcast-vs-fallback before the plan is
    // returned; plan-shape-only callers eat that cost once.
    //
    // Registered via trackCheckpoint (ADVICE r18): the checkpoint must
    // outlive this call (the returned plan broadcasts it), so it can't
    // be unpersisted here — the releaseAllMinhashBases sweep (or the
    // session-end finalizer) drops it after the verify output is
    // materialized.
    val (t, releaseEarly) = trackCheckpoint(touched)
    val nTouched = t.count()
    // cap by what the driver can actually collect (ADVICE r18)
    val ceiling = touchedBroadcastCeiling(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        touched.sparkSession.sparkContext.getConf
          .get("spark.driver.maxResultSize", "1g")),
      maxBroadcastIds)
    if (nTouched > ceiling) {
      println(s"[dedup] touched id set ($nTouched ids) exceeds the " +
        s"broadcast ceiling ($ceiling) — falling back to the " +
        "unpruned sort-merge verify (result-identical)")
      releaseEarly() // the fallback has no consumer for the id set
      minhashVerify(cand, base)
    } else
      minhashVerify(cand, base.join(broadcast(t), Seq("doc_id"), "left_semi"))
  }

  /** Doc ids that appear in at least one banded candidate pair, derived
    * from the banding rows ALONE (one aggregate — no bucket self-join):
    * ids are unique within a (band, bucket) group (a doc contributes one
    * bucket per band), so a doc is a candidate endpoint iff some bucket
    * of its has ≥ 2 members — and, when candidates are restricted to
    * fresh-touching pairs (`needFresh`), iff that bucket also holds ≥ 1
    * fresh doc (an existing member then pairs with the fresh one; a
    * fresh member pairs with any other). Exactly the candidate-endpoint
    * set in both regimes, not an over-approximation. */
  private def hotBucketMembers(banded: DataFrame,
      needFresh: Boolean): DataFrame = {
    val g = banded.groupBy("band", "bucket")
    val hot = (if (needFresh)
        g.agg(count(lit(1)).as("c"), max(col("fresh")).as("hf"))
          .filter(col("c") > 1 && col("hf"))
      else g.agg(count(lit(1)).as("c")).filter(col("c") > 1))
      .select("band", "bucket")
    banded.join(hot, Seq("band", "bucket"), "left_semi")
      .select("doc_id").distinct()
  }

  /** Verify-side base with each shingle replaced by its 64-bit xxhash
    * (r18): the pruned regime's remaining scratch hog is the exact-verify
    * exchanges, which sort/shuffle the TOUCHED docs' full shingle arrays
    * — ~15 KB/doc as strings, and on the planted corpora ~20 % of docs
    * are touched, so at 15 M docs the sort spill alone blew the 80 GB
    * disk (measured ENOSPC at 15 M AND 20 M under the index-reuse
    * shape). Longs cut the exchanged bytes ~3.5× and the sort compares
    * with them. Exact-Jaccard semantics are preserved modulo 64-bit
    * collisions WITHIN one doc pair's union (~1,200 elements →
    * P ≈ 1200²/2⁶⁵ ≈ 4e-14 per pair — the q_text_dup_ngrams precedent:
    * a collision can only merge two shingles and shift one pair's
    * jaccard by one count). The banding path is untouched — minhash_sig
    * consumes the STRING shingles, so signatures, buckets and the
    * candidate set stay bit-identical; spec-pinned result equality
    * against the string-verify builders covers the whole chain. */
  private def hashShingles(base: DataFrame): DataFrame =
    base.withColumn("sh", expr("transform(sh, x -> xxhash64(x))"))

  /** The pruned regime re-evaluates the UNCACHED base in three branches
    * (spine banding, hot-bucket banding, pruned verify) and relies on
    * `docs` producing identical rows each time — a non-deterministic
    * input (sample/rand-derived) would hand the candidate endpoints and
    * the touched set inconsistent corpora and silently drop pairs, a
    * failure mode the unpruned DISK_ONLY cache structurally prevented
    * (ADVICE r17). Fail LOUD at plan-build time instead: callers
    * localCheckpoint such frames first (the checkpoint pins the rows
    * and its LogicalRDD plan passes this check). */
  private def requireDeterministicForPruning(docs: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      GlobalLimit, LocalLimit, Sample}
    val analyzed = docs.queryExecution.analyzed
    val ndExpr = analyzed.collect {
      case p if p.expressions.exists(e => !e.deterministic) => p.nodeName
    }
    // plan-LEVEL nondeterminism the expression scan is blind to
    // (VERDICT r18 item 3): Sample's row membership and an unordered
    // Limit's row choice are functions of upstream PARTITIONING, not
    // just of a seed — a shuffle boundary that plans differently
    // between the three base re-evaluations (AQE coalescing, a changed
    // parallelism) hands them different row sets with every expression
    // still "deterministic". Both are rejected; the remedy is the same
    // localCheckpoint (which pins the rows as a LogicalRDD).
    //
    // DELIBERATELY over-rejecting (ADVICE r19): orderBy(...).limit(n)
    // is also refused even though it LOOKS stable — a sort by a
    // NON-UNIQUE key still leaves the rows at the cut boundary chosen
    // by tie-break, which follows partitioning, and key uniqueness
    // isn't provable from the plan. The error message names the
    // conservatism and the remedy so a sorted-limit caller isn't left
    // guessing.
    val ndNode = analyzed.collect {
      case _: Sample => "Sample"
      case _: GlobalLimit => "GlobalLimit"
      case _: LocalLimit => "LocalLimit"
    }
    val nd = (ndExpr ++ ndNode).distinct
    require(nd.isEmpty,
      s"pruneVerify re-evaluates its input plan multiple times and " +
        s"requires a deterministic frame; non-deterministic operator(s) " +
        s"found: ${nd.mkString(", ")} — localCheckpoint() the input " +
        "before pruning (or run with pruneVerify = false). Note: " +
        "Limit is refused even under a Sort — ties at the cut of a " +
        "non-unique ordering still follow partitioning, and key " +
        "uniqueness is not provable from the plan; the localCheckpoint " +
        "remedy covers sorted limits too")
  }

  /** THE banded candidate construction — one definition for the five
    * builders (review r19: the block was copy-pasted across every
    * builder, so a change to candidate semantics had to land identically
    * in 4–6 places or the spec-pinned builder equalities silently
    * diverged). Joins `probe` against `build` on the (band, bucket) key:
    * with probe = build = the full banding set (`fullSelfJoin`), the
    * a < b filter emits each unordered pair once; with a probe
    * RESTRICTED to a subset (the incremental/daily shapes), ids meet in
    * either role, so the filter is inequality + least/greatest
    * normalization — each probe-touching pair exactly once after the
    * distinct, in both regimes. */
  private def bandedCandidates(probe: DataFrame, build: DataFrame,
      fullSelfJoin: Boolean): DataFrame = {
    val j = probe.as("a").join(build.as("b"), Seq("band", "bucket"))
    (if (fullSelfJoin)
      j.filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    else
      j.filter(col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b")))
      .distinct()
  }

  /** Banded candidate id pairs (pre-verify) — the CorpusScaleBench
    * sub-stage probe. */
  private[graft] def minhashCandidatesFromDocs(
      s: SparkSession, docs: DataFrame): DataFrame = {
    val banded = minhashBanded(minhashBase(s, docs))
    bandedCandidates(banded, banded, fullSelfJoin = true)
  }

  /** MinHash+LSH near-dup pairs over any (doc_id, text) frame — shared by
    * q_dedup_minhash (over the planted corpus) and CorpusScaleBench
    * (over million-doc synthetic corpora). Returns (doc_a, doc_b,
    * jaccard_r ≥ 0.6), candidates banded and exact-verified.
    *
    * `pruneVerify` is the big-corpus regime, result-identical either
    * way (pruning only drops base rows the inner verify join ignores;
    * IncrementalDedupSpec asserts equality): ON, the verify exchanges
    * carry only candidate-touched docs' shingle arrays (the id set
    * statically broadcast, [[hotBucketMembers]]/[[verifyPruned]]) and
    * the base runs uncached ([[minhashBaseUncached]]) — extra
    * signature passes bought disk headroom AND wall at every measured
    * scale (1 M boot 42.8 s vs 48.5 unpruned, within box noise; 5 M
    * 187.9 s vs ENOSPC; 10 M end-to-end, README "Measured scale").
    * OFF (default) keeps the MEMOIZED shingle cache, which the
    * verify-SF query surface shares across q_dedup_minhash /
    * q_dedup_incremental / the index twin in one session — at those
    * sizes the cache sharing is worth more than the pruning, and the
    * default plan stays byte-stable for the oracle suite. */
  private[graft] def minhashPairsFromDocs(
      s: SparkSession, docs: DataFrame,
      pruneVerify: Boolean = false): DataFrame = {
    // pruned regime = disk-bound regime: skip the O(corpus) DISK_ONLY
    // shingle cache too (see [[minhashBaseUncached]])
    if (pruneVerify) requireDeterministicForPruning(docs)
    val base = if (pruneVerify) minhashBaseUncached(s, docs)
      else minhashBase(s, docs)
    val banded = minhashBanded(base)
    val cand = bandedCandidates(banded, banded, fullSelfJoin = true)
    if (pruneVerify)
      verifyPruned(cand, hashShingles(base),
        hotBucketMembers(banded, needFresh = false))
    else minhashVerify(cand, base)
  }

  /** The pruned full-batch pairing fed from an ALREADY-MATERIALIZED band
    * index instead of re-banding the corpus (r18): the daily loop (and a
    * production deployment) persists the banding rows as the standing
    * index anyway, and [[minhashPairsFromDocs]]'s pruned shape was
    * re-deriving the identical rows from scratch — one full
    * shingle+sign pass plus the banding exchange, in the regime where
    * every corpus pass is minutes. Here the candidate self-join and the
    * touched-id set both read the persisted `banded` rows (doc_id,
    * band, bucket — bit-identical to [[minhashIndex]] output on `docs`
    * by construction), and only the exact verify still shingles, off
    * the uncached base through the broadcast-pruned semi. Pruned
    * semantics are forced: this entry point exists only for the
    * disk-bound regime that persists indexes. Result-identical to
    * [[minhashPairsFromDocs]] (spec-pinned). */
  private[graft] def minhashPairsFromIndex(
      s: SparkSession, docs: DataFrame, banded: DataFrame): DataFrame = {
    requireDeterministicForPruning(docs)
    // verify-only consumer → hashed shingles (see [[hashShingles]])
    val base = hashShingles(minhashBaseUncached(s, docs))
    val cand = bandedCandidates(banded, banded, fullSelfJoin = true)
    verifyPruned(cand, base, hotBucketMembers(banded, needFresh = false))
  }

  /** Incremental near-dup pairing: every pair TOUCHING a `fresh` doc
    * (fresh↔existing and fresh↔fresh), WITHOUT the existing↔existing
    * bucket self-join — the daily-ingest shape at corpus scale, where
    * re-pairing the whole archive per batch is the thing you cannot do.
    * The existing side's banding rows are exactly the persisted LSH index
    * a production deployment would keep (like the ANN index tables); here
    * they are recomputed because the oracle owns no state between runs.
    * Same candidate bound per bucket, and the bucket join volume scales
    * with |fresh|, not |existing∪fresh|. */
  private[graft] def minhashPairsIncremental(
      s: SparkSession, existing: DataFrame, fresh: DataFrame,
      pruneVerify: Boolean = false): DataFrame = {
    val all = existing.select(col("doc_id"), col("text"), lit(false).as("fresh"))
      .union(fresh.select(col("doc_id"), col("text"), lit(true).as("fresh")))
    if (pruneVerify) requireDeterministicForPruning(all)
    val base = if (pruneVerify) minhashBaseUncached(s, all)
      else minhashBase(s, all)
    val banded = minhashBanded(base)
    // probe side: fresh only; build side: everything — a pair of two
    // existing docs can never form
    val cand = bandedCandidates(banded.filter(col("fresh")), banded,
      fullSelfJoin = false)
    if (pruneVerify)
      verifyPruned(cand, hashShingles(base).drop("fresh"),
        hotBucketMembers(banded, needFresh = true))
    else minhashVerify(cand, base.drop("fresh"))
  }

  /** The banding rows (doc_id, band, bucket) of a corpus — what a
    * production deployment persists per ingested batch as the standing
    * LSH index. `uncachedBase` (ADVICE r17): in the pruned/disk-bound
    * regime the caller is about to persist the INDEX itself, the base
    * has exactly this one consumer, and routing it through the memoized
    * [[minhashBase]] would transiently materialize the O(corpus)
    * DISK_ONLY shingle cache the pruned builders were redesigned to
    * avoid (~25–30 GB at 10 M docs, coexisting with the checkpointed
    * bootstrap pairs at peak) — same rationale as
    * [[minhashBaseUncached]]. Leave it false where the session shares
    * the cache across consumers (the verify-SF query surface, the
    * daily append whose batch base is reused by the probe). */
  private[graft] def minhashIndex(s: SparkSession, docs: DataFrame,
      uncachedBase: Boolean = false): DataFrame =
    minhashBanded(if (uncachedBase) minhashBaseUncached(s, docs)
      else minhashBase(s, docs)).select("doc_id", "band", "bucket")

  /** The production incremental shape: a fresh batch against a PERSISTED
    * band index — nothing about the standing corpus is recomputed except
    * the shingle sets of the existing docs that actually collide with the
    * batch (a semi-join read of the archive). Work scales with the batch:
    * shingle+sign the fresh docs, probe the index, verify the touched
    * pairs. Same result as [[minhashPairsIncremental]] (spec-asserted). */
  private[graft] def minhashPairsAgainstIndex(
      s: SparkSession, index: DataFrame, existing: DataFrame,
      fresh: DataFrame): DataFrame =
    minhashPairsAgainstIndexReleasable(s, index, existing, fresh)._1

  /** [[minhashPairsAgainstIndex]] plus the release thunk for its
    * internal candidate checkpoint (VERDICT r19 item 4): the daily loop
    * frees the checkpoint through its per-tick
    * [[releaseAllMinhashBases]] sweep, but a LIBRARY consumer in a
    * long-lived session without the sweep accumulated one pinned
    * checkpoint per call with no way to name it. Call the thunk after
    * materializing the returned pairs (count/collect/write) — it is the
    * same contract as the sweep ([[warnIfUnmaterialized]] catches
    * violations), idempotent, and a no-op if the sweep ran first. */
  private[graft] def minhashPairsAgainstIndexReleasable(
      s: SparkSession, index: DataFrame, existing: DataFrame,
      fresh: DataFrame): (DataFrame, () => Unit) = {
    val freshBase = minhashBase(s, fresh)
    val freshBanded = minhashBanded(freshBase).select("doc_id", "band", "bucket")
    val allBanded = index.union(freshBanded)
    // checkpointed (review r19): cand feeds the final verify join AND —
    // via `touched` below — the semi that selects which existing docs
    // get shingled, so left lazy the freshBanded×index probe join
    // re-evaluates in every consumer (the cand-derived re-evaluation
    // trap [[verifyPruned]]'s scaladoc documents, measured 2.5× there).
    // Registry-tracked like the touched sets: the daily loop's per-tick
    // releaseAllMinhashBases sweep frees it after the tick's pairs are
    // materialized; the release thunk is ALSO surfaced to the caller
    // (VERDICT r19 item 4) for sweep-less library sessions.
    val (cand, releaseCand) = trackCheckpoint(
      bandedCandidates(freshBanded, allBanded, fullSelfJoin = false))
    // verify reads shingles for fresh docs from the batch and, for the
    // existing side, ONLY for docs that actually appear in a candidate.
    // Hashed to 64-bit (VERDICT r18 item 2): at a 15 M-doc standing
    // corpus this daily tick's touched-existing exchange was the last
    // verify path still moving ~15 KB/doc STRING shingle arrays — the
    // same ~3.5× exchange cut the three batch builders took in r18,
    // same collision class (~4e-14/pair, see [[hashShingles]]). Applied
    // AFTER the memoized bases so the banding above and the probe's
    // reuse of freshBase keep consuming strings — signatures, buckets
    // and the candidate set stay bit-identical; IncrementalDedupSpec
    // pins the pair sets and jaccard values against the string-verify
    // inline path.
    val touched = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val touchedExisting = existing
      .join(touched.hint("shuffle_hash"), Seq("doc_id"), "left_semi")
    // project BOTH union sides to (doc_id, sh) (review r19): minhashBase
    // passes extra columns through, so an `existing` frame carrying any
    // column beyond (doc_id, text) — a shape minhashBase explicitly
    // supports — would fail the positional union at plan build
    val verifyBase = hashShingles(minhashBase(s, touchedExisting)
      .select("doc_id", "sh")
      .union(freshBase.select("doc_id", "sh")))
    (minhashVerify(cand, verifyBase), releaseCand)
  }

  /** Blocked embedding-cosine near-dup pairs (vec_a < vec_b, cos ≥ 0.25)
    * — shared by the pair query and the connected-components clustering.
    * Twin-gated like q_embed_rp (VERDICT r7 item 2):
    *  - verify SF (N ≤ VerifyExactGate): 64-way exploded exact-decimal
    *    dots — bitwise DuckDB parity, the oracle twin;
    *  - production: ONE self-join of the packed (vec_id, block, label,
    *    embedding, nrm) rows on the (label, block) blocking key, scored
    *    array-native by the codegen'd vec_dot — no dim explode, no
    *    64× row amplification, no separate norm join (the norm rides the
    *    row from the scan). At 100 TB the only shuffle is the packed
    *    vectors once per side on the blocking key; per-block populations
    *    are bounded by the blocking scheme, so the in-block pair loop is
    *    O(block²) with block ≤ 100, never all-pairs. */
  private[graft] def embeddingCosPairs(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    if (emb.count() <= SimilarityOps.VerifyExactGate) {
      val flat = emb
        .select(col("vec_id"), col("label"), (col("vec_id") / 100).cast("long").as("block"),
          posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("block"),
          (col("pos") + 1).as("i"), col("col").cast("double").as("v"))
      val nrm = flat.groupBy("vec_id")
        .agg(sum((col("v") * col("v")).cast(DecimalType(28, 12))).as("n2"))
      val a = flat.select(col("label"), col("block"), col("i"),
        col("vec_id").as("vec_a"), col("v").as("va"))
      val b = flat.select(col("label"), col("block"), col("i"),
        col("vec_id").as("vec_b"), col("v").as("vb"))
      val dots = a.join(b, Seq("label", "block", "i"))
        .filter(col("vec_a") < col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(sum((col("va") * col("vb")).cast(DecimalType(28, 12))).as("dot"))
      dots
        .join(nrm.select(col("vec_id").as("vec_a"), col("n2").as("na")), Seq("vec_a"))
        .join(nrm.select(col("vec_id").as("vec_b"), col("n2").as("nb")), Seq("vec_b"))
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
        .filter(col("cos") >= 0.25)
    } else {
      graft.functions.GraftFunctions.register(s)
      import graft.functions.VecOps.vec_dot
      val packed = emb
        .select(col("vec_id"), col("label"),
          (col("vec_id") / 100).cast("long").as("block"), col("embedding"))
        .withColumn("nrm", sqrt(vec_dot(col("embedding"), col("embedding"))))
      val a = packed.select(col("label"), col("block"), col("vec_id").as("vec_a"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = packed.select(col("label"), col("block"), col("vec_id").as("vec_b"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, Seq("label", "block"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("cos", vec_dot(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("cos") >= 0.25)
        .select(col("vec_a"), col("vec_b"), col("cos"))
    }
  }

  /** Connected-components result: (vec_id, cluster_id) labels plus the
    * number of contraction rounds the loop took (bounded-rounds proof
    * surface for the specs). `release` frees the final round's
    * localCheckpoint blocks (ADVICE r14 — the loops themselves free each
    * SUPERSEDED round as soon as its successor materializes, but the last
    * frame backs `labels` and must outlive its consumers): call it after
    * the last action on `labels`; the lineage is truncated, so `labels`
    * is unusable afterwards. */
  final case class CcResult(labels: DataFrame, rounds: Int,
      release: () => Unit = () => ())

  /** Eager localCheckpoint plus a handle that frees its blocks.
    * Dataset.localCheckpoint persists the materialized RDD OUTSIDE the
    * cache manager — df.unpersist can't reach it, which is how the CC
    * loops leaked one corpus-sized label frame per round until session
    * end (ADVICE r14). The checkpointed RDD is held DIRECTLY: it is the
    * nearest persisted ancestor in `out.rdd`'s dependency chain (the
    * checkpointed Dataset scans exactly that RDD, under a deserializing
    * map). ADVICE r15: the previous global getPersistentRDDs set-diff
    * swept up any RDD persisted CONCURRENTLY in the same context —
    * fine in the sequential test JVM, wrong on the production path
    * (CorpusBuild → semLosers) where release() could unpersist an
    * unrelated live cache. */
  private[graft] def checkpointReleasable(df: DataFrame)
      : (DataFrame, () => Unit) = {
    val out = df.localCheckpoint()
    def persistedAncestor(r: org.apache.spark.rdd.RDD[_])
        : Option[org.apache.spark.rdd.RDD[_]] =
      if (r.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        Some(r)
      else r.dependencies.view.flatMap(d => persistedAncestor(d.rdd))
        .headOption
    val target = persistedAncestor(out.rdd)
    (out, () => target.foreach(_.unpersist(false)))
  }

  /** Min-label propagation + pointer jumping: label(v) starts as vec_id,
    * each round takes the min over direct neighbors AND over
    * label(label(v)) — the jump roughly doubles propagation distance per
    * round, so O(log diameter) rounds. Right when components are small
    * (near-dup clusters); the 100 TB general-graph path is
    * [[starComponents]]. `edges` must carry BOTH directions of each pair.
    *
    * r22 restructure (guide §1.2 step 1 / §2.4 — fewer distributed ops
    * per round): the pointer jump used to be a separate `prop ⋈ prop`
    * self-join (its own exchanges, and its join tree evaluated the
    * neighbor-min subtree twice when exchange reuse missed). The label
    * pointer (v → label(v)) now RIDES THE EDGE SET into the one
    * neighbor-min join — joining the pointer edge against the label table
    * yields exactly label(label(v)) — so each round is ONE join + one
    * aggregate + one left join back, two exchanges fewer. The jump reads
    * the PREVIOUS round's labels where the old self-join jumped through
    * the current round's post-min labels (one round weaker per doubling,
    * measured +0–1 rounds on the bench graphs); the FIXPOINT is
    * unchanged — at convergence adjacent labels are equal, which forces
    * every component to its minimum id, the same canonical labeling
    * (DedupClusterSpec's union-find differential pins it). */
  def minLabelComponents(edges: DataFrame, nodes: DataFrame): CcResult = {
    val init = checkpointReleasable(nodes
      .select(col("vec_id"), col("vec_id").as("cluster_id")))
    var labels = init._1
    var release = init._2
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      // localCheckpoint truncates the lineage each round; without it the
      // round-over-round joins double the logical plan every iteration
      // and planning blows up exponentially.
      val aug = edges.union(
        labels.select(col("vec_id").as("src"), col("cluster_id").as("dst")))
      val nbrMin = aug
        .join(labels.select(col("vec_id").as("dst"), col("cluster_id").as("nbr")), Seq("dst"))
        .groupBy("src").agg(min("nbr").as("nbr_min"))
      // eager checkpoint: one job per round, constant-size plan — and the
      // superseded round's blocks are freed as soon as this one lands
      val (updated, relNew) = checkpointReleasable(labels
        .join(nbrMin.select(col("src").as("vec_id"), col("nbr_min")), Seq("vec_id"), "left")
        .select(col("vec_id"), col("cluster_id").as("old"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id"))).as("c1"))
        .select(col("vec_id"), col("c1").as("cluster_id"),
          (col("c1") < col("old")).as("chg")))
      // coalesce(sum, 0): sum() over an EMPTY frame is SQL-null, and
      // getLong on it NPEs — an empty node set must converge in one
      // round, not crash (review r19; starComponents' checksum already
      // tolerates the same edge)
      converged = updated
        .agg(coalesce(sum(when(col("chg"), 1L).otherwise(0L)), lit(0L)))
        .head().getLong(0) == 0
      release()
      release = relNew
      labels = updated.drop("chg")
      rounds += 1
    }
    CcResult(labels, rounds, release)
  }

  /** Alternating large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * 100 TB general-graph path. State is just the edge set; each round is
    * two hash-partitioned window-min passes on the node id (no per-node
    * label table, no growing joins), edges monotonically bend toward each
    * component's minimum, and convergence takes O(log² n) rounds even on
    * adversarial long chains where min-label needs O(diameter).
    *
    *   large-star(u): every neighbor v > u re-attaches to
    *                  m = min(Γ(u) ∪ {u})
    *   small-star(u): every neighbor v ≤ u, and u itself, attach to m
    *
    * Convergence = edge-set fixpoint, detected by (count, hash-sum)
    * checksum — one tiny aggregate per round instead of a full
    * self-anti-join. `edges0` may be one-directional pairs; orientation
    * and symmetry are handled here. */
  def starComponents(edges0: DataFrame, nodes: DataFrame): CcResult = {
    import org.apache.spark.sql.expressions.Window
    def checksum(df: DataFrame): Seq[Any] = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("src"), col("dst")).cast(DecimalType(38, 0)))).head()
      Seq(r.get(0), r.get(1))
    }
    // canonical orientation src > dst, self-loops dropped
    val init = checkpointReleasable(
      edges0.filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .distinct())
    var edges = init._1
    var release = init._2
    var sig = checksum(edges)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      // large-star over the symmetrized neighborhood: (v, m) for v > u
      val sym = edges.union(edges.select(col("dst"), col("src")).toDF("src", "dst"))
      val ls = sym
        .withColumn("m", least(min("dst").over(Window.partitionBy("src")), col("src")))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst")) // src > dst by construction
        .filter(col("src") =!= col("dst"))
        .distinct()
      // small-star over the now-oriented edges: every smaller neighbor
      // and u itself attach to u's minimum neighbor
      val withM = ls.withColumn("m", min("dst").over(Window.partitionBy("src")))
      // constant-size plan per round; the superseded round's checkpoint
      // blocks are freed once this one is materialized and checksummed
      val (ss, relNew) = checkpointReleasable(
        withM.select(col("dst").as("src"), col("m").as("dst"))
          .union(withM.select(col("src"), col("m")).toDF("src", "dst"))
          .filter(col("src") =!= col("dst"))
          .select(greatest(col("src"), col("dst")).as("src"),
            least(col("src"), col("dst")).as("dst"))
          .distinct())
      val s2 = checksum(ss)
      converged = s2 == sig
      sig = s2
      release()
      release = relNew
      edges = ss
      rounds += 1
    }
    // free the final round's blocks before throwing — a non-converged
    // abort must not leak what the caller can never release (review r17)
    if (!converged) release()
    require(converged, s"star contraction did not converge within $rounds rounds")
    // at the fixpoint every edge points a node at its component minimum
    val labels = nodes
      .join(edges.select(col("src").as("vec_id"), col("dst").as("root")), Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("root"), col("vec_id")).as("cluster_id"))
    CcResult(labels, rounds, release)
  }

  /** Memoized connected-component labels over the shared near-dup pair
    * set — q_dedup_clusters and q_dedup_apply consume the min-label
    * variant, q_dedup_clusters_star the star-contraction one. A CC run
    * ends holding its final round's localCheckpoint blocks (OUTSIDE the
    * cache manager — df.unpersist can't reach them), so query lambdas
    * returning bare `.labels` leaked one label frame per RUN until
    * session end (review r17: the ADVICE-r14 leak class re-introduced at
    * the query boundary). Memoizing the CcResult gives repeated runs one
    * shared frame, and the release path frees it — Bench after each
    * variant's last consumer, the session sweep otherwise. */
  private val ccLabelsMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String, String), CcResult]

  private def ccLabels(s: SparkSession, dir: String,
      star: Boolean): DataFrame = {
    val variant = if (star) "star" else "minlabel"
    val key = (System.identityHashCode(s), dir, variant)
    SessionCaches.memoize(ccLabelsMemo, key, {
      SessionCaches.onRelease(s, s"dedup.cc.labels:$variant:$dir")(() =>
        ccLabelsMemo.remove(key).foreach(_.release()))
      val nodes = Tables.embeddings(s, dir).select("vec_id")
      if (star)
        starComponents(pairsCache(s, dir)
          .select(col("vec_a").as("src"), col("vec_b").as("dst")), nodes)
      else {
        val pairs = pairsCache(s, dir).select("vec_a", "vec_b")
        minLabelComponents(
          pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
            .union(pairs.select(col("vec_b").as("src"), col("vec_a").as("dst"))),
          nodes)
      }
    }).labels
  }

  /** Free one variant's memoized CC label frame (idempotent) — Bench
    * calls min-label after q_dedup_apply and star after
    * q_dedup_clusters_star, each variant's last consumer. */
  def releaseCcLabels(s: SparkSession, dir: String, star: Boolean): Unit =
    SessionCaches.release(s,
      s"dedup.cc.labels:${if (star) "star" else "minlabel"}:$dir")

  /** Memoized canonical int-coded shingle sets for q_dedup_ngram_jaccard
    * (review r17: docSh/dict/perDoc were cached per RUN with no release
    * path — corpus-sized frames pinned until application end, the exact
    * stale-resident-cache class the r12 note measures at 1.8×). The
    * build materializes perDoc ONCE, eagerly drops the two build-only
    * caches (the packed-codepoint shingle arrays and the charset³ dict —
    * dead weight once perDoc exists), and memoizes perDoc with a release
    * hook (Bench after q_dedup_ngram_jaccard, its only consumer; the
    * session sweep otherwise).
    *
    * Tokenize ONCE — straight to SORTED DISTINCT packed-codepoint codes
    * (codegen char_ngram_codes): no per-window string allocation, no
    * boxed-hash array_distinct (the string tokenize dominated the whole
    * pipeline before, r8). Global document frequency per shingle code
    * broadcasts at ANY corpus size (charset³-bounded), and a dense
    * df-ascending id (sid) replaces the shingle everywhere downstream
    * (VERDICT r6 item 5) — packed-codepoint long order equals the old
    * string order, so even the tie-break is unchanged. perDoc itself is
    * int-coded arrays ~4 bytes/shingle, megabytes at any verify SF. */
  private val jaccardPerDocMemo =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def jaccardPerDoc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val t = 0.7
    val key = (System.identityHashCode(s), dir)
    SessionCaches.memoize(jaccardPerDocMemo, key, {
      SessionCaches.onRelease(s, s"dedup.jaccard.perdoc:$dir")(() =>
        jaccardPerDocMemo.remove(key).foreach(_.unpersist(false)))
      val docSh = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.functions.TextNgrams.char_ngram_codes(
            col("text"), lit(3)).as("shs")).cache()
      val sh2 = docSh.select(col("doc_id"), col("lang"), col("source"),
        explode(col("shs")).as("s"))
      val dfreq = sh2.groupBy("s").agg(count(lit(1)).as("df"))
      // (a driver-side literal map + transform lookup was tried and
      // measured SLOWER: higher-order lambdas run interpreted, the same
      // 17× trap the vec_dot scaladoc records)
      val dict = dfreq.select(col("s"),
        row_number().over(Window.orderBy(col("df"), col("s"))).as("sid"))
        .cache()
      val perDoc = sh2.join(broadcast(dict), Seq("s"))
        .groupBy("doc_id", "lang", "source")
        .agg(array_sort(collect_list(col("sid"))).as("sh"))
        .withColumn("n", size(col("sh")))
        .withColumn("plen", (col("n") - ceil(col("n") * t) + 1).cast("int"))
        .cache()
      // the materializing action is the only runtime throw site in the
      // build (everything above is lazy plan construction); a failure
      // here must not strand the two build-only caches — the memo key is
      // never filled on a throw, so the onRelease hook would have
      // nothing to unpersist and the corpus-sized shingle cache would
      // stay pinned for the session (review r17 third pass)
      try perDoc.count()
      catch {
        case e: Throwable =>
          perDoc.unpersist(false)
          docSh.unpersist(false)
          dict.unpersist(false)
          throw e
      }
      docSh.unpersist(false)
      dict.unpersist(false)
      perDoc
    })
  }

  /** Free the memoized jaccard shingle-set table (idempotent). */
  def releaseJaccardPerDoc(s: SparkSession, dir: String): Unit =
    SessionCaches.release(s, s"dedup.jaccard.perdoc:$dir")

  /** Winnowing selected-fingerprint set (doc_id, mh, np): the window-min
    * chain shared by q_dedup_winnow and the LlmOpsSpec overlap check. */
  private[graft] def winnowSelected(s: SparkSession, dir: String): DataFrame =
    winnowSelectedFromDocs(s, withPlanted(s, dir))

  /** The same chain over any (doc_id, text) frame — the PropertySpec
    * drives it on constructed documents to check the winnowing guarantee
    * itself (a shared substring of ≥ k+w−1 chars ⟹ a shared selected
    * fingerprint). */
  private[graft] def winnowSelectedFromDocs(
      s: SparkSession, docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // one scan-local pass per doc (native winnow_sel: md5 per gram +
    // monotonic-deque window minimum) — the posexplode → md5 → window-min
    // chain this replaces shuffled and sorted one row per corpus char;
    // values are bit-identical so the DuckDB twin stays hash-green
    val d = docs.select(col("doc_id"),
      lower(regexp_replace(trim(col("text")), "\\s+", " ")).as("t"))
    d.select(col("doc_id"),
        explode(call_function("winnow_sel", col("t"), lit(5), lit(4))).as("mh"),
        (length(col("t")) - lit(4)).cast("long").as("np"))
      .select(col("doc_id"), col("mh"), col("np"))
  }

  private[graft] def withPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val words = split(trim(col("text")), "\\s+")
    val perturbed = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(words, lit(1), greatest(size(words) - 2, lit(1)))).as("text"))
    docs.union(perturbed)
  }

  /** MinHash permutation family: perm_k(s) = (a_k·h(s) + b_k) mod P over
    * the 48-bit shingle hash h = first 12 hex digits of md5(s). One md5
    * per shingle row instead of 16 (16× less hashing — md5 dominated the
    * signature aggregate); a_k stays below 2^15 so a_k·h < 2^63 in signed
    * 64-bit on BOTH engines. The constants are mirrored verbatim into the
    * DuckDB oracle's VALUES block. */
  // single source with the native minhash_sig expression
  private val MinhashP = graft.functions.MinhashOps.P
  private val MinhashA: Seq[Long] = graft.functions.MinhashOps.A.toSeq
  private val MinhashB: Seq[Long] = graft.functions.MinhashOps.B.toSeq

  /** 16 minhash minima as COLUMNS of one grouped aggregate (mirrors the
    * Spark plan; the k-row CROSS JOIN shape measured 48× slower in
    * DuckDB). */
  private def minhashMinColsSql: String =
    (0 until 16).map(k =>
      s"MIN((${MinhashA(k)} * h + ${MinhashB(k)}) % $MinhashP) AS mh$k").mkString(", ")

  private def minhashBandKeysSql: String =
    (0 until 4).map(b => "(" +
      (4 * b until 4 * b + 4).map(k => s"mh$k::VARCHAR").mkString(" || '_' || ") +
      ")").mkString(", ")

  /** The planted-docs CTE shared by the minhash and simhash oracles —
    * the exact SQL twin of [[withPlanted]]. */
  private val PlantedDocsSql =
    """docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000,
      |    array_to_string(ws[1:greatest(len(ws)-2,1)], ' ')
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
      |        FROM documents))""".stripMargin

  /** DuckDB twin of the md5-keyed simhash pipeline (generated: 8 hex-digit
    * chunks → 128 majority votes → banded keys → hamming verify). */
  private def simhashOracleSql: String = {
    def hx(i: Int) = s"strpos('0123456789abcdef', substr(h, $i, 1)) - 1"
    val chunks = (0 until 8).map(j => "(" +
      (1 to 4).map(d => s"(${hx(4 * j + d)}) * ${math.pow(16, 4 - d).toLong}")
        .mkString(" + ") + s") AS c$j").mkString(", ")
    val votes = (for (j <- 0 until 8; b <- 0 until 16) yield
      s"SUM(CASE WHEN ((c$j >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS v${j}_$b")
      .mkString(", ")
    val maj = (0 until 8).map(j => "(" +
      (0 until 16).map(b => s"CASE WHEN v${j}_$b >= 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ") + s") AS m$j").mkString(", ")
    val bands = ((0 until 8).map(i => s"(CAST(m$i AS BIGINT) * 65536 + m${(i + 1) % 8})") ++
      (0 until 8).map(i => s"(CAST(m$i AS BIGINT) * 65536 + m${(i + 2) % 8})")).mkString(", ")
    val ham = (0 until 8).map(j => s"bit_count(CAST(xor(a.m$j, b.m$j) AS BIGINT))")
      .mkString(" + ")
    s"""WITH $PlantedDocsSql,
       |w AS (SELECT doc_id, md5(unnest(string_split_regex(lower(trim(text)), '\\s+'))) AS h
       |      FROM docs),
       |ch AS (SELECT doc_id, $chunks FROM w),
       |v AS (SELECT doc_id, $votes FROM ch GROUP BY doc_id),
       |fp AS (SELECT doc_id, $maj FROM v),
       |blocked AS (
       |  SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7,
       |    unnest([$bands]) AS bkey,
       |    unnest(range(16)) AS block
       |  FROM fp)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST($ham AS BIGINT) AS hamming
       |FROM blocked a JOIN blocked b ON a.block = b.block AND a.bkey = b.bkey
       |  AND a.doc_id < b.doc_id
       |WHERE $ham <= 24""".stripMargin
  }

  /** DuckDB twin of the full minhash pipeline (shared by q_dedup_minhash
    * and, filtered, by q_dedup_incremental). */
  private def minhashOracleSql: String =
    s"""WITH $PlantedDocsSql,
       |w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws FROM docs),
       |sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |       FROM (SELECT doc_id, ws,
       |             unnest(generate_series(1, len(ws) - 2)) AS i FROM w)),
       |hh AS (SELECT doc_id, CAST('0x' || substr(md5(s), 1, 12) AS BIGINT) AS h FROM sh),
       |mh AS (SELECT doc_id, $minhashMinColsSql FROM hh GROUP BY doc_id),
       |band AS (SELECT doc_id, unnest(range(4)) AS band,
       |         unnest([$minhashBandKeysSql]) AS bkey FROM mh),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM band a JOIN band b ON a.band = b.band AND a.bkey = b.bkey
       |           AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS i
       |          FROM cand c JOIN sh x ON x.doc_id = c.doc_a
       |          JOIN sh y ON y.doc_id = c.doc_b AND x.s = y.s
       |          GROUP BY 1, 2)
       |SELECT doc_a, doc_b, round(i * 1.0 / (sx.n + sy.n - i), 6) AS jaccard_r
       |FROM inter JOIN sz sx ON doc_a = sx.doc_id JOIN sz sy ON doc_b = sy.doc_id
       |WHERE i * 1.0 / (sx.n + sy.n - i) >= 0.6""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // MinHash + LSH banding: shingle → 16 minhashes → 4 bands of 4 →
    // band-bucket join → exact Jaccard verify on candidates.
    // Plan shape: shingles are EXPLODED once and the 16 permutation minima
    // run as one codegen'd 16-column hash aggregate (per-row higher-order
    // lambdas are interpreted in Spark and were 3× slower).
    //
    // The permutation values are (a_k·h + b_k) mod (2^61−1) over the
    // 48-bit shingle hash h = first 12 hex digits of md5(shingle) — md5
    // and 64-bit integer arithmetic are identical in Spark and DuckDB, so
    // the ENTIRE sketch pipeline (signatures, band keys, candidate set,
    // verify) is differential-tested, not just rows-counted. One md5 per
    // shingle row; the 16 permutation minima are cheap mul/mod columns in
    // one codegen hash aggregate. At 100 TB everything before the bucket
    // join is scan-local.
    "q_dedup_minhash" -> QueryDef.sql(
      "MinHash+LSH near-dup: shingle, md5+linear-perm minhash, band, bucket-join, verify",
      minhashOracleSql) { (s, dir) =>
      minhashPairsFromDocs(s, withPlanted(s, dir))
    },

    // Incremental near-dup pairing: the daily-ingest shape — only pairs
    // touching the "fresh" batch (doc_id ≡ 0 mod 5 plays the new batch)
    // form; the existing↔existing bucket self-join never runs. The twin
    // is the FULL batch pipeline filtered to fresh-touching pairs, so the
    // hash check proves the incremental path finds exactly the pairs the
    // batch path finds — same candidates, same exact-verify values.
    "q_dedup_incremental" -> QueryDef.sql(
      "incremental MinHash dedup: fresh batch banded against the standing corpus",
      s"""SELECT doc_a, doc_b, jaccard_r FROM ($minhashOracleSql) t
         |WHERE doc_a % 5 = 0 OR doc_b % 5 = 0""".stripMargin) { (s, dir) =>
      val all = withPlanted(s, dir)
      minhashPairsIncremental(s,
        all.filter(col("doc_id") % 5 =!= 0),
        all.filter(col("doc_id") % 5 === 0))
    },

    // SimHash: per-word hashes → bitwise majority fingerprint → block
    // buckets → hamming-distance verify via bit_count(xor).
    //
    // The fingerprint is 128 bits (two independently-seeded 64-bit
    // halves), cut into eight 16-bit chunks that pair up into 16 banded
    // bucket keys of 32 bits each (chunk_i ++ chunk_{i+1 mod 8} and
    // chunk_i ++ chunk_{i+2 mod 8}): 2^32 possible keys per band, so
    // per-bucket candidate count stays bounded as the corpus grows (the
    // r1 16-bit blocks capped at 65,536 buckets — in-bucket self-join
    // volume grew quadratically with corpus size). A pair at fractional
    // hamming distance d collides on a band when both its chunks are
    // clean (prob ~(1-d)^32); 16 bands give near-dups >= 1 collision
    // with high probability (LlmOpsSpec asserts planted recall >= 0.8).
    // The 128 fingerprint bits come from md5(word) — identical in Spark
    // and DuckDB — held as eight 16-bit chunks (hex digits 4j+1..4j+4),
    // so the whole pipeline (votes, fingerprint, band keys, candidate
    // set, hamming verify) is differential-tested against a generated
    // DuckDB twin instead of rows-counted.
    "q_dedup_simhash" -> QueryDef.sql(
      "SimHash near-dup: 128-bit md5 majority fingerprint, 32-bit block buckets, hamming verify",
      simhashOracleSql) { (s, dir) =>
      // the fingerprint table feeds BOTH sides of the band self-join, and
      // Spark does not reuse the exchange across the sides (the two
      // branches canonicalize differently once the join's constraints
      // propagate into them) — without the memoized cache the whole
      // explode + md5 + 129-column vote aggregate ran twice per query
      val fp = simhashFp(s, dir)
      val bands = (0 until 8).map(i => col(s"m$i") * 65536L + col(s"m${(i + 1) % 8}")) ++
        (0 until 8).map(i => col(s"m$i") * 65536L + col(s"m${(i + 2) % 8}"))
      val blocked = fp.select(
        col("doc_id") +: (0 until 8).map(j => col(s"m$j")) :+
          posexplode(array(bands: _*)): _*)
        .withColumnRenamed("pos", "block").withColumnRenamed("col", "bkey")
      def side(tag: String) = blocked.select(
        col("block") +: col("bkey") +: col("doc_id").as(s"doc_$tag") +:
          (0 until 8).map(j => col(s"m$j").as(s"$tag$j")): _*)
      val ham = (0 until 8).map(j =>
        bit_count(col(s"a$j").bitwiseXOR(col(s"b$j")))).reduce(_ + _)
      side("a").join(side("b"), Seq("block", "bkey"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), ham.cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 24)
    },

    // Blocked exact n-gram Jaccard (differential-tested): char 3-gram sets,
    // pairs within (lang, source) blocks, exact Jaccard on full sets.
    //
    // Candidate generation uses AllPairs prefix filtering (Bayardo et al.,
    // WWW'07): order each doc's shingles by ascending GLOBAL document
    // frequency; any pair with J >= t shares its globally-smallest common
    // shingle, which must sit within the first n - ceil(t*n) + 1 shingles
    // of BOTH docs (if all o >= ceil(t*n) common shingles sat outside the
    // prefix they would need more than the ceil(t*n) - 1 suffix slots).
    // So only ~30% of shingles — the RAREST ones — enter the self-join:
    // hot keys ("the", " an") sort last and never join, which removes the
    // r1 skew (10.7 s -> the join now scales with rare-key volume) while
    // staying exact: candidates are verified on their full shingle sets.
    "q_dedup_ngram_jaccard" -> QueryDef.sql(
      "blocked n-gram Jaccard near-dup (char 3-grams, exact, prefix-filtered)",
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, lang, source, substr(text, i, 3) AS s
        |  FROM (SELECT doc_id, lang, source, text,
        |        unnest(generate_series(1, length(text) - 2)) AS i
        |        FROM documents)),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang
        |    AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard_r
        |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |WHERE i * 1.0 / (x.n + y.n - i) >= 0.7""".stripMargin) { (s, dir) =>
      val t = 0.7 // = 7/10 — the integer bounds below use the exact rational
      val perDoc = jaccardPerDoc(s, dir)
      // only the PREFIX slice (each doc's rarest ~30 %) enters the
      // self-join, with its 0-based position for the filter below
      val prefix = perDoc.select(col("doc_id"), col("n"), col("lang"),
          col("source"), posexplode(slice(col("sh"), lit(1), col("plen"))))
        .select(col("doc_id"), col("n"), col("lang"), col("source"),
          col("pos").as("p"), col("col").as("sid"))
      val key = xxhash64(col("lang"), col("source"), col("sid"))
      val a = prefix.select(key.as("k"), col("doc_id").as("doc_a"),
        col("n").as("na"), col("p").as("pa"))
      val b = prefix.select(key.as("k"), col("doc_id").as("doc_b"),
        col("n").as("nb"), col("p").as("pb"))
      // J >= 7/10 needs overlap o >= ceil(7(na+nb)/17) [t/(1+t) exact as
      // a rational]; a pair's first common shingle sits at (pa, pb) with
      // all common shingles at or after it, so o <= 1 + min(na-pa-1,
      // nb-pb-1) — the PPJoin positional filter. Pruning matched tuples
      // that violate it keeps at least the first-common-shingle tuple per
      // qualifying pair (no false negatives) while cutting the hot-key
      // multiplicity feeding the distinct. Size bounds as exact integer
      // inequalities (10·na >= 7·nb), never FP, so a boundary pair can't
      // be dropped by a rounding error.
      val minO = floor((lit(7) * (col("na") + col("nb")) + lit(16)) / lit(17))
      val cand = a.join(b, Seq("k"))
        .filter(col("doc_a") < col("doc_b") &&
          col("na") * 10 >= col("nb") * 7 && col("nb") * 10 >= col("na") * 7 &&
          lit(1) + least(col("na") - col("pa") - 1, col("nb") - col("pb") - 1) >= minO)
        .select("doc_a", "doc_b", "na", "nb").distinct()
      // exact verification on the FULL int shingle arrays, candidates
      // only; the candidate table is near-dup-bounded and broadcasts, so
      // the verify is two map-side joins against the cached perDoc. The
      // arrays are sorted sets, so |a ∩ b| is the codegen'd merge walk
      // (sorted_intersect_count) — array_intersect built a hash set AND
      // materialized the intersection array per pair just to size it,
      // which dominated the verify at 70k+ candidates (r8)
      val sets = perDoc.select(col("doc_id"), col("sh"))
      broadcast(cand)
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .withColumn("i", graft.functions.VecOps.sorted_intersect_count(
          col("sh_a"), col("sh_b")).cast("double"))
        .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
        .filter(col("jaccard") >= t)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard_r"))
    },

    // Winnowing fingerprints (differential-tested): the Schleimer et al.
    // 2003 (MOSS) local document fingerprinting — hash every char
    // 5-gram, keep the MINIMUM hash of each sliding window of 4. The
    // guarantee: any shared substring of length ≥ k+w−1 = 8 chars yields
    // at least one shared selected fingerprint, while only ~2/(w+1) ≈
    // 40 % of positions are selected — the position-aware fourth member
    // of the fingerprint family (exact md5, minhash, simhash are
    // position-blind). The query emits the per-doc SKETCH (selected
    // count + an order-independent digest) — the artifact an index
    // stores; matching joins the selected sets (LlmOpsSpec: planted
    // near-dup copies overlap their originals ≈ 0.95 vs ≈ 0.29 for
    // unrelated template-sharing docs). Shuffle shape at 100 TB: the
    // window pass is one doc-keyed sort (scan-local per doc), the sketch
    // one doc-keyed aggregate; pair matching shuffles only selected
    // fingerprints with the same hot-key discipline as the AllPairs
    // prefix filter above.
    "q_dedup_winnow" -> QueryDef.sql(
      "winnowing sketch: char-5-gram window-min fingerprints per doc (k=5, w=4)",
      s"""WITH $PlantedDocsSql,
         |d AS (SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ')) AS t
         |      FROM docs),
         |g AS (SELECT doc_id, i, md5(substr(t, i, 5)) AS h
         |      FROM (SELECT doc_id, t,
         |            unnest(generate_series(1, length(t) - 4)) AS i FROM d)),
         |wmin AS (
         |  SELECT doc_id, i,
         |    MIN(h) OVER (PARTITION BY doc_id ORDER BY i
         |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mh,
         |    COUNT(*) OVER (PARTITION BY doc_id) AS np
         |  FROM g),
         |sel AS (SELECT doc_id, mh, MAX(np) AS np FROM wmin
         |        WHERE i <= np - 3 GROUP BY doc_id, mh)
         |SELECT doc_id, CAST(MAX(np) AS BIGINT) AS n_positions,
         |  CAST(COUNT(*) AS BIGINT) AS n_selected,
         |  md5(string_agg(mh, '' ORDER BY mh)) AS sketch_md5
         |FROM sel GROUP BY doc_id""".stripMargin) { (s, dir) =>
      winnowSelected(s, dir)
        .groupBy("doc_id")
        .agg(max("np").cast("long").as("n_positions"),
          count(lit(1)).as("n_selected"),
          md5(concat_ws("", array_sort(collect_list(col("mh"))))
            .cast("binary")).as("sketch_md5"))
    },

    // Embedding-cosine near-dup (differential-tested): blocked all-pairs
    // with exact decimal dot products so Spark and DuckDB agree bitwise.
    "q_dedup_embedding_cos" -> QueryDef.sql(
      "embedding cosine near-dup, blocked, exact decimal accumulation",
      """WITH flat AS (
        |  SELECT vec_id, label, vec_id // 100 AS block, i,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |nrm AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,12))) AS n2 FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS dot
        |  FROM flat a JOIN flat b ON a.label = b.label AND a.block = b.block
        |    AND a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT vec_a, vec_b,
        |  round(CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))), 6) AS cos_r
        |FROM dots JOIN nrm x ON vec_a = x.vec_id JOIN nrm y ON vec_b = y.vec_id
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) >= 0.25""".stripMargin) { (s, dir) =>
      pairsCache(s, dir)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos_r"))
    },

    // Connected-components dedup clustering (differential-tested against a
    // DuckDB recursive CTE): near-dup PAIRS are not enough to dedup a
    // corpus — transitive clusters are, with one canonical keeper each.
    // Iterative min-label propagation to fixpoint: label(v) starts as
    // vec_id, each round takes the min over direct neighbors; converges in
    // diameter rounds (near-dup components are small and blocked, so the
    // loop is short — at 100 TB swap in the large-star/small-star variant,
    // which keeps the same per-round shuffle shape on (src) keys).
    "q_dedup_clusters" -> QueryDef.sql(
      "connected-components near-dup clusters (min-label propagation)",
      """WITH RECURSIVE flat AS (
        |  SELECT vec_id, label, vec_id // 100 AS block, i,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |nrm AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,12))) AS n2 FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS dot
        |  FROM flat a JOIN flat b ON a.label = b.label AND a.block = b.block
        |    AND a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT vec_a, vec_b FROM dots JOIN nrm x ON vec_a = x.vec_id
        |  JOIN nrm y ON vec_b = y.vec_id
        |  WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) >= 0.25),
        |edges AS (
        |  SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach(v, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v)
        |SELECT v AS vec_id, CAST(MIN(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY v""".stripMargin) { (s, dir) =>
      ccLabels(s, dir, star = false)
    },

    // The same clustering via large-star/small-star contraction — the
    // 100 TB swap-in documented on q_dedup_clusters, differential-tested
    // against the same DuckDB recursive-CTE oracle (and against min-label
    // + a union-find ground truth on random graphs in DedupClusterSpec).
    "q_dedup_clusters_star" -> QueryDef.sql(
      "connected-components near-dup clusters (large-star/small-star contraction)",
      """WITH RECURSIVE flat AS (
        |  SELECT vec_id, label, vec_id // 100 AS block, i,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |nrm AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,12))) AS n2 FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS dot
        |  FROM flat a JOIN flat b ON a.label = b.label AND a.block = b.block
        |    AND a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT vec_a, vec_b FROM dots JOIN nrm x ON vec_a = x.vec_id
        |  JOIN nrm y ON vec_b = y.vec_id
        |  WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) >= 0.25),
        |edges AS (
        |  SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach(v, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v)
        |SELECT v AS vec_id, CAST(MIN(r) AS BIGINT) AS cluster_id
        |FROM reach GROUP BY v""".stripMargin) { (s, dir) =>
      ccLabels(s, dir, star = true)
    },

    // End-to-end dedup APPLY (differential-tested): what a corpus run
    // actually does with near-dup clusters — keep one canonical document
    // per cluster (the minimum id, i.e. the cluster label itself) and
    // report the surviving corpus per language. At this SF the keeper set
    // broadcasts; at 100 TB it is one (long) row per kept doc, so the
    // apply becomes a hash semi-join on doc_id — two narrow long columns
    // shuffled, never the document text itself (project-before-shuffle).
    "q_dedup_apply" -> QueryDef.sql(
      "dedup apply: drop non-canonical near-dup cluster members, per-lang survivors",
      """WITH RECURSIVE flat AS (
        |  SELECT vec_id, label, vec_id // 100 AS block, i,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |nrm AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,12))) AS n2 FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS dot
        |  FROM flat a JOIN flat b ON a.label = b.label AND a.block = b.block
        |    AND a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT vec_a, vec_b FROM dots JOIN nrm x ON vec_a = x.vec_id
        |  JOIN nrm y ON vec_b = y.vec_id
        |  WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) >= 0.25),
        |edges AS (
        |  SELECT vec_a AS src, vec_b AS dst FROM pairs
        |  UNION ALL SELECT vec_b, vec_a FROM pairs),
        |reach(v, r) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.v),
        |labels AS (
        |  SELECT v AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY v)
        |SELECT d.lang, COUNT(*) AS n_kept,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
        |FROM documents d
        |WHERE d.doc_id NOT IN
        |  (SELECT vec_id FROM labels WHERE vec_id <> cluster_id)
        |GROUP BY d.lang""".stripMargin) { (s, dir) =>
      val labels = ccLabels(s, dir, star = false)
      // Drop the LOSERS (non-canonical cluster members) rather than
      // keeping the keepers: keepers ≈ the whole corpus (every singleton
      // is its own canonical), while losers scale with the DUPLICATE
      // RATE. The anti-join's build side is therefore the small set by
      // construction; the hint stays size-gated (dup rate is data, not a
      // contract) so a pathological corpus degrades to a shuffle instead
      // of a corpus-sized driver broadcast.
      //
      // Declared semantics (ADVICE r11): a document with NO embeddings
      // row can never be DETECTED as a near-dup, so it is KEPT — the
      // oracle's `doc_id NOT IN (losers)` states exactly the anti-join,
      // with no embeddings-covers-documents invariant in either
      // direction (the old keeper inner-join silently dropped
      // unembedded docs). DedupClusterSpec pins this on a fixture with an
      // unembedded document.
      val losers = labels.filter(col("vec_id") =!= col("cluster_id"))
        .select(col("vec_id").as("doc_id"))
      Tables.documents(s, dir)
        .join(graft.ops.Hints.broadcastIfSmall(losers), Seq("doc_id"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum("n_chars").cast("long").as("kept_chars"))
    }
  )
}
