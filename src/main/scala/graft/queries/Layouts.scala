package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Shared fixture/layout helpers for the driver-verified oracle queries
  * (Core + SinkOracles). Extracted from Core so the sink-contract oracles
  * reuse the exact same synthetic keys and session-scoped publish
  * machinery instead of drifting copies.
  */
private[queries] object Layouts {

  /** The synthetic-but-valid fixture hash every published layout keys on:
    * `0x` + md5(k) + md5(k+1) = 0x + 64 lowercase hex. ONE definition —
    * each oracle's SQL twin is
    * `'0x' || md5(CAST(k AS VARCHAR)) || md5(CAST(k+1 AS VARCHAR))`,
    * and a drift between copies would desynchronize a query from its
    * oracle invisibly. */
  def syntheticHash(k: Column): Column =
    concat(lit("0x"), md5(k.cast("string")), md5((k + 1).cast("string")))

  def rmTree(p: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  /** Session-scoped published layout: `write` runs once per (session,
    * dataset) into a temp dir — like the trained ANN indexes — and the
    * session-end sweep deletes the dir (ADVICE r8 #3 — these used to
    * outlive every session). `cleanup` tears the published resource down
    * at release (filesystem layouts delete their dir; the JDBC layout
    * drops its in-memory database). */
  final class PublishedLayout(tag: String, cleanup: String => Unit = rmTree) {
    // ConcurrentHashMap.computeIfAbsent runs the publish thunk at most
    // ONCE per key (concurrent callers block on it) — TrieMap's
    // getOrElseUpdate evaluates racing defaults and would leak the
    // losing publish's temp dir with no finalizer pointing at it
    private val memo =
      new java.util.concurrent.ConcurrentHashMap[(Int, String), String]

    private def memoize(s: SparkSession, dir: String)(produce: => String): String =
      memo.computeIfAbsent((System.identityHashCode(s), dir), { _ =>
        SessionCaches.onRelease(s, s"layout.$tag:$dir") { () =>
          Option(memo.remove((System.identityHashCode(s), dir))).foreach(cleanup)
        }
        produce
      })

    def apply(s: SparkSession, dir: String)(write: String => Unit): String =
      memoize(s, dir) {
        val path = java.nio.file.Files
          .createTempDirectory(s"graft-$tag").toString
        // a failed publish must not leak its partial state: the memo entry
        // is only added on success, so the session-end finalizer would
        // never see this handle — both paths clean up before rethrowing
        try { write(path); path }
        catch { case e: Throwable => rmTree(path); throw e }
      }

    /** Variant for layouts whose handle is a NAME rather than a temp dir
      * (the Derby in-memory database): `publish` receives a unique token
      * and creates the resource under it; the token IS the memoized
      * handle, so `cleanup` receives the same token on the session-end
      * sweep AND on publish failure — no success/failure asymmetry. */
    def named(s: SparkSession, dir: String)(publish: String => Unit): String =
      memoize(s, dir) {
        val token = s"$tag${Integer.toHexString(System.identityHashCode(s))}" +
          Integer.toHexString(dir.hashCode) // toHexString is unsigned: no '-'
        try { publish(token); token }
        catch { case e: Throwable => cleanup(token); throw e }
      }
  }
}
