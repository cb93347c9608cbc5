package graft

import java.io.File
import graft.ops.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** Compaction under concurrent readers and crash recovery (VERDICT r8
  * item 6, ADVICE r8): the two-rename partition swap must never expose a
  * MIXED file set to a racing reader, and a compactor killed anywhere
  * inside the swap window must be recoverable by simply re-running the
  * pass — [[Sinks.recoverArchiveStaging]] restores the stranded
  * `.old-<tag>` stage and clears partial `.compact-<tag>` rewrites.
  */
class CompactionRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Fragmented two-day fixture: 8 files per day=… partition. */
  private def freshArchive(): String = {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cc").toString
    (0 until 400).map(i =>
      (i.toLong, if (i % 2 == 0) "2024-01-01" else "2024-01-02", s"payload-$i"))
      .toDF("id", "day", "body")
      .repartition(8).write.partitionBy("day")
      .option("compression", "gzip").parquet(s"$tmp/archive")
    s"$tmp/archive"
  }

  private def files(dir: String): Option[Set[String]] = {
    val ls = new File(dir).listFiles()
    if (ls == null) None // the swap window: partition dir briefly absent
    else Some(ls.map(_.getName).filter(_.endsWith(".parquet")).toSet)
  }

  test("concurrent reader: every listing is the old or new complete set, never a mix") {
    val archive = freshArchive()
    val part = s"$archive/day=2024-01-01"
    val oldSet = files(part).get
    assert(oldSet.size == 8)

    // tight-loop reader racing the compaction; record every snapshot
    @volatile var stop = false
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Option[Set[String]]]()
    val reader = new Thread(() => while (!stop) seen.add(files(part)))
    reader.start()
    try Sinks.compactDailyArchive(spark, archive)
    finally { stop = true; reader.join() }

    val newSet = files(part).get
    assert(newSet.size == 1 && newSet != oldSet)
    val snapshots = {
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
    assert(snapshots.contains(Some(oldSet)),
      "reader never observed the pre-compaction set — race not exercised")
    // the contract: old set, new set, or (transiently) absent — a mixed
    // or partial listing is a swap-atomicity violation
    val illegal = snapshots.distinct.filter {
      case None => false
      case Some(s) => s != oldSet && s != newSet
    }
    assert(illegal.isEmpty, s"mixed file sets observed: $illegal")
    // data intact after the race
    assert(spark.read.parquet(archive).count() == 400)
  }

  test("crash inside the swap window: re-running the pass restores and finishes") {
    val archive = freshArchive()
    val before = spark.read.parquet(archive)
      .orderBy("id").collect().map(_.toString).toSeq
    // simulate a compactor killed between rename(dir -> .old) and
    // rename(.compact -> dir): partition dir gone, complete data under
    // .old-, a partial rewrite under .compact-
    val part = new File(s"$archive/day=2024-01-01")
    assert(part.renameTo(new File(s"$archive/.old-day=2024-01-01")))
    val partial = new File(s"$archive/.compact-day=2024-01-01")
    assert(partial.mkdir())
    java.nio.file.Files.write(
      new File(partial, "part-00000.gz.parquet").toPath,
      Array[Byte](1, 2, 3)) // truncated garbage — must never be swapped in
    // readers skipping dot-dirs now see the partition as gone
    assert(!part.exists())

    val done = Sinks.compactDailyArchive(spark, archive)
    // restored AND compacted in the same pass
    assert(done.contains("day=2024-01-01"), s"recovered partition not compacted: $done")
    assert(files(part.toString).get.size == 1)
    assert(new File(archive).listFiles().forall(f =>
      !f.getName.startsWith(".old-") && !f.getName.startsWith(".compact-")),
      "staging debris left behind")
    val after = spark.read.parquet(archive)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(after == before, "recovery lost or changed data")
    // idempotent: a second recovery/compaction pass is a no-op
    assert(Sinks.recoverArchiveStaging(spark, archive).isEmpty)
    assert(Sinks.compactDailyArchive(spark, archive).isEmpty)
  }

  test("crash with multiple partitions mid-window: one re-run recovers all") {
    // The pooled pass (r11) rewrites up to 8 leaves concurrently, so a
    // crash can strand SEVERAL partitions in different swap phases at
    // once. One re-run must restore every strand and finish the job.
    val archive = freshArchive()
    val before = spark.read.parquet(archive)
      .orderBy("id").collect().map(_.toString).toSeq
    // day1: killed between the two renames (data only under .old-)
    val p1 = new File(s"$archive/day=2024-01-01")
    assert(p1.renameTo(new File(s"$archive/.old-day=2024-01-01")))
    // day2: killed mid-rewrite (live partition intact, partial .compact-)
    val partial = new File(s"$archive/.compact-day=2024-01-02")
    assert(partial.mkdir())
    java.nio.file.Files.write(
      new File(partial, "part-00000.gz.parquet").toPath, Array[Byte](7))

    val done = Sinks.compactDailyArchive(spark, archive)
    assert(done.keySet == Set("day=2024-01-01", "day=2024-01-02"),
      s"both stranded partitions must compact in one pass: $done")
    assert(files(p1.toString).get.size == 1)
    assert(files(s"$archive/day=2024-01-02").get.size == 1)
    assert(new File(archive).listFiles().forall(f =>
      !f.getName.startsWith(".old-") && !f.getName.startsWith(".compact-")),
      "staging debris left behind")
    val after = spark.read.parquet(archive)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(after == before, "multi-strand recovery lost or changed data")
  }

  test("crash after swap-in: superseded .old stage is cleared, live data kept") {
    val archive = freshArchive()
    Sinks.compactDailyArchive(spark, archive)
    // simulate a crash after the swap-in rename but before stage cleanup:
    // live partition present, a stale .old- copy beside it
    val stale = new File(s"$archive/.old-day=2024-01-02")
    assert(stale.mkdir())
    java.nio.file.Files.write(
      new File(stale, "part-superseded.gz.parquet").toPath, Array[Byte](9))
    assert(Sinks.recoverArchiveStaging(spark, archive).isEmpty,
      "a superseded stage must be cleared, not restored")
    assert(!stale.exists(), "stale .old- stage not deleted")
    assert(spark.read.parquet(archive).count() == 400)
  }

  test("partition value containing '~' round-trips through staging (ADVICE r8)") {
    // '~' is the tag's path separator; an unescaped value like day=2024~x
    // used to mis-split on recovery and restore into a dir named "x"
    val rel = "day=2024~x/hour=1~2"
    assert(Sinks.stageRel(Sinks.stageTag(rel)) == rel)
    assert(Sinks.stageLeaf(Sinks.stageTag(rel)) == "hour=1~2")
    // legacy tags (no escapes) still decode unchanged
    assert(Sinks.stageRel("day=2024-01-01~hour=0") == "day=2024-01-01/hour=0")

    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cc-tilde").toString
    (0 until 100).map(i => (i.toLong, if (i % 2 == 0) "2024~a" else "2024-01-02"))
      .toDF("id", "day")
      .repartition(4).write.partitionBy("day")
      .option("compression", "gzip").parquet(s"$tmp/archive")
    val archive = s"$tmp/archive"
    // full compaction pass over the '~'-valued partition
    val done = Sinks.compactDailyArchive(spark, archive)
    assert(done.keySet.contains("day=2024~a"), s"compacted: $done")
    // crash-sim: strand the partition under its encoded .old- tag
    val part = new File(s"$archive/day=2024~a")
    val tag = Sinks.stageTag("day=2024~a")
    assert(part.renameTo(new File(s"$archive/.old-$tag")))
    val restored = Sinks.recoverArchiveStaging(spark, archive)
    assert(restored == Seq("day=2024~a"), s"restored: $restored")
    assert(part.exists(), "partition dir not restored under its real name")
    assert(spark.read.parquet(archive).count() == 100)
  }

  test("nested layout: a stranded hour partition restores into its day dir") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cc-nested").toString
    (0 until 100).map(i => (i.toLong, "2024-01-01", i % 2))
      .toDF("id", "day", "hour")
      .repartition(4).write.partitionBy("day", "hour")
      .option("compression", "gzip").parquet(s"$tmp/hourly")
    val dayDir = s"$tmp/hourly/day=2024-01-01"
    // the nested tag encodes the rel path with '/' -> '~'
    assert(new File(s"$dayDir/hour=0")
      .renameTo(new File(s"$dayDir/.old-day=2024-01-01~hour=0")))
    val restored = Sinks.recoverArchiveStaging(spark, s"$tmp/hourly")
    assert(restored == Seq("day=2024-01-01/hour=0"), s"restored: $restored")
    assert(spark.read.parquet(s"$tmp/hourly").count() == 100)
  }
}
